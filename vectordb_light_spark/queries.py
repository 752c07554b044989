"""Registry of driver-checkable queries: name → (spark_fn, oracle_sql).

Each entry is one operator/query from SURVEY.md §2 (or a beyond-
reference pipeline operator). ``spark_fn(spark, sf_dir) -> DataFrame``
is the engine's implementation; ``oracle_sql`` is the equivalent ANSI
SQL DuckDB runs on the same parquet (views: region nation customer
supplier part orders lineitem events documents embeddings). Column
names/aliases MUST match between the two — the driver sorts columns by
name and hashes values.

Float columns are rounded on BOTH sides (same literal rounding) so the
hash compare is robust to float32/float64 summation noise; both sides
compute in double precision.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_light_spark.session import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Vector search path (SURVEY §2.5 Q1-Q10) — the reference's read side
# ---------------------------------------------------------------------------

# The query vector is the embedding of vec_id=0 — deterministic on the
# driver's seeded testdata, and expressible in the oracle as a scalar
# subquery. k=6 / threshold=0.4 are the reference defaults
# (reference config.py:28-29).


def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.where(F.col("vec_id") == vec_id).select("embedding").first()
    return [float(x) for x in row[0]]


@register(
    "vq_topk_cosine",
    oracle="""
    SELECT vec_id, label,
           ROUND(LEAST(GREATEST(list_cosine_similarity(
               embedding::DOUBLE[],
               (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
           ), 0.0), 1.0), 6) AS similarity_score,
           CAST(ROW_NUMBER() OVER (
               ORDER BY LEAST(GREATEST(list_cosine_similarity(
                   embedding::DOUBLE[],
                   (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
               ), 0.0), 1.0) DESC, vec_id ASC) AS INT) AS rank
    FROM embeddings
    ORDER BY rank
    LIMIT 6
    """,
)
def vq_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: exact brute-force top-k cosine (k=6), rank + rounded score.

    Plan shape: Parquet scan pruned to (vec_id, embedding, label) →
    JVM-side dot/norm via higher-order functions →
    TakeOrderedAndProject(k) — no shuffle of the full table.
    """
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine

    q = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    out = topk_cosine(
        emb,
        q,
        SearchParams(k=6, threshold=0.0),
        id_col="vec_id",
        vec_col="embedding",
    )
    return out.select(
        "vec_id",
        "label",
        F.round("similarity_score", 6).alias("similarity_score"),
        "rank",
    )


@register(
    "vq_threshold_after_topk",
    oracle="""
    WITH topk AS (
        SELECT vec_id,
               LEAST(GREATEST(list_cosine_similarity(
                   embedding::DOUBLE[],
                   (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
               ), 0.0), 1.0) AS sim,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY LEAST(GREATEST(list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
                   ), 0.0), 1.0) DESC, vec_id ASC) AS INT) AS rank
        FROM embeddings
        ORDER BY sim DESC, vec_id ASC
        LIMIT 50
    )
    SELECT vec_id, ROUND(sim, 6) AS similarity_score, rank
    FROM topk WHERE sim >= 0.4
    ORDER BY rank
    """,
)
def vq_threshold_after_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: similarity threshold applied AFTER top-k (k=50, th=0.4) —
    result may have fewer than k rows; threshold must NOT be pushed
    below the limit (reference vector_db_query.py:199-209)."""
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine

    q = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    out = topk_cosine(
        emb,
        q,
        SearchParams(k=50, threshold=0.4),
        id_col="vec_id",
        vec_col="embedding",
    )
    return out.select(
        "vec_id",
        F.round("similarity_score", 6).alias("similarity_score"),
        "rank",
    )


@register(
    "vq_postfilters",
    oracle="""
    WITH topk AS (
        SELECT e.vec_id, d.text, d.lang, d.source,
               LEAST(GREATEST(list_cosine_similarity(
                   e.embedding::DOUBLE[],
                   (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
               ), 0.0), 1.0) AS sim,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY LEAST(GREATEST(list_cosine_similarity(
                       e.embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
                   ), 0.0), 1.0) DESC, e.vec_id ASC) AS INT) AS rank
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
        ORDER BY sim DESC, e.vec_id ASC
        LIMIT 100
    )
    SELECT vec_id, lang, source, ROUND(sim, 6) AS similarity_score, rank
    FROM topk
    WHERE contains(lower(text), 'the') AND lang = 'en'
    ORDER BY rank
    """,
)
def vq_postfilters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8+Q9: search-term substring filter + document-type equality
    filter applied after top-k, on text late-materialized via a
    broadcast join of embeddings→documents (reference
    vector_db_query.py:211-257; lang plays document_type)."""
    from vectordb_light_spark.operators.search import similarity_column

    q = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    scored = (
        emb.join(F.broadcast(docs), emb.vec_id == docs.doc_id)
        .withColumn(
            "sim", similarity_column("embedding", q, assume_normalized=False)
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(100)
    )
    w = Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.contains(F.lower("text"), F.lit("the")))
        .where(F.col("lang") == "en")
        .select(
            "vec_id",
            "lang",
            "source",
            F.round("sim", 6).alias("similarity_score"),
            "rank",
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Relational operator checks (scan/filter/agg/join/top-k/window)
# ---------------------------------------------------------------------------


@register(
    "rel_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan → filter (pushed to
    parquet) → hash agg with map-side partials → tiny sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                4,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "rel_top_orders_by_revenue",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def rel_top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + top-k: hash agg then TakeOrderedAndProject(10)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "rel_join_nation_customers",
    oracle="""
    SELECT n.n_name, r.r_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 4) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    ORDER BY n.n_name
    """,
)
def rel_join_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two broadcast hash joins (nation/region are tiny dims) + agg —
    no shuffle on the fact side except the final group-by."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


@register(
    "rel_window_order_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (
        SELECT o_custkey, o_orderkey,
               ROUND(o_totalprice, 4) AS o_totalprice,
               CAST(RANK() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    ORDER BY o_custkey, rnk, o_orderkey
    """,
)
def rel_window_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window rank per customer (top-3 orders): one hash-partitioned
    shuffle on o_custkey, sort within partitions."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            "rnk",
        )
        .orderBy("o_custkey", "rnk", "o_orderkey")
    )


@register(
    "rel_events_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def rel_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (get_json_object ≡ the reference's json.loads
    metadata parse, vector_db_query.py:231) + group-by agg."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(
                F.avg(F.get_json_object("props", "$.k").cast("double")), 6
            ).alias("avg_k"),
        )
        .orderBy("event_type")
    )
