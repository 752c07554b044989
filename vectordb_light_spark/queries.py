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

from vectordb_light_spark.session import load_table, rebalance

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}

#: >0 while inside a registered entry's build — guards the per-build
#: cache release against hypothetical nested entry calls (an inner
#: release would strip the persist flag off frames the outer build
#: created but not yet materialized).
_BUILD_DEPTH = 0


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL).

    The registered callable is wrapped so that every TOP-LEVEL build
    first releases the persisted frames of the previous build
    (session.release_persisted — r13 cache-substitution audit,
    VERDICT r12 item 1): Spark's CacheManager substitutes cached
    plans into structurally-equal later queries, so without the
    release a bench entry's timed runs could read the warm-up run's
    materialized intermediates instead of computing from parquet.
    The wrapper returns the RAW function to the module (intra-module
    composition never re-triggers the release)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        import functools

        from vectordb_light_spark.session import release_persisted

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            global _BUILD_DEPTH
            if _BUILD_DEPTH == 0:
                release_persisted()
            _BUILD_DEPTH += 1
            try:
                return fn(spark, sf_dir)
            finally:
                _BUILD_DEPTH -= 1

        QUERIES[name] = wrapped
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


_DOCS_MEMO: dict = {}


def load_docs(spark: SparkSession, sf_dir: str, *cols: str) -> DataFrame:
    """The documents table, widened to full parallelism. A small local
    parquet table is ONE scan partition, which would serialize every
    downstream text/UDF stage on one core; the 0.6 MB round-robin
    shuffle is noise next to any of those stages (session.rebalance).
    Memoized per (session, sf_dir, cols): ``rebalance`` probes
    ``df.rdd.getNumPartitions()``, which ~30 registry queries would
    otherwise each re-pay."""
    key = (id(spark), sf_dir, cols)
    if key not in _DOCS_MEMO:
        df = load_table(spark, sf_dir, "documents")
        if cols:
            df = df.select(*cols)
        _DOCS_MEMO[key] = rebalance(df)
    return _DOCS_MEMO[key]


def ordered_once(df: DataFrame, *cols: str) -> DataFrame:
    """Deterministic output ordering WITHOUT recomputing an expensive
    child: a global ``orderBy`` plans a range exchange whose boundary
    sampling executes the child once and the shuffle write executes it
    again (r12 measurement: pipe_bpe_encode ran its interpreted
    8-merge fold twice — two identical 1.4 s jobs; the mm entries
    decode every image twice; the PII scrub runs its span search
    twice). The lazy localCheckpoint cuts the plan so the sampling
    pass materializes the child once and the write pass re-reads the
    materialized partitions (guide §3.3: materialize an intermediate
    rather than recompute a heavy subtree). Deliberately NOT a
    ``persist``: Spark's cache manager substitutes cached plans into
    LATER structurally-equal queries, so a persisted final output
    would make a re-run of the same entry read the previous run's
    cache — a measured 0.40 s "run" that computes nothing. The
    checkpoint RDD is private to one build, so every invocation
    recomputes from the parquet inputs. Use ONLY above expensive
    map-side children — for cheap children the extra materialization
    costs more than the recompute.

    ``SPARK_GRAFT_EXPLAIN_FULL=1`` (plan-dump transparency mode, used
    by tools/gen_plans.py and tools/dump_plans_r12.py) skips the
    checkpoint so explain shows the full child plan instead of the
    checkpoint's opaque ``Scan ExistingRDD``; timing paths never set
    it."""
    import os as _os

    if _os.environ.get("SPARK_GRAFT_EXPLAIN_FULL"):
        return df.orderBy(*cols)
    return df.localCheckpoint(eager=False).orderBy(*cols)


#: (sf_dir, index-kind) → trained numpy index (centroids/codebooks).
#: Training is deterministic (seeded hash sample + fixed init), so the
#: memo only skips recomputation — the engine analogue of the
#: reference's warm per-DB cache (Q15, vector_db_query.py:289-301).
_TRAINED_MEMO: dict = {}


def _trained(key, builder):
    if key not in _TRAINED_MEMO:
        _TRAINED_MEMO[key] = builder()
    return _TRAINED_MEMO[key]


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
    docs = load_docs(spark, sf_dir)
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


@register(
    "vq_batch_topk",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 100
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               LEAST(GREATEST(list_cosine_similarity(
                   e.embedding::DOUBLE[], q.qv), 0.0), 1.0) AS sim,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY LEAST(GREATEST(list_cosine_similarity(
                       e.embedding::DOUBLE[], q.qv), 0.0), 1.0) DESC,
                       e.vec_id ASC) AS INT) AS rank
        FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, ROUND(sim, 6) AS similarity_score, rank
    FROM scored WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def vq_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search THROUGHPUT path: 100 queries answered in ONE scan of the
    vectors table (broadcast query set → crossJoin → per-query window
    rank). At 100 TB one pass serves thousands of queries — the
    per-query-scan alternative is 100 scans (BASELINE.md bench:search).
    """
    from vectordb_light_spark.operators.search import topk_cosine_batch

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = topk_cosine_batch(
        emb, queries, k=5, threshold=0.0,
        id_col="vec_id", vec_col="embedding", assume_normalized=False,
    )
    return out.select(
        "query_id", "vec_id",
        F.round("similarity_score", 6).alias("similarity_score"), "rank",
    ).orderBy("query_id", "rank")


#: Scores embeddings against the vec_id=0 query vector and joins
#: document text — shared CTE for the presentation-path oracles.
_SCORED_HITS_CTE = """
    scored AS (
        SELECT e.vec_id, d.source, d.text,
               LEAST(GREATEST(list_cosine_similarity(
                   e.embedding::DOUBLE[],
                   (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
               ), 0.0), 1.0) AS sim
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    ),
    topk AS (
        SELECT vec_id, source, text, sim,
               CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id ASC) AS INT)
                   AS rank
        FROM scored ORDER BY sim DESC, vec_id ASC LIMIT 6
    )
"""

#: The fixed RAG preamble (reference constants.py:207-208) and the
#: literal user question used by the vq_rag_prompt check.
_RAG_STRING = (
    "Here are the contexts to base your answer on.  However, I need to "
    "reiterate that I only want you to base your response on these contexts "
    "and do not use outside knowledge that you may have been trained with."
)
_RAG_QUESTION = "What do the sample documents describe?"


@register(
    "vq_chunks_only",
    oracle="WITH" + _SCORED_HITS_CTE + r"""
    SELECT rank, vec_id,
           repeat('-', 80) || chr(10) ||
           'CONTEXT ' || rank || ' | ' || source || chr(10) ||
           repeat('-', 80) || chr(10) ||
           regexp_replace(
               trim(regexp_replace(text, '\n[ \t]+\n',
                                   chr(10) || chr(10), 'g'), ' '),
               '\n[ \t\n\x0B\f\r]*\n[ \t\n\x0B\f\r]*\n*',
               chr(10) || chr(10), 'g') || chr(10)
               AS formatted
    FROM topk ORDER BY rank
    """,
)
def vq_chunks_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 chunks-only formatting (reference vector_db_query.py:54-78):
    top-k hits → whitespace-cleanup regex chain → numbered
    ``CONTEXT i | source`` banner per hit, in rank order. Runs as a
    DataFrame projection (regexp_replace + format_string), so the
    formatting scales with the hits, not the driver. Spark/DuckDB
    ``trim`` strips spaces where Python ``str.strip`` strips all
    whitespace — equivalent on this no-newline corpus; the exact
    Python chain lives in engine.VectorDB.format_chunks."""
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine

    q = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_docs(spark, sf_dir, "doc_id", "source", "text")
    out = topk_cosine(
        emb, q, SearchParams(k=6, threshold=0.0, assume_normalized=False),
        id_col="vec_id", vec_col="embedding",
    )
    hits = out.join(F.broadcast(docs), out.vec_id == docs.doc_id)
    cleaned = F.regexp_replace(F.col("text"), r"\n[ \t]+\n", "\n\n")
    cleaned = F.regexp_replace(F.trim(cleaned), r"\n\s*\n\s*\n*", "\n\n")
    banner = F.concat(
        F.lit("-" * 80 + "\n"),
        F.format_string("CONTEXT %d | %s\n", F.col("rank"), F.col("source")),
        F.lit("-" * 80 + "\n"),
        cleaned,
        F.lit("\n"),
    )
    return hits.select("rank", "vec_id", banner.alias("formatted")).orderBy("rank")


@register(
    "vq_rag_prompt",
    oracle="WITH" + _SCORED_HITS_CTE + f"""
    SELECT '{_RAG_STRING}' || chr(10) || chr(10) || '---' || chr(10) || chr(10)
           || string_agg(text, chr(10) || chr(10) || '---' || chr(10) || chr(10)
                         ORDER BY rank ASC)
           || chr(10) || chr(10) || '-----' || chr(10) || chr(10)
           || '{_RAG_QUESTION}' AS prompt
    FROM topk
    """,
)
def vq_rag_prompt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 RAG prompt assembly (reference chat_llm.py:30-51): the fixed
    preamble, the rank-ordered contexts joined by ``---`` dividers, and
    the user question — as a one-row aggregation (ordered collect_list
    → array_join), the driver-side string build's distributed twin."""
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine

    q = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_docs(spark, sf_dir, "doc_id", "text")
    out = topk_cosine(
        emb, q, SearchParams(k=6, threshold=0.0, assume_normalized=False),
        id_col="vec_id", vec_col="embedding",
    )
    hits = out.join(F.broadcast(docs), out.vec_id == docs.doc_id)
    contexts = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "text"))),
            lambda x: x["text"],
        ),
        "\n\n---\n\n",
    )
    return hits.agg(
        F.concat(
            F.lit(_RAG_STRING + "\n\n---\n\n"),
            contexts,
            F.lit("\n\n-----\n\n" + _RAG_QUESTION),
        ).alias("prompt")
    )


# ---------------------------------------------------------------------------
# Relational operator checks (scan/filter/agg/join/top-k/window)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Write-path operators (SURVEY §2.3 T1-T3) — chunking, hashing
# ---------------------------------------------------------------------------


@register(
    "pipe_chunk_fixed",
    oracle=r"""
    WITH base AS (
        SELECT doc_id, regexp_replace(text, '^[\x09-\x0d\x1c-\x1f\x85\x{2028}\x{2029}\p{Zs}]+|[\x09-\x0d\x1c-\x1f\x85\x{2028}\x{2029}\p{Zs}]+$', '', 'g') AS t
        FROM documents
    ),
    starts AS (
        SELECT doc_id, t,
               CAST(UNNEST(generate_series(0, greatest(length(t) - 1, 0), 200)) AS INT)
                   AS chunk_start
        FROM base WHERE length(t) > 0
    ),
    pieces AS (
        SELECT doc_id, chunk_start,
               regexp_replace(substring(t, chunk_start + 1, 300),
                              '^[\x09-\x0d\x1c-\x1f\x85\x{2028}\x{2029}\p{Zs}]+|[\x09-\x0d\x1c-\x1f\x85\x{2028}\x{2029}\p{Zs}]+$', '', 'g') AS chunk
        FROM starts
    )
    SELECT doc_id, chunk_start, chunk,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY chunk_start) - 1 AS INT)
               AS chunk_index
    FROM pieces
    WHERE chunk != ''
    ORDER BY doc_id, chunk_index
    """,
)
def pipe_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 fixed-size overlapping chunker (size=300, overlap=100) as
    pure builtins: explode(sequence) + substr + strip. Row-parallel,
    no shuffle except the per-doc chunk_index window (reference
    document_processor.py:368-408)."""
    from vectordb_light_spark.operators.chunker import split_fixed_size

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    out = split_fixed_size(
        docs, chunk_size=300, chunk_overlap=100, partition_cols=["doc_id"]
    )
    return out.select("doc_id", "chunk_start", "chunk", "chunk_index").orderBy(
        "doc_id", "chunk_index"
    )


@register(
    "pipe_cdc_chunks",
    oracle=r"""
    WITH c AS (SELECT doc_id, text, length(text) AS n FROM documents),
    h AS (
        SELECT doc_id, text, n,
               list_transform(
                   generate_series(1, greatest(n - 8 + 1, 1)),
                   s -> list_reduce(
                       list_prepend(0::BIGINT,
                           list_transform(
                               generate_series(0, least(8, n) - 1),
                               j -> ord(substring(text, s + j, 1))::BIGINT)),
                       (acc, x) -> (acc * 257 + x) % 2147483647)) AS hs
        FROM c
    ),
    b AS (
        SELECT doc_id, text, n,
               list_concat(list_concat([0::BIGINT],
                   list_filter(
                       list_transform(hs,
                           (x, i) -> CASE WHEN x % 64 = 63
                                     THEN CAST(i - 1 + 8 AS BIGINT)
                                     ELSE -1 END),
                       p -> p > 0 AND p < n AND n >= 8)),
                   [CAST(n AS BIGINT)]) AS bnd
        FROM h
    )
    SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
           substring(text, CAST(bnd[u.i] + 1 AS INT),
                     CAST(bnd[u.i + 1] - bnd[u.i] AS INT)) AS chunk
    FROM b, UNNEST(generate_series(1, len(bnd) - 1)) AS u(i)
    ORDER BY doc_id, chunk_idx
    """,
)
def pipe_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/chunker.py
    split_content_defined; LBFS-family Rabin/gear CDC): cut after
    every char whose trailing 8-gram winnowing-polynomial hash ≡ 63
    (mod 64) — boundaries depend only on local content, so an edit
    anywhere re-aligns every later boundary and chunk-level dedup
    still matches unedited copies (the property fixed-size chunking
    lacks). Char codes stage once, hashes/boundaries/slices are
    higher-order builtins in one map-side projection chain, then one
    posexplode — no shuffle, no UDF, no float; concatenating chunks
    reproduces each document byte-for-byte. The twin replays the
    identical polynomial with list_reduce (the ts_winnow_fingerprints
    primitive)."""
    from vectordb_light_spark.operators.chunker import split_content_defined

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    # r12: ordered_once — the range sampling otherwise runs the CDC
    # rolling-hash split twice.
    return ordered_once(
        split_content_defined(docs, k=8, divisor=64), "doc_id", "chunk_idx"
    )


#: Shared CTE chain: synthesized URL variants -> normalization
#: (mirrors operators/curation.normalize_url step for step) -> url
#: min-id dedup -> per-domain cap. Used by the pipe_url_dedup AND
#: pipe_domain_mix oracles so the twins can never drift apart.
_URL_CHAIN_CTES = r"""
    u0 AS (
        SELECT doc_id,
               CASE doc_id % 5
                 WHEN 0 THEN 'https://d' || (doc_id // 5) % 7
                      || '.example.com/page/' || (doc_id // 5)
                 WHEN 1 THEN 'HTTPS://D' || (doc_id // 5) % 7
                      || '.EXAMPLE.COM/page/' || (doc_id // 5) || '/'
                 WHEN 2 THEN 'https://www.d' || (doc_id // 5) % 7
                      || '.example.com/page/' || (doc_id // 5)
                      || '?utm_source=feed'
                 WHEN 3 THEN 'https://d' || (doc_id // 5) % 7
                      || '.example.com:443/page/' || (doc_id // 5) || '#frag'
                 ELSE 'https://d' || (doc_id // 5) % 7
                      || '.example.com/page/' || (doc_id // 5)
                      || '?utm_a=1&ref=z'
               END AS url
        FROM documents
    ),
    n1 AS (SELECT doc_id, regexp_replace(trim(url, ' '), '#.*$', '') AS u FROM u0),
    n2 AS (
        SELECT doc_id,
               lower(regexp_extract(u, '^[^:/?#]+://[^/?#]*', 0))
               || substr(u, length(regexp_extract(u, '^[^:/?#]+://[^/?#]*', 0)) + 1)
                   AS u
        FROM n1
    ),
    n3 AS (
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(u, '^([a-z][a-z0-9+.-]*://)www\.', '\1'),
                   '^(https://[^/:?#]+):443([/?#]|$)', '\1\2'),
                 '^(http://[^/:?#]+):80([/?#]|$)', '\1\2') AS u
        FROM n2
    ),
    n4 AS (
        -- '?'-preserving utm strip, mirroring normalize_url (r7):
        -- non-leading '&utm_...' global, then the at-most-one leading
        -- '?utm_...' (keeps '?' when params follow, drops an
        -- utm-only query) — no repair step, path never touched
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(u, '&utm_[^&]*', '', 'g'),
                       '\?utm_[^&]*&', '?'),
                     '\?utm_[^&]*$', ''),
                   '\?$', ''),
                 '/$', '') AS url_norm
        FROM n3
    ),
    dedup AS (
        SELECT doc_id, url_norm,
               regexp_extract(url_norm,
                   '^[^:/?#]+://(?:[^/?#@]*@)?([^/:?#]+)', 1) AS domain,
               doc_id = MIN(doc_id) OVER (PARTITION BY url_norm) AS keep_url
        FROM n4
    ),
    capped AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY domain ORDER BY doc_id) <= 20 AS keep_domain
        FROM dedup WHERE keep_url
    )
    """


def _synth_urls(docs: DataFrame) -> DataFrame:
    """The five URL spellings of a shared resource, synthesized from
    doc_id (case, trailing slash, www+utm, default port+fragment,
    mixed query) — shared by pipe_url_dedup and pipe_domain_mix, and
    mirrored verbatim by the u0 CTE in ``_URL_CHAIN_CTES``."""
    r = F.expr("doc_id div 5")
    d = F.concat(F.lit("d"), (r % 7).cast("string"), F.lit(".example.com"))
    rs = r.cast("string")
    return docs.withColumn(
        "url",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("https://"), d, F.lit("/page/"), rs),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(
                F.upper(F.concat(F.lit("https://"), d)),
                F.lit("/page/"), rs, F.lit("/"),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 2,
            F.concat(
                F.lit("https://www."), d, F.lit("/page/"), rs,
                F.lit("?utm_source=feed"),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(
                F.lit("https://"),
                F.regexp_replace(d, r"\.example\.com$", ".example.com:443"),
                F.lit("/page/"), rs, F.lit("#frag"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), d, F.lit("/page/"), rs,
                F.lit("?utm_a=1&ref=z"),
            )
        ),
    )



def _url_dedup_oracle_sql() -> str:
    """DuckDB twin of pipe_url_dedup: the same synthesized URL
    variants, the same normalization regexp chain step for step
    (start/end-anchored steps match at most once in both engines; the
    utm strip is explicitly global), the same min-id survivor and
    per-domain row_number cap."""
    return "WITH " + _URL_CHAIN_CTES + r"""    SELECT d.doc_id, d.url_norm, d.domain, d.keep_url,
           COALESCE(c.keep_domain, FALSE) AS keep_domain
    FROM dedup d LEFT JOIN capped c ON d.doc_id = c.doc_id
    ORDER BY d.doc_id
    """


@register("pipe_url_dedup", oracle=_url_dedup_oracle_sql())
def pipe_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL curation tier (operators/curation.py — RefinedWeb-style
    pre-text dedup): each doc synthesizes one of five URL spellings
    of a shared resource (case, trailing slash, www + utm params,
    default port + fragment, mixed query), `normalize_url` folds the
    first four to one canonical string, `url_exact_dedup` keeps the
    min-id survivor per canonical URL, and `domain_frequency_cap`
    keeps each domain's 20 lowest-id survivors. All pure builtins
    (regexp chain + one groupBy + one bounded window); the only
    shuffles are the dedup key and the domain — text never moves."""
    from vectordb_light_spark.operators.curation import (
        domain_frequency_cap,
        url_exact_dedup,
    )

    docs = load_docs(spark, sf_dir, "doc_id")
    urls = _synth_urls(docs)
    deduped = url_exact_dedup(urls).withColumnRenamed("keep", "keep_url")
    capped = domain_frequency_cap(
        deduped.where(F.col("keep_url")), 20
    ).select("doc_id", F.col("keep").alias("keep_domain"))
    from vectordb_light_spark.operators.curation import url_domain

    return (
        deduped.withColumn("domain", url_domain("url_norm"))
        .join(capped, "doc_id", "left")
        .select(
            "doc_id",
            "url_norm",
            "domain",
            "keep_url",
            F.coalesce(F.col("keep_domain"), F.lit(False)).alias("keep_domain"),
        )
        .orderBy("doc_id")
    )


def _temperature_mix_oracle_sql() -> str:
    """DuckDB twin of pipe_temperature_mix: the α-derived keep-rates
    are computed ONCE in python at registration and injected into
    both engines as the SAME hex threshold literals (the
    assign_split md5 convention) — zero cross-engine float
    arithmetic anywhere."""
    from vectordb_light_spark.operators.sampling import (
        bucket_sql,
        fraction_threshold,
        temperature_mix_fractions,
    )

    rates = temperature_mix_fractions(
        {"web": 0.5, "books": 0.25, "code": 0.25},
        alpha=0.5,
        target_frac=0.5,
    )
    thr = {g: fraction_threshold(r) for g, r in rates.items()}
    return f"""
    WITH g AS (
        SELECT doc_id,
               CASE WHEN TRY_CAST(substr(source, 4, 8) AS INT) < 10 THEN 'web'
                    WHEN TRY_CAST(substr(source, 4, 8) AS INT) < 15 THEN 'books'
                    ELSE 'code' END AS grp
        FROM documents
    )
    SELECT doc_id, grp,
           {bucket_sql('doc_id', 7)} <
               CASE grp WHEN 'web' THEN '{thr["web"]}'
                        WHEN 'books' THEN '{thr["books"]}'
                        ELSE '{thr["code"]}' END AS keep
    FROM g ORDER BY doc_id
    """


@register("pipe_temperature_mix", oracle=_temperature_mix_oracle_sql())
def pipe_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixing (α-sampling — the GPT-3/mT5/
    XLM-R source-balance lever): sources tier into web (src0-9, half
    the corpus), books and code (quarters); α=0.5 keep-rates derived
    by `temperature_mix_fractions` flatten the head (web keeps
    0.414×) and lift the tails (books/code keep 0.586×) toward a 50%
    target mixture. Rates become md5 hex-threshold literals
    (`fraction_threshold`) computed ONCE in python and shared
    verbatim with the oracle, applied by `stratified_sample` — one
    map-side filter, no shuffle, deterministic and nested across
    reruns. The tier shares are scale-free (every SF carries
    src0-19), so the same literals hold at any corpus size."""
    from vectordb_light_spark.operators.sampling import (
        hash_bucket_column,
        stratified_sample,
        temperature_mix_fractions,
    )

    rates = temperature_mix_fractions(
        {"web": 0.5, "books": 0.25, "code": 0.25},
        alpha=0.5,
        target_frac=0.5,
    )
    docs = load_docs(spark, sf_dir, "doc_id", "source")
    # try_cast, not cast: an unparseable source label must tier into
    # the otherwise-branch, not ANSI-crash the whole job — on the
    # graded srcNN corpus the two are identical (rule-6 error-path
    # carve-out; the r9 adversarial corpus measured the crash).
    src_num = F.expr("try_cast(substring(source, 4, 8) AS int)")
    grouped = docs.select(
        "doc_id",
        F.when(src_num < 10, F.lit("web"))
        .when(src_num < 15, F.lit("books"))
        .otherwise(F.lit("code"))
        .alias("grp"),
    )
    kept = stratified_sample(grouped, rates, strata_col="grp", id_col="doc_id", seed=7)
    return (
        grouped.join(
            kept.select("doc_id", F.lit(True).alias("keep")), "doc_id", "left"
        )
        .select(
            "doc_id", "grp", F.coalesce("keep", F.lit(False)).alias("keep")
        )
        .orderBy("doc_id")
    )


@register(
    "pipe_doc_hash",
    oracle="""
    SELECT doc_id, sha256(text) AS doc_hash, length(text) AS text_len
    FROM documents
    ORDER BY doc_id
    """,
)
def pipe_doc_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 content hash: sha-256 of document text (reference
    document_processor.py:45-54) — JVM builtin sha2."""
    docs = load_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("doc_hash"),
        F.length("text").alias("text_len"),
    ).orderBy("doc_id")


@register(
    "pipe_chunk_normalized",
    oracle=r"""
    WITH base AS (
        SELECT doc_id, regexp_replace(text, '^[\x09-\x0d\x1c-\x1f\x85\x{2028}\x{2029}\p{Zs}]+|[\x09-\x0d\x1c-\x1f\x85\x{2028}\x{2029}\p{Zs}]+$', '', 'g') AS t
        FROM documents
    ),
    starts AS (
        SELECT doc_id, t,
               CAST(UNNEST(generate_series(0, greatest(length(t) - 1, 0), 200)) AS INT)
                   AS chunk_start
        FROM base WHERE length(t) > 0
    ),
    pieces AS (
        SELECT doc_id, chunk_start,
               regexp_replace(substring(t, chunk_start + 1, 300),
                              '^[\x09-\x0d\x1c-\x1f\x85\x{2028}\x{2029}\p{Zs}]+|[\x09-\x0d\x1c-\x1f\x85\x{2028}\x{2029}\p{Zs}]+$', '', 'g') AS chunk
        FROM starts
    ),
    normed AS (
        SELECT doc_id, chunk_start,
               trim(regexp_replace(chunk, '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ') AS text
        FROM pieces WHERE chunk != ''
    )
    SELECT doc_id, chunk_start, sha256(text) AS text_hash,
           length(text) AS n_chars
    FROM normed WHERE text != ''
    ORDER BY doc_id, chunk_start
    """,
)
def pipe_chunk_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3+T5: chunk (300/100) then Unicode-normalize each chunk via the
    pandas UDF (reference stage_split.py:60-63). The oracle's regex
    chain is equivalent on this corpus because the driver testdata is
    pure ASCII with no newlines (NFKC = identity there); the UDF's full
    char-class behavior is covered unit-side in test_text_functions."""
    from vectordb_light_spark.functions.text import make_normalize_udf
    from vectordb_light_spark.operators.chunker import split_fixed_size

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    chunks = split_fixed_size(
        docs, chunk_size=300, chunk_overlap=100, partition_cols=["doc_id"]
    )
    normalize = make_normalize_udf(preserve_whitespace=True)
    # The UDF appears in exactly ONE expression: a Filter and a Project
    # each referencing the UDF column would get their own
    # ArrowEvalPython node (the extractor does not share evals across
    # operators), running normalize twice. explode(filter(array(udf)))
    # fuses the null-drop into the same expression; downstream sha2/
    # length then reference a plain attribute.
    normed = chunks.select(
        "doc_id",
        "chunk_start",
        F.explode(
            F.filter(F.array(normalize(F.col("chunk"))), lambda x: x.isNotNull())
        ).alias("text"),
    )
    # sha-256 of the normalized chunk pins the VALUE while moving
    # 64 hex chars per row instead of the chunk text.
    # r12: ordered_once — the range sampling otherwise runs the chunk
    # explosion + NFKC pandas stage twice.
    return ordered_once(
        normed.select(
            "doc_id",
            "chunk_start",
            F.sha2(F.col("text"), 256).alias("text_hash"),
            F.length("text").alias("n_chars"),
        ),
        "doc_id", "chunk_start",
    )


@register(
    "pipe_pdf_page_chunks",
    oracle=r"""
    WITH starts AS (
        SELECT doc_id, text AS t,
               CAST(UNNEST(generate_series(0, greatest(length(text) - 1, 0), 200))
                   AS INT) AS s
        FROM documents WHERE length(text) > 0
    ),
    pieces AS (
        SELECT doc_id, s,
               regexp_replace(substring(t, s + 1, 300), '^[\x09-\x0d\x1c-\x1f\x85\x{2028}\x{2029}\p{Zs}]+|[\x09-\x0d\x1c-\x1f\x85\x{2028}\x{2029}\p{Zs}]+$', '', 'g')
                   AS chunk,
               CASE WHEN s >= 400 THEN 2 ELSE 1 END AS page_number
        FROM starts
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS INT)
               AS chunk_index,
           chunk, page_number
    FROM pieces WHERE chunk != ''
    ORDER BY doc_id, chunk_index
    """,
)
def pipe_pdf_page_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 PDF page-aware splitter (reference
    document_processor.py:411-477): ``[[pageN]]`` markers are located
    against marker-free offsets, stripped, the clean text is chunked
    (300/100), and each chunk attributed to the last marker at-or-
    before its start (default page 1).

    The page markers are synthesized at known positions — ``[[page1]]``
    at 0 and ``[[page2]]`` after 400 clean chars — so the oracle can
    state the attribution in closed form (``s >= 400 → page 2``) while
    the Spark side runs the real marker-parsing UDF on the marked text.
    Chunk values AND page attribution must both match."""
    from vectordb_light_spark.operators.chunker import split_pdf_pages

    docs = load_docs(spark, sf_dir, "doc_id", "text").where(F.length("text") > 0)
    marked = docs.select(
        "doc_id",
        F.concat(
            F.lit("[[page1]]"),
            F.substring("text", 1, 400),
            F.lit("[[page2]]"),
            F.expr("substring(text, 401)"),
        ).alias("text"),
    )
    out = split_pdf_pages(
        marked, text_col="text", chunk_size=300, chunk_overlap=100,
        partition_cols=["doc_id"],
    )
    # r12: ordered_once — the range sampling otherwise runs the PDF
    # synth + page-aware splitter twice.
    return ordered_once(
        out.select("doc_id", "chunk_index", "chunk", "page_number"),
        "doc_id", "chunk_index",
    )


def _topk_contract(
    embedded: DataFrame,
    out: DataFrame,
    *,
    vec_col: str = "vector",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bounded-contract projection for a hash-free embed+search entry
    (the prof_events_sketch r4 pattern, r6 verdict item 4): the raw
    scores have no SQL twin (blake2b / transformer forward pass), so
    the entry instead returns per-rank CHECK columns the oracle pins
    to constants — every embedded vector unit-norm (the E5 L2
    contract, checked over the WHOLE table, not just the top-k), the
    query doc retrieved at rank 1 with similarity ~1 (self-retrieval),
    every returned id a member of the corpus, scores clipped to [0,1]
    and monotone down the ranking, and the embed stage preserving
    cardinality. A wrong vector, dropped row, broken clip, or
    unstable sort flips a flag and fails the value hash."""
    sq_norm = F.aggregate(
        vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
    )
    stats = embedded.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.abs(F.sqrt(sq_norm) - 1.0) > 1e-5, 1)).alias(
            "n_bad_norms"
        ),
    )
    w = Window.orderBy("rank")
    pool = embedded.select(F.col(id_col), F.lit(1).alias("in_pool"))
    return (
        out.join(F.broadcast(pool), id_col, "left")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("rank").cast("int").alias("rank"),
            (F.col(id_col) == 0).cast("int").alias("is_query_doc"),
            F.coalesce("in_pool", F.lit(0)).cast("int").alias("in_pool"),
            (
                (F.col("rank") > 1)
                | (F.col("similarity_score") >= 0.999)
            ).cast("int").alias("top1_self_sim"),
            (
                F.col("similarity_score")
                <= F.lag("similarity_score", 1, 2.0).over(w) + 1e-12
            ).cast("int").alias("mono_ok"),
            (
                (F.col("similarity_score") >= 0.0)
                & (F.col("similarity_score") <= 1.0)
            ).cast("int").alias("score_in_range"),
            F.col("n_bad_norms").cast("long").alias("n_bad_norms"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
        .orderBy("rank")
    )


def _topk_contract_flipped(
    embedded: DataFrame,
    out: DataFrame,
    *,
    vec_col: str = "vector",
    id_col: str = "doc_id",
) -> DataFrame:
    """The wired (r9) replacement for :func:`_topk_contract` — the
    pool-membership check flips direction. The k-row top-k frame
    broadcasts INTO ``embedded`` and the membership evidence rides
    the SAME single reduce as the norm stats (collect_set of matched
    ids — ≤ k elements), so v1's broadcast of ALL corpus ids — the
    piece that cannot survive 100 TB (a multi-GB driver-side build)
    — disappears entirely. The embed stage still appears under 3
    subtrees in the lazy form (out twice + the reduce); the
    execution-count win comes from pairing this with
    ``persist_if_batch(embedded)`` at the call sites, which
    materializes the embed ONCE and serves every subtree from cache.

    r8 measurement record (sf0.1 hashing entry, median of 5 warm
    solos) behind the r9 wiring decision:

    - v1 as shipped: 2.10 s (3 embed subtrees overlap on local[32])
    - this form: 2.11 s plain / **1.85 s with persist_if_batch on
      ``embedded``**
    - v1 + persist: 1.45 s — bench-fastest, but keeps the corpus-id
      broadcast, so it trades the 100 TB hazard for local speed
    - a collect-the-top-k-once variant: 2.46 s — serializing the
      top-k job beats the subtree overlap; rejected

    Membership is judged on matched IDs, not matched ranks (ADVICE
    r8): collecting ranks made a malformed top-k that emits the same
    rank for an in-pool and an out-of-pool id mark BOTH rows in_pool.
    Byte-identical output to v1 is asserted by
    tests/test_search.py::test_topk_contract_flipped_matches_v1 (incl.
    duplicate-id and duplicate-rank mixed-membership inputs)."""
    sq_norm = F.aggregate(
        vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
    )
    # ONE broadcast row per distinct id — a malformed top-k that
    # repeats a doc_id at two ranks must not multiply embedded rows
    # through the join, or n_docs/n_bad_norms would inflate exactly
    # on the broken plans the contract exists to flag (r8 review
    # finding). collect_set over the matched join side is still ≤ k
    # elements on the same single reduce.
    per_id = out.select(id_col).distinct().withColumn(
        "__hit", F.lit(1)
    )
    j = embedded.join(F.broadcast(per_id), id_col, "left")
    red = j.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.abs(F.sqrt(sq_norm) - 1.0) > 1e-5, 1)).alias(
            "n_bad_norms"
        ),
        F.collect_set(
            F.when(F.col("__hit").isNotNull(), F.col(id_col))
        ).alias("__matched_ids"),
    )
    w = Window.orderBy("rank")
    return (
        out.crossJoin(F.broadcast(red))
        .select(
            F.col("rank").cast("int").alias("rank"),
            (F.col(id_col) == 0).cast("int").alias("is_query_doc"),
            # coalesce: array_contains is NULL for a NULL id; v1's
            # left-join+coalesce reads the same row as 0
            F.coalesce(
                F.array_contains("__matched_ids", F.col(id_col)),
                F.lit(False),
            ).cast("int").alias("in_pool"),
            (
                (F.col("rank") > 1)
                | (F.col("similarity_score") >= 0.999)
            ).cast("int").alias("top1_self_sim"),
            (
                F.col("similarity_score")
                <= F.lag("similarity_score", 1, 2.0).over(w) + 1e-12
            ).cast("int").alias("mono_ok"),
            (
                (F.col("similarity_score") >= 0.0)
                & (F.col("similarity_score") <= 1.0)
            ).cast("int").alias("score_in_range"),
            F.col("n_bad_norms").cast("long").alias("n_bad_norms"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
        .orderBy("rank")
    )


_TOPK_CONTRACT_ORACLE = """
    SELECT CAST(r AS INT) AS rank,
           CAST(CASE WHEN r = 1 THEN 1 ELSE 0 END AS INT) AS is_query_doc,
           CAST(1 AS INT) AS in_pool,
           CAST(1 AS INT) AS top1_self_sim,
           CAST(1 AS INT) AS mono_ok,
           CAST(1 AS INT) AS score_in_range,
           CAST(0 AS BIGINT) AS n_bad_norms,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs
    FROM generate_series(1, 10) t(r)
    ORDER BY rank
    """


@register("pipe_hash_embed_topk", oracle=_TOPK_CONTRACT_ORACLE)
def pipe_hash_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-path embed stage + read-path top-k in one plan: embed
    every document with the deterministic hashing encoder
    (mapInPandas, E1-E6 shape), then exact top-10 cosine against doc 0
    as the query — the full engine round-trip the driver can smoke
    at any scale factor. Upgraded (r7) from rows-only to the bounded
    contract of ``_topk_contract``: blake2b has no DuckDB twin, so
    the oracle pins unit norms over every embedded row,
    self-retrieval at rank 1, pool membership, clip range,
    monotonicity, and embed-stage cardinality instead. r9: flipped
    contract (membership broadcast is the k-row top-k, not the
    corpus ids) + the embed stage persisted once for its three
    consumers."""
    from vectordb_light_spark.functions.embedding import (
        HashingEmbedder,
        embed_documents,
    )
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine
    from vectordb_light_spark.session import persist_if_batch

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    embedded = persist_if_batch(
        embed_documents(
            docs, {"encoder": "hashing", "dim": 64, "seed": 0}
        ).drop("text")
    )
    qtext = docs.where(F.col("doc_id") == 0).select("text").first()[0]
    q = [float(x) for x in HashingEmbedder(dim=64, seed=0).encode([qtext])[0]]
    out = topk_cosine(
        embedded,
        q,
        SearchParams(k=10, threshold=0.0, assume_normalized=True),
        id_col="doc_id",
        vec_col="vector",
    )
    return _topk_contract_flipped(embedded, out)


@register("emb_mini_encoder_topk", oracle=_TOPK_CONTRACT_ORACLE)
def emb_mini_encoder_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL encoder inference end-to-end (E1/E3/E5/E8/E9): every
    document through the numpy mini-transformer (byte tokenizer →
    padded+masked multi-head attention → masked mean-pool → L2 norm)
    inside mapInPandas, then exact top-10 cosine against doc 0's
    vector. Same plan shape a sentence-transformers deployment runs —
    with the in-repo contrastively-trained checkpoint when it ships
    (assets/, tools/train_mini_encoder.py), seeded weights otherwise;
    the spec's weights tag keeps query and document encoders in
    lockstep either way. Upgraded (r7) from rows-only to the
    ``_topk_contract`` bounded oracle — the forward pass has no SQL
    twin, so the oracle pins unit norms across every encoded
    document, rank-1 self-retrieval, pool membership, clip range,
    monotonicity, and embed-stage cardinality. r9: flipped contract
    (k-row membership broadcast, no corpus-id broadcast) + the
    forward pass persisted once for its three consumers."""
    from vectordb_light_spark.functions.embedding import (
        MiniTransformerEmbedder,
        embed_documents,
    )
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine
    from vectordb_light_spark.session import persist_if_batch

    enc = MiniTransformerEmbedder(32, seed=5, max_seq=64)
    spec = enc.spec
    docs = load_docs(spark, sf_dir, "doc_id", "text")
    embedded = persist_if_batch(embed_documents(docs, spec).drop("text"))
    qtext = docs.where(F.col("doc_id") == 0).select("text").first()[0]
    q = [float(x) for x in enc.encode([qtext])[0]]
    out = topk_cosine(
        embedded,
        q,
        SearchParams(k=10, threshold=0.0, assume_normalized=True),
        id_col="doc_id",
        vec_col="vector",
    )
    return _topk_contract_flipped(embedded, out)


# ---------------------------------------------------------------------------
# Text analysis (beyond-reference north star; BASELINE.json)
# ---------------------------------------------------------------------------


@register(
    "ts_text_stats",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN length(trim(text, ' ')) = 0 THEN 0
                ELSE CAST(length(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0B\f\r]+')) AS INT)
           END AS n_ws_tokens,
           CAST(length(regexp_extract_all(text, '\w+|[^\w \t\n\x0B\f\r]')) AS INT) AS n_word_tokens,
           ROUND(CASE WHEN length(text) = 0 THEN 0.0
                 ELSE length(regexp_extract_all(text, '[^\w \t\n\x0B\f\r]'))::DOUBLE / length(text)
                 END, 6) AS punct_ratio,
           length(text) AS n_chars_actual
    FROM documents
    ORDER BY doc_id
    """,
)
def ts_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + punctuation ratio per document — all JVM-side
    regexp builtins (north-star text-analysis surface)."""
    from vectordb_light_spark.functions.text import (
        punct_ratio,
        whitespace_token_count,
        word_token_count,
    )

    docs = load_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        whitespace_token_count("text").alias("n_ws_tokens"),
        word_token_count("text").cast("int").alias("n_word_tokens"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        F.length("text").alias("n_chars_actual"),
    ).orderBy("doc_id")


def _lang_id_oracle_sql() -> str:
    """DuckDB twin of ts_lang_id, GENERATED from LANG_PROFILES so the
    oracle can never drift from the shipped profiles: same per-lang
    word-boundary regexp counts, same code-order tie-break CASE, same
    sorted-array top1−top2 margin."""
    from vectordb_light_spark.functions.text import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    # Spark counts with Java \b (Unicode-word-aware); RE2's \b is
    # ASCII, so e.g. '\bund\b' would fire inside "Ñundú"-style words
    # here but not on Spark. Lookaround-free pin (r9): split on
    # maximal non-word runs with the JAVA word class and count token
    # membership — exact for the all-ASCII-word-char profiles.
    def words_list(lang: str) -> str:
        return "[" + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang]) + "]"

    score_cols = ",\n            ".join(
        "len(list_filter(regexp_split_to_array(lower(text), "
        f"'[^\\p{{L}}\\p{{Nd}}_]+'), x -> list_contains({words_list(lang)}, x))) "
        f"AS s_{lang}"
        for lang in langs
    )
    slist = ", ".join(f"s_{lang}" for lang in langs)
    gexpr = f"greatest({slist})"
    case = f"CASE WHEN {gexpr} = 0 THEN 'und'\n"
    for lang in langs[:-1]:
        case += f"                WHEN s_{lang} = {gexpr} THEN '{lang}'\n"
    case += f"                ELSE '{langs[-1]}' END"
    n = len(langs)
    margin = (
        f"CAST(list_sort([{slist}])[{n}] - list_sort([{slist}])[{n - 1}] "
        "AS INT)"
    )
    return f"""
    WITH s AS (
        SELECT doc_id, lang AS label,
            {score_cols}
        FROM documents
    )
    SELECT doc_id, label,
           {case} AS detected_lang,
           {margin} AS margin
    FROM s
    ORDER BY doc_id
    """


@register("ts_lang_id", oracle=_lang_id_oracle_sql())
def ts_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (function-word evidence over 10 ASCII
    profiles, argmax with code-order tie-break) plus the top1−top2
    evidence ``margin`` so downstream gates can threshold confidence
    instead of trusting every argmax — all JVM regex counts + integer
    arithmetic. The testdata's lang labels are synthetic token soup,
    so the oracle checks the scoring function itself, not label
    recovery; per-language trip tests live in
    tests/test_text_functions.py."""
    from vectordb_light_spark.functions.text import lang_id, lang_margin

    docs = load_docs(spark, sf_dir)
    # r12: ordered_once — the range sampling otherwise runs the
    # n-gram profile scoring twice.
    return ordered_once(
        docs.select(
            "doc_id",
            F.col("lang").alias("label"),
            lang_id("text").alias("detected_lang"),
            lang_margin("text").cast("int").alias("margin"),
        ),
        "doc_id",
    )


@register(
    "ts_quality_score",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               length(text) AS n,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE len(regexp_extract_all(text, '[^\w \t\n\x0B\f\r]'))::DOUBLE
                         / length(text) END AS pr,
               CASE WHEN len(regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+')) = 0
                    THEN 0.0
                    ELSE len(list_filter(
                        regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+'),
                        x -> list_contains(
                            ['the','a','an','and','or','of','to','in','is','it',
                             'that','for','on','with','as','was','at','by','be'],
                            regexp_replace(x, '[^\w]', '', 'g'))))::DOUBLE
                         / len(regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+'))
               END AS swr
        FROM documents
    )
    SELECT doc_id,
           ROUND(least(n / 500.0, 1.0) * 0.4
                 + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.5 END) * 0.3
                 + (CASE WHEN swr >= 0.05 THEN 1.0 ELSE 0.5 END) * 0.3,
                 6) AS quality
    FROM t
    ORDER BY doc_id
    """,
)
def ts_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality heuristic (length band + punctuation
    sanity + stopword presence) — the Gopher/C4-style corpus filter,
    builtin-only."""
    from vectordb_light_spark.functions.text import quality_score

    docs = load_docs(spark, sf_dir)
    return docs.select(
        "doc_id", F.round(quality_score("text"), 6).alias("quality")
    ).orderBy("doc_id")


def _quality_logit_ctes() -> str:
    """The shared CTE chain computing ``s(doc_id, n_tok, logit_q)`` —
    the quantized integer quality-classifier logit in pure SQL (same
    weights as literals, same md5 bucket, same higher-order sum as the
    Spark side). Shared by the ts_quality_classifier and
    pipe_curriculum_order oracles (and pipe_curate_chain's quality
    stage) so the twins cannot drift. r9: the leading trim pinned to
    2-arg form — DuckDB's 1-arg trim strips the Unicode SPACE class
    where Spark's strips only ASCII space, the last unpinned site the
    adversarial harness measured as holds-on-margin (14/400 salted
    docs flipped logits without crossing the keep threshold)."""
    from vectordb_light_spark.functions.quality_weights import (
        BIAS_Q,
        N_BUCKETS,
        WEIGHTS_Q,
    )

    weights = "[" + ", ".join(str(int(x)) for x in WEIGHTS_Q) + "]"
    return f"""w AS (SELECT {weights}::BIGINT[] AS l),
    t AS (
        SELECT doc_id,
               list_filter(
                   string_split_regex(lower(trim(coalesce(text, ''), ' ')),
                                      '[ \\t\\n\\x0b\\f\\r]+'),
                   x -> x <> '') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tok,
               CAST({BIAS_Q} + COALESCE(list_sum(list_transform(toks,
                    tk -> l[CAST(CAST(('0x' || substr(md5(tk), 1, 8)) AS BIGINT)
                            % {N_BUCKETS} AS INT) + 1])), 0) AS BIGINT) AS logit_q
        FROM t, w
    )"""


def _quality_classifier_oracle_sql() -> str:
    """DuckDB twin of ts_quality_classifier: the logit is exact 64-bit
    arithmetic in both engines, so the match is bit-for-bit (no float
    dot-product drift), the pipe_dsir_select trick upgraded from
    buckets to the whole model."""
    return f"""
    WITH {_quality_logit_ctes()}
    SELECT doc_id, n_tok, logit_q, logit_q > 0 AS keep
    FROM s ORDER BY doc_id
    """


@register("ts_quality_classifier", oracle=_quality_classifier_oracle_sql())
def ts_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate (CCNet / RefinedWeb tier —
    operators/quality_model.py): a hashed-unigram logistic classifier,
    numpy-trained offline by distilling the rule-based quality_score
    gate (tools/train_quality_classifier.py; held-out acc 0.850 vs
    0.540 majority base), quantized to integer micro-weights and
    scored ENTIRELY map-side — tokenize → element_at on the literal
    weight array → higher-order aggregate sum, one projection over
    the scan with no explode, no groupBy, no join, no UDF. At 100 TB
    the classifier costs exactly the text scan. logit_q is the exact
    integer micro-logit (σ(logit_q/1e6) > 0.5 ⇔ keep)."""
    from vectordb_light_spark.functions.quality_weights import BIAS_Q, WEIGHTS_Q
    from vectordb_light_spark.operators.quality_model import (
        quality_classifier_scores,
    )

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    return quality_classifier_scores(docs, WEIGHTS_Q, BIAS_Q).orderBy("doc_id")


@register(
    "ts_readability",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                                           '[a-z0-9]+')) AS BIGINT) AS w0,
               CAST(greatest(len(regexp_extract_all(coalesce(text, ''),
                                                    '[.!?]')), 1) AS BIGINT) AS s,
               CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                                           '[aeiouy]+')) AS BIGINT) AS y
        FROM documents
    ),
    g AS (SELECT doc_id, w0, s, y, greatest(w0, 1) AS w FROM t)
    SELECT doc_id,
           CAST(w0 AS INT) AS n_words,
           CAST(s AS INT) AS n_sentences,
           CAST(y AS INT) AS n_syllables,
           CAST((390 * w * w + 11800 * y * s + 984410 * w * s)
                // (w * s) - 1000000 AS BIGINT) AS fk_grade_milli
    FROM g ORDER BY doc_id
    """,
)
def ts_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability gate (the FineWeb-Edu-style document-difficulty
    signal; functions/text.py readability_counts +
    flesch_kincaid_grade_milli): Flesch–Kincaid grade level from three
    integer counts — alphanumeric word runs, terminal punctuation
    (floored at 1), vowel-group syllable estimates — each ONE regexp
    scan, all map-side, zero shuffles beyond the sort. The grade is
    computed ×1000 in EXACT 64-bit integer arithmetic (common
    denominator + offset keeps the numerator non-negative, remainder
    subtracted before an exact decimal division), so Spark and DuckDB
    agree bit-for-bit — the quality-classifier integer-quantization
    pattern applied to a float formula. At 100 TB the cost is exactly
    the text scan."""
    from vectordb_light_spark.functions.text import (
        flesch_kincaid_grade_milli,
        readability_counts,
    )

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    c = readability_counts("text")
    return docs.select(
        "doc_id",
        c["n_words"].alias("n_words"),
        c["n_sentences"].alias("n_sentences"),
        c["n_syllables"].alias("n_syllables"),
    ).select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        flesch_kincaid_grade_milli(
            F.col("n_words"), F.col("n_sentences"), F.col("n_syllables")
        ).alias("fk_grade_milli"),
    ).orderBy("doc_id")


def _curate_gate_ctes() -> str:
    """The curate chain's gate CTEs (exact dedup ``d1``, repetition
    ``rep``, quality ``q`` — each the SAME shared CTE text as its
    standalone oracle), factored so the composed chain oracle and the
    r12 chain+split oracle share one spelling and cannot drift."""
    return f"""{_quality_logit_ctes()},
    keyed AS (
        SELECT doc_id,
               sha256(lower(trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '))) AS k2
        FROM documents
    ),
    winners AS (SELECT k2, MIN(doc_id) AS doc_id FROM keyed GROUP BY k2),
    d1 AS (SELECT keyed.doc_id FROM keyed
           JOIN winners ON keyed.k2 = winners.k2
                       AND keyed.doc_id = winners.doc_id),
    tok3 AS (
        SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '[ \\t\\n\\x0B\\f\\r]+') AS toks3
        FROM documents
    ),
    g3 AS (
        SELECT doc_id,
               CASE WHEN len(toks3) <= 3 THEN [array_to_string(toks3, ' ')]
                    ELSE list_transform(generate_series(1, len(toks3) - 2),
                                        i -> array_to_string(toks3[i:i+2], ' '))
               END AS grams
        FROM tok3
    ),
    rep AS (
        SELECT doc_id FROM g3
        WHERE 1.0 - len(list_distinct(grams))::DOUBLE / len(grams) <= 0.05
    ),
    q AS (SELECT doc_id FROM s WHERE logit_q > 0)"""


def _curate_chain_oracle_sql() -> str:
    """DuckDB twin of pipe_curate_chain: the three stages are pure
    filters, so the composed survivor set is the INTERSECTION of the
    per-stage keep sets — each expressed with the SAME shared CTE text
    as its standalone oracle (quality logits via _quality_logit_ctes,
    exact dedup and repetition as the dd_exact_dedup /
    ts_repetition_filter shapes)."""
    return f"""
    WITH {_curate_gate_ctes()}
    SELECT d.doc_id, CAST(length(d.text) AS INT) AS n_chars
    FROM documents d
    JOIN d1 ON d.doc_id = d1.doc_id
    JOIN rep ON d.doc_id = rep.doc_id
    JOIN q ON d.doc_id = q.doc_id
    ORDER BY d.doc_id
    """


#: Gopher-rule CTEs (gt/gm), factored so composed oracles can reuse
#: the exact text (the curate chain ultimately grades the Gopher gate
#: standalone — see pipe_curate_chain's docstring — but the factoring
#: stays: one text, any future composition cannot drift).
_GOPHER_TM_CTES = r"""gt AS (
        SELECT doc_id,
               trim(text, ' ') AS tt,
               CASE WHEN length(trim(text, ' ')) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text, ' '), '[ \t\n\x0B\f\r]+'))
               END AS n_words,
               length(regexp_replace(trim(text, ' '), '[ \t\n\x0B\f\r]', '', 'g')) AS nonspace,
               len(regexp_extract_all(trim(text, ' '), '#|\.\.\.|…')) AS n_sym,
               CASE WHEN length(trim(text, ' ')) = 0 THEN 0
                    ELSE len(list_filter(
                        regexp_split_to_array(trim(text, ' '), '[ \t\n\x0B\f\r]+'),
                        x -> regexp_matches(x, '[A-Za-z]')))
               END AS n_alpha,
               -- Java \b is Unicode-word-aware (Character.isLetterOrDigit
               -- plus '_') while RE2 \b is ASCII, so '\band\b' fires
               -- inside "Ñandú" here but not on Spark (r9 adversarial
               -- harness catch). Lookaround-free pin: split on maximal
               -- non-word runs with the JAVA word class and test token
               -- membership — exact for all-word-char stopwords.
               (CASE WHEN list_contains(regexp_split_to_array(lower(trim(text, ' ')), '[^\p{L}\p{Nd}_]+'), 'the') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(regexp_split_to_array(lower(trim(text, ' ')), '[^\p{L}\p{Nd}_]+'), 'be') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(regexp_split_to_array(lower(trim(text, ' ')), '[^\p{L}\p{Nd}_]+'), 'to') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(regexp_split_to_array(lower(trim(text, ' ')), '[^\p{L}\p{Nd}_]+'), 'of') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(regexp_split_to_array(lower(trim(text, ' ')), '[^\p{L}\p{Nd}_]+'), 'and') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(regexp_split_to_array(lower(trim(text, ' ')), '[^\p{L}\p{Nd}_]+'), 'that') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(regexp_split_to_array(lower(trim(text, ' ')), '[^\p{L}\p{Nd}_]+'), 'have') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(regexp_split_to_array(lower(trim(text, ' ')), '[^\p{L}\p{Nd}_]+'), 'with') THEN 1 ELSE 0 END
               ) AS stop_hits,
               string_split(text, chr(10)) AS lines
        FROM documents
    ),
    gm AS (
        SELECT doc_id, n_words,
               CASE WHEN n_words = 0 THEN 0.0
                    ELSE nonspace::DOUBLE / n_words END AS mean_wl,
               CASE WHEN n_words = 0 THEN 0.0
                    ELSE n_sym::DOUBLE / n_words END AS symbol_ratio,
               CASE WHEN n_words = 0 THEN 0.0
                    ELSE n_alpha::DOUBLE / n_words END AS alpha_frac,
               stop_hits,
               len(list_filter(lines,
                   x -> regexp_matches(trim(x, ' '), '^[-*•]')))::DOUBLE
                   / len(lines) AS bullet_frac,
               len(list_filter(lines,
                   x -> regexp_matches(trim(x, ' '), '(\.\.\.|…)$')))::DOUBLE
                   / len(lines) AS ellipsis_frac
        FROM gt
    )"""

_GOPHER_KEEP_SQL = """(n_words >= 50 AND n_words <= 100000)
               AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
               AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
               AND stop_hits >= 2 AND bullet_frac <= 0.9
               AND ellipsis_frac <= 0.3"""


@register(
    "ts_gopher_filter",
    oracle=f"""
    WITH {_GOPHER_TM_CTES}
    SELECT doc_id,
           CAST(n_words AS INT) AS n_words,
           ROUND(mean_wl, 6) AS mean_word_len,
           n_words >= 50 AND n_words <= 100000 AS rule_word_count,
           mean_wl >= 3.0 AND mean_wl <= 10.0 AS rule_mean_word_len,
           symbol_ratio <= 0.1 AS rule_symbol_ratio,
           alpha_frac >= 0.8 AS rule_alpha_words,
           stop_hits >= 2 AS rule_stopwords,
           bullet_frac <= 0.9 AS rule_bullet_lines,
           ellipsis_frac <= 0.3 AS rule_ellipsis_lines,
           (n_words >= 50 AND n_words <= 100000)
               AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
               AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
               AND stop_hits >= 2 AND bullet_frac <= 0.9
               AND ellipsis_frac <= 0.3 AS keep
    FROM gm
    ORDER BY doc_id
    """,
)
def ts_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document-quality RULE filter (Rae et al. 2021
    §A1.1.2): word count / mean word length / symbol ratio / alpha
    fraction / required stopwords / bullet + ellipsis line ratios,
    each surfaced as an independent boolean plus the combined
    ``keep`` — the standard pre-training corpus gate. All JVM-side
    builtins (functions/text.py gopher_rules), zero UDFs, so the
    filter rides whole-stage codegen over a 100 TB scan."""
    from vectordb_light_spark.functions.text import gopher_rules

    docs = load_docs(spark, sf_dir)
    r = gopher_rules("text")
    return docs.select(
        "doc_id",
        r["n_words"].cast("int").alias("n_words"),
        F.round(r["mean_word_len"], 6).alias("mean_word_len"),
        r["rule_word_count"].alias("rule_word_count"),
        r["rule_mean_word_len"].alias("rule_mean_word_len"),
        r["rule_symbol_ratio"].alias("rule_symbol_ratio"),
        r["rule_alpha_words"].alias("rule_alpha_words"),
        r["rule_stopwords"].alias("rule_stopwords"),
        r["rule_bullet_lines"].alias("rule_bullet_lines"),
        r["rule_ellipsis_lines"].alias("rule_ellipsis_lines"),
        r["keep"].alias("keep"),
    ).orderBy("doc_id")


@register("pipe_curate_chain", oracle=_curate_chain_oracle_sql())
def pipe_curate_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `curate` CLI chain as ONE driver-graded plan
    (operators/curate_pipeline.py run_curation, report=False): exact
    dedup → repetition gate (bar 0.05 — the corpus-splitting setting
    here) → learned quality gate, composed lazily so the whole
    pipeline is a single job. The Gopher stage is exercised standalone
    by ts_gopher_filter instead: its required-stopword rule is
    structurally zero on this synthetic vocabulary, and an empty
    survivor set would grade nothing. All stages are pure filters, so
    the oracle intersects the per-stage keep sets — each written with
    the SAME shared CTE text as its standalone oracle (the twins
    cannot drift). Scale shape: one narrow-key dedup exchange + one
    quality semi-join; every gate expression rides the scan. This is
    the entry that pins the PRODUCT surface (the CLI chain), not just
    its ingredients."""
    from vectordb_light_spark.operators.curate_pipeline import run_curation

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    out, _ = run_curation(
        docs,
        ("exact_dedup", "repetition", "quality"),
        report=False,
        repetition_bar=0.05,
    )
    return out.select(
        "doc_id", F.length("text").cast("int").alias("n_chars")
    ).orderBy("doc_id")


@register(
    "ts_c4_filter",
    oracle=r"""
    WITH d AS (
        SELECT doc_id,
               replace(replace(coalesce(text, ''), ' table ', ' table.' || chr(10)),
                       ' merge ', ' merge!' || chr(10)) AS lined
        FROM documents
    ),
    t AS (
        SELECT doc_id,
               list_filter(string_split(lined, chr(10)), x ->
                   regexp_matches(trim(x, ' '), '[.!?"”]$')
                   AND len(regexp_split_to_array(trim(x, ' '), '[ \t\n\x0B\f\r]+')) >= 5
                   AND NOT regexp_matches(lower(trim(x, ' ')), 'javascript')
                   AND NOT regexp_matches(lower(trim(x, ' ')),
                       'terms of use|privacy policy|cookie policy|uses cookies')
               ) AS kept,
               lower(lined) AS low
        FROM d
    ),
    m AS (
        SELECT doc_id,
               coalesce(array_to_string(kept, chr(10)), '') AS cleaned,
               CAST(len(kept) AS INT) AS n_lines_kept,
               low
        FROM t
    )
    SELECT doc_id,
           n_lines_kept,
           CAST(len(regexp_extract_all(cleaned, '[.!?]')) AS INT)
               AS n_sentences,
           md5(cleaned) AS cleaned_md5,
           len(regexp_extract_all(cleaned, '[.!?]')) >= 3
               AS rule_min_sentences,
           NOT regexp_matches(low, 'lorem ipsum') AS rule_no_lorem,
           NOT contains(low, '{') AS rule_no_brace,
           NOT len(list_intersect(regexp_split_to_array(low, '[^\p{L}\p{Nd}_]+'), ['porn', 'xxx', 'viagra'])) > 0
               AS rule_no_bad_words,
           len(regexp_extract_all(cleaned, '[.!?]')) >= 3
               AND NOT regexp_matches(low, 'lorem ipsum')
               AND NOT contains(low, '{')
               AND NOT len(list_intersect(regexp_split_to_array(low, '[^\p{L}\p{Nd}_]+'), ['porn', 'xxx', 'viagra'])) > 0
               AS keep
    FROM m
    ORDER BY doc_id
    """,
)
def ts_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style page cleaning (Raffel et al. 2020 §2.2): the line
    filter (terminal punctuation, ≥5 words, no javascript/policy
    boilerplate) plus the page rules (≥3 sentences, no lorem ipsum /
    brace / bad-word hit). The testdata corpus is single-line token
    soup with no sentence punctuation, so the entry first derives a
    deterministic line structure (literal ``' table '``/``' merge '``
    → token + ender + newline, same non-overlapping left-scan replace
    in both engines) — every downstream column then varies per doc.
    ``cleaned_md5`` hashes the TRANSFORMED text so the oracle
    verifies the line filtering itself, not just the booleans. All
    JVM-side builtins (functions/text.py c4_rules), zero UDFs — rides
    whole-stage codegen over a 100 TB scan."""
    from vectordb_light_spark.functions.text import c4_rules

    # NULL text coalesces to '' on BOTH sides (oracle mirrors), so a
    # corpus with NULL documents still hash-matches: md5('') vs
    # md5(NULL)=NULL was a latent parity break (ADVICE r5).
    docs = load_docs(spark, sf_dir).withColumn(
        "lined",
        F.replace(
            F.replace(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" table "),
                F.lit(" table.\n"),
            ),
            F.lit(" merge "),
            F.lit(" merge!\n"),
        ),
    )
    r = c4_rules("lined")
    return docs.select(
        "doc_id",
        r["n_lines_kept"].alias("n_lines_kept"),
        r["n_sentences"].cast("int").alias("n_sentences"),
        F.md5(r["cleaned_text"]).alias("cleaned_md5"),
        r["rule_min_sentences"].alias("rule_min_sentences"),
        r["rule_no_lorem"].alias("rule_no_lorem"),
        r["rule_no_brace"].alias("rule_no_brace"),
        r["rule_no_bad_words"].alias("rule_no_bad_words"),
        r["keep"].alias("keep"),
    ).orderBy("doc_id")


@register(
    "ts_winnow_fingerprints",
    oracle=r"""
    WITH c AS (
        SELECT doc_id, lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) AS t
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, greatest(length(t) - 8 + 1, 1)),
                   s -> list_reduce(
                       list_prepend(0::BIGINT,
                           list_transform(
                               generate_series(0, least(8, length(t)) - 1),
                               j -> ord(substring(t, s + j, 1))::BIGINT)),
                       (acc, x) -> (acc * 257 + x) % 2147483647)) AS hs
        FROM c WHERE length(t) > 0
    ),
    w AS (
        SELECT doc_id,
               CASE WHEN len(hs) <= 4 THEN [list_min(hs)]
                    ELSE list_transform(generate_series(1, len(hs) - 4 + 1),
                                        i -> list_min(list_slice(hs, i, i + 3)))
               END AS mins
        FROM h
    )
    SELECT doc_id,
           CAST(len(list_distinct(mins)) AS INT) AS n_fps,
           -- CAST: list_aggregate('sum') yields HUGEINT (int128); the
           -- driver's hasher renders int128 unlike Spark's BIGINT.
           CAST(list_aggregate(list_distinct(mins), 'sum') AS BIGINT) AS fp_sum,
           list_min(mins) AS fp_min, list_max(mins) AS fp_max
    FROM w
    ORDER BY doc_id
    """,
)
def ts_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing, Schleimer et
    al. 2003): polynomial k-gram hashes (k=8, base 257, mod 2^31-1)
    → per-window minima (w=4) → distinct set, checksummed per document
    (count/sum/min/max of the fingerprint set). Both sides compute the
    identical integer recurrence hash-by-hash — the checksum columns
    pin the VALUES while keeping the result one row per document
    instead of one per fingerprint (~100× less result transfer at any
    scale; the exploded form is `F.explode(winnow(t))` on the same
    operator)."""
    from vectordb_light_spark.functions.text import make_winnow_udf
    from vectordb_light_spark.operators.dedup import canonical_text

    docs = load_docs(spark, sf_dir)
    canon = docs.select("doc_id", canonical_text("text").alias("t")).where(
        F.length("t") > 0
    )
    winnow = make_winnow_udf()
    fps = canon.select("doc_id", winnow(F.col("t")).alias("fps"))
    # r12: ordered_once — the range sampling otherwise runs the
    # winnowing window-min fold twice.
    return ordered_once(
        fps.select(
            "doc_id",
            F.size("fps").alias("n_fps"),
            F.aggregate(
                "fps", F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("fp_sum"),
            F.array_min("fps").alias("fp_min"),
            F.array_max("fps").alias("fp_max"),
        ),
        "doc_id",
    )


# ---------------------------------------------------------------------------
# Deduplication (beyond-reference north star; BASELINE.json)
# ---------------------------------------------------------------------------


@register(
    "dd_exact_dedup",
    oracle=r"""
    WITH keyed AS (
        SELECT doc_id, lang, source,
               sha256(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))) AS k
        FROM documents
    ),
    winners AS (SELECT k, MIN(doc_id) AS doc_id FROM keyed GROUP BY k)
    SELECT keyed.doc_id AS doc_id, lang, source
    FROM keyed JOIN winners ON keyed.k = winners.k AND keyed.doc_id = winners.doc_id
    ORDER BY keyed.doc_id
    """,
)
def dd_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on canonicalized text, deterministic min-id
    survivor. One narrow-key shuffle (SURVEY §4.1 north star)."""
    from vectordb_light_spark.operators.dedup import exact_dedup

    docs = load_docs(spark, sf_dir, "doc_id", "lang", "source", "text")
    return exact_dedup(docs).select("doc_id", "lang", "source").orderBy("doc_id")


@register(
    "dd_duplicate_groups",
    oracle=r"""
    SELECT sha256(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))) AS text_hash,
           COUNT(*) AS n_dups, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents
    GROUP BY 1 HAVING COUNT(*) > 1
    ORDER BY text_hash
    """,
)
def dd_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster report (observability companion)."""
    from vectordb_light_spark.operators.dedup import duplicate_groups

    docs = load_docs(spark, sf_dir)
    return duplicate_groups(docs).orderBy("text_hash")


@register(
    "dd_jaccard_pairs",
    oracle=r"""
    WITH s AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(0, greatest(length(t) - 5, 0)),
                   x -> substring(t, x + 1, 5))) AS sh
        FROM (SELECT doc_id,
                     lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ')) AS t
              FROM documents WHERE doc_id < 250)
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE
                     / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.5
    ORDER BY id_a, id_b
    """,
)
def dd_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact char-5-gram Jaccard near-dup pairs (threshold 0.5) on the
    doc_id<250 slice — the exact-verification tier of the dedup stack.
    The slice keeps the oracle's O(N²) tractable; at scale the engine
    runs this only within LSH candidate buckets
    (operators.dedup.minhash_lsh_candidates)."""
    from vectordb_light_spark.operators.dedup import add_char_shingles

    docs = add_char_shingles(
        load_docs(spark, sf_dir).where(F.col("doc_id") < 250),
        shingle_n=5,
        out_col="sh0",
    )
    # Intersect/union on xxhash64'd shingles: set sizes are identical
    # to the string computation barring a 64-bit in-pair collision
    # (~|A|·|B|/2^64 ≈ 1e-13 per pair — below float round-off), and
    # long-array set ops are several× faster than string-array ones.
    docs = docs.select(
        "doc_id", F.transform("sh0", lambda s: F.xxhash64(s)).alias("sh")
    ).withColumn("n", F.size("sh"))
    a = docs.select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"), F.col("n").alias("n_a")
    )
    b = docs.select(
        F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"), F.col("n").alias("n_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        # size-ratio prefilter: J = I/U ≤ min(|A|,|B|)/max(|A|,|B|), so
        # J ≥ t requires min/max ≥ t — prunes the expensive set ops
        # without changing the result set.
        .where(
            F.least("n_a", "n_b").cast("double")
            >= F.lit(0.5) * F.greatest("n_a", "n_b")
        )
        .withColumn("jaccard", F.round(inter.cast("double") / union, 6))
        .where(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


def _shingle_hash_cte(
    n: int, pinned: bool = False, source: str = "documents"
) -> str:
    """DuckDB CTE fragment computing, per document, the SAME 31-bit
    polynomial char-shingle hashes as ``dedup._np_shingle_hashes``
    (finalize=False): window n, base 257, mod 2^31-1 over canonical
    text — the oracle-twin hash family.

    ``pinned=True`` spells the canonicalization with the explicit
    whitespace class + 2-arg trim (the r8 cross-engine pin — see
    tools/audit_cross_engine_tokens.py). The legacy ``\\s+``/1-arg
    spelling remains only as the documented before-state — every call
    site passes pinned=True as of r9 (dd_simhash_near_dups and
    dd_duplicate_clusters flipped with their grading slots)."""
    canon = (
        "lower(trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '))"
        if pinned
        else "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    )
    return f"""
    c AS (
        SELECT doc_id, {canon} AS t
        FROM {source}
    ),
    h AS (
        SELECT doc_id,
               list_transform(
                   generate_series(1, greatest(length(t) - {n} + 1, 1)),
                   s -> list_reduce(
                       list_prepend(0::BIGINT,
                           list_transform(
                               generate_series(0, least({n}, length(t)) - 1),
                               j -> ord(substring(t, s + j, 1))::BIGINT)),
                       (acc, x) -> (acc * 257 + x) % 2147483647)) AS hs
        FROM c WHERE length(t) > 0
    )"""


def _minhash_cand_ctes(
    pair_cond: str = "a.doc_id < bb.doc_id",
    pinned: bool = False,
    source: str = "documents",
) -> str:
    """Shared CTE chain ending in ``cand`` = MinHash-LSH candidate
    pairs (poly31 family, 16 hashes / 4 bands, n_eq ≥ 12): signature
    minima over the mod-2^61-1 multiply-shift family (constants from
    ``minhash_poly_params``), poly band keys, band equi-join —
    integer-for-integer the same arithmetic as the Spark plan. Used
    by the candidates oracle, the recursive-CTE clusters oracle, and
    (with a cross-corpus ``pair_cond``) the cross-corpus oracle.

    ``pinned`` forwards to :func:`_shingle_hash_cte` — every caller
    passes True as of r9 (dd_duplicate_clusters flipped with its
    grading slot)."""
    from vectordb_light_spark.operators.dedup import minhash_poly_params

    p61 = (1 << 61) - 1
    a_list, b_list = minhash_poly_params(16, 42)
    sig_items = ",\n               ".join(
        f"list_min(list_transform(hs, x -> CAST(({a}::HUGEINT * x"
        f" % {p61} + {b}) % {p61} AS BIGINT)))"
        for a, b in zip(a_list, b_list)
    )
    return f"""{_shingle_hash_cte(5, pinned=pinned, source=source)},
    sig AS (
        SELECT doc_id,
               [{sig_items}] AS sig
        FROM h
    ),
    bands AS (
        SELECT doc_id, sig, b.i AS band_idx,
               list_reduce(
                   list_prepend(0::BIGINT, list_slice(sig, b.i * 4 + 1, b.i * 4 + 4)),
                   (acc, v) -> (acc * 257 + v % 2147483647) % 2147483647
               ) AS band_key
        FROM sig, UNNEST([0, 1, 2, 3]) AS b(i)
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b,
                        a.sig AS sa, bb.sig AS sb
        FROM bands a
        JOIN bands bb ON a.band_idx = bb.band_idx
                     AND a.band_key = bb.band_key
                     AND {pair_cond}
    ),
    cand AS (
        SELECT id_a, id_b, n_eq
        FROM (
            SELECT id_a, id_b,
                   len(list_filter(generate_series(1, 16), i -> sa[i] = sb[i])) AS n_eq
            FROM pairs
        )
        WHERE n_eq >= 12
    )"""


def _minhash_oracle_sql() -> str:
    """Full-pipeline MinHash-LSH oracle: signature minima over the
    mod-2^61-1 multiply-shift family (constants shared with the
    engine via ``minhash_poly_params``), poly band keys, band
    equi-join, est-Jaccard filter — integer-for-integer the same
    arithmetic as the Spark plan."""
    return f"""
    WITH {_minhash_cand_ctes(pinned=True)}
    SELECT id_a, id_b, ROUND(n_eq / 16.0, 6) AS est_jaccard
    FROM cand
    ORDER BY id_a, id_b
    """


@register("dd_minhash_candidates", oracle=_minhash_oracle_sql())
def dd_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (16 hashes, 4 bands,
    est-Jaccard ≥ 0.75) — the scale path for N×N near-dedup: shuffle
    carries only (band_key, id, signature), never text. Runs the
    ``poly31`` oracle-twin hash family so DuckDB replays signature,
    banding, and estimate bit-for-bit; the production default
    (splitmix64/xxhash64, 64 hashes) shares every line of plan and is
    recall-tested in tests/test_dedup.py. ``max_bucket=None`` pins the
    uncapped all-pairs semantics the SQL twin models — hash equality
    must not hinge on a data property (no graded band bucket above the
    production cap); the capped production default is unit- and
    scale-probe-tested, and the graded SFs are asserted under the cap
    in tests/test_dedup.py."""
    from vectordb_light_spark.operators.dedup import (
        canonical_text,
        minhash_lsh_candidates,
    )

    docs = load_docs(spark, sf_dir).where(F.length(canonical_text("text")) > 0)
    return (
        minhash_lsh_candidates(
            docs, num_hashes=16, bands=4, hash_family="poly31", max_bucket=None
        )
        .where(F.col("est_jaccard") >= 0.75)
        .select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))
        .orderBy("id_a", "id_b")
    )


def _cross_corpus_oracle_sql() -> str:
    """Cross-corpus MinHash oracle: the shared poly31 CTE chain with
    the pair condition switched from the self-join guard to the
    ref/new corpus split (ref = doc_id < 250, new = doc_id ≥ 250)."""
    return f"""
    WITH {_minhash_cand_ctes("a.doc_id < 250 AND bb.doc_id >= 250", pinned=True)}
    SELECT id_a AS ref_id, id_b AS new_id,
           ROUND(n_eq / 16.0, 6) AS est_jaccard
    FROM cand
    ORDER BY ref_id, new_id
    """


@register("dd_cross_corpus_candidates", oracle=_cross_corpus_oracle_sql())
def dd_cross_corpus_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus near-dedup (operators/dedup.py
    minhash_lsh_candidates_cross): which documents of a NEW corpus
    (doc_id ≥ 250) near-duplicate a REFERENCE corpus (doc_id < 250) —
    dedup a fresh crawl against the existing training set at the
    near-dup level, complementing pipe_decontaminate's exact-gram
    containment. Two independently-banded sides, band equi-join,
    est-Jaccard ≥ 0.75; the poly31 family gives DuckDB bit-parity.
    ``max_bucket=None`` pins the uncapped semantics the SQL twin
    models (see dd_minhash_candidates)."""
    from vectordb_light_spark.operators.dedup import (
        canonical_text,
        minhash_lsh_candidates_cross,
    )

    docs = load_docs(spark, sf_dir).where(F.length(canonical_text("text")) > 0)
    ref = docs.where(F.col("doc_id") < 250)
    new = docs.where(F.col("doc_id") >= 250)
    return (
        minhash_lsh_candidates_cross(
            new, ref, num_hashes=16, bands=4, hash_family="poly31",
            max_bucket=None,
        )
        .where(F.col("est_jaccard") >= 0.75)
        .select(
            "ref_id", "new_id", F.round("est_jaccard", 6).alias("est_jaccard")
        )
        .orderBy("ref_id", "new_id")
    )


def _simhash_oracle_sql() -> str:
    """SimHash oracle: 31-bit sketch by per-bit majority vote over the
    poly31 shingle hashes, then ALL-pairs Hamming ≤ 2 — equal to the
    engine's combo-blocked plan because pigeonhole (k ≤ m − h) makes
    blocking lossless and the Hamming verify is exact on both
    sides."""
    return f"""
    WITH {_shingle_hash_cte(4, pinned=True)},
    sk AS (
        SELECT doc_id,
               CAST(list_aggregate(list_transform(generate_series(0, 30),
                   j -> CASE WHEN 2 * CAST(list_aggregate(
                                 list_transform(hs, x -> (x // (1::BIGINT << j)) % 2),
                                 'sum') AS BIGINT) > len(hs)
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END), 'sum')
                    AS BIGINT) AS sim
        FROM h
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
    FROM sk a JOIN sk b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= 2
    ORDER BY id_a, id_b
    """


@register("dd_simhash_near_dups", oracle=_simhash_oracle_sql())
def dd_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 2), combo-block-keyed
    equi-join + exact Hamming verify. Runs the ``poly31`` oracle-twin
    sketch (DuckDB replays the bit votes exactly); blocking is the
    (m=4, k=2) combination scheme — output-invariant by pigeonhole
    (k ≤ m − h) + exact verify, but ~4× fewer candidates than
    single-block keys on this bit-biased templated corpus. The
    64-bit splitmix64 production sketch is the same plan with
    ``n_docs_hint`` widening the keys as the corpus grows.
    ``max_cluster=None`` pins the uncapped all-pairs clique the SQL
    twin models; the hot-cluster star collapse (production default)
    is unit- and scale-probe-tested, and graded SFs are asserted
    under the cap in tests/test_dedup.py."""
    from vectordb_light_spark.operators.dedup import canonical_text, simhash_near_dups

    docs = load_docs(spark, sf_dir).where(F.length(canonical_text("text")) > 0)
    # r12: ordered_once — the range sampling otherwise runs the combo
    # self-join + Hamming verify twice (two ~8 s-executor stages).
    # r13: the (m=4, k=2) scheme this docstring documents is passed
    # EXPLICITLY — the "auto" hint ran a df.count() per build, and on
    # this filtered input that count is a full canonicalization pass
    # (0.25 s at sf0.1; a corpus pass at 100 TB), for a scheme choice
    # that cannot differ below ~16·2^14 docs. Output is invariant to
    # the scheme by pigeonhole + exact verify either way; production
    # surfaces keep the adaptive hint.
    return ordered_once(
        simhash_near_dups(
            docs, max_hamming=2, hash_family="poly31", max_cluster=None,
            blocks=4, combo=2,
        ).withColumn("hamming", F.col("hamming").cast("int")),
        "id_a", "id_b",
    )


def _image_near_dup_oracle_sql() -> str:
    """DuckDB twin of dd_image_near_dups: the synthesized image is a
    pure integer formula of (source, doc_id), so the oracle recomputes
    every dHash grid cell (2×2 integer block sums over channel-summed
    pixels) and every bit from FIRST PRINCIPLES — never touching BMP
    bytes — then takes exact pairwise Hamming. A single mis-decoded
    pixel anywhere in the Spark encode→decode→hash chain flips a grid
    comparison and fails the hash (the mm_image_decode pattern,
    upgraded from a byte sum to the full perceptual hash)."""

    def cell(rexpr: str, cexpr: str) -> str:
        px = (
            "(((s+3)*((2*(%(r)s) + i//2)*17 + (2*(%(c)s) + i%%2)*23 + 11) + "
            "CASE WHEN 2*(%(r)s) + i//2 = nr AND 2*(%(c)s) + i%%2 = nc "
            "THEN nv ELSE 0 END) %% 256)"
        ) % {"r": rexpr, "c": cexpr}
        return f"list_sum(list_transform([0,1,2,3], i -> 3*{px}))"

    return f"""
    WITH d AS (
        SELECT doc_id,
               CASE WHEN regexp_matches(source, '^src[0-9]{{1,6}}$')
                    THEN CAST(substr(source, 4) AS INT)
                    ELSE CAST(CAST(('0x' || substr(md5(source), 1, 8))
                              AS BIGINT) % 1000 AS INT)
               END AS s,
               CAST(doc_id % 16 AS INT) AS nr, CAST(doc_id % 18 AS INT) AS nc,
               CAST(doc_id % 97 AS INT) AS nv
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_transform(generate_series(0, 63), b ->
                   CASE WHEN {cell('b//8', 'b%8')} > {cell('b//8', 'b%8 + 1')}
                   THEN 1 ELSE 0 END) AS bits
        FROM d
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_filter(generate_series(1, 64),
                   i -> a.bits[i] <> b.bits[i])) AS INT) AS hamming
        FROM g a JOIN g b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, hamming FROM p WHERE hamming <= 6
    ORDER BY id_a, id_b
    """


@register("dd_image_near_dups", oracle=_image_near_dup_oracle_sql())
def dd_image_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image-hash near-dedup — the image-modality dedup
    tier: each document synthesizes a deterministic 18×16 grayscale
    BMP (an integer formula of source + doc_id: same-source images
    share a base pattern, one doc-specific noisy pixel each), the
    REAL stdlib decoder + 64-bit dHash fingerprint it
    (operators/multimodal.py image_dhash), and candidate pairs come
    from the SAME combo-blocked pigeonhole-guaranteed Hamming join as
    SimHash text dedup (operators/dedup.py hamming_near_dup_pairs) —
    one hardened blocking implementation across modalities. Same-
    source pairs land at Hamming ≤ 4 (the noise pixel flips ≤ 2 grid
    comparisons per doc), cross-source pairs average ~30.
    ``max_cluster=None`` pins exact clique semantics for the SQL
    twin; the hot-cluster star collapse (production default) is
    unit-tested for identical-image clusters. 100 TB shape: synth +
    encode + decode + hash are ONE map-side Arrow stage over the
    scan (r13, guide §4: the r12 form ran TWO MapInPandas stages —
    synth→BMP, then decode→dHash — shipping every ~900-byte BMP
    JVM→Python→JVM→Python for nothing; the fused stage runs the SAME
    stdlib bmp_encode → decode_image → dHash byte path per image,
    including image_dhash's md5 fallback for undecodable bytes, and
    emits only (media_id, dhash) — the binary column never crosses
    the Arrow boundary at all); the join shuffles C(8,2)=28 16-bit
    combo keys × ~16 bytes per image — never pixels, never pairs
    outside the Hamming band."""
    from collections.abc import Iterator as _Iter

    import numpy as _np
    import pandas as _pd

    from vectordb_light_spark.operators.dedup import hamming_near_dup_pairs

    docs = load_docs(spark, sf_dir, "doc_id", "source")

    def build_hash(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        import hashlib as _hl

        from vectordb_light_spark.operators.multimodal import _dhash_bits
        from vectordb_light_spark.sources.media import (
            bmp_encode,
            decode_image,
        )

        R = _np.arange(16)[:, None]
        C = _np.arange(18)[None, :]

        for pdf in batches:
            ids, hashes = [], []
            for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
                # srcNN parses directly; any other source label gets a
                # deterministic md5-derived pattern id instead of a
                # ValueError killing the whole job (r9 adversarial
                # corpus catch; rule-6 error-path carve-out — the
                # graded corpus always parses). The oracle spells the
                # SAME rule (regexp ^src[0-9]{1,6}$, md5 fallback).
                src = str(source)
                if (
                    src.startswith("src")
                    and 3 < len(src) <= 9
                    and all(c in "0123456789" for c in src[3:])
                ):
                    s = int(src[3:])
                else:
                    s = (
                        int(_hl.md5(src.encode("utf-8")).hexdigest()[:8], 16)
                        % 1000
                    )
                did = int(doc_id)
                px = ((s + 3) * (R * 17 + C * 23 + 11)) % 256
                nr, nc, nv = did % 16, did % 18, did % 97
                px[nr, nc] = ((s + 3) * (nr * 17 + nc * 23 + 11) + nv) % 256
                # The REAL codec round trip, unchanged from the
                # two-stage form: stdlib BMP encode, stdlib decode,
                # dHash — with image_dhash's exact fallback rule.
                raw = bmp_encode(px.astype(_np.uint8))
                dec = decode_image(raw)
                if dec is not None:
                    h = _dhash_bits(dec)
                else:  # pragma: no cover - our own BMPs always decode
                    h = int.from_bytes(
                        _hl.md5(raw).digest()[:8], "big", signed=True
                    )
                ids.append(did)
                hashes.append(h)
            yield _pd.DataFrame({"__id": ids, "__sim": hashes})

    hashed = docs.mapInPandas(build_hash, schema="__id long, __sim long")
    # r12: ordered_once — the range sampling otherwise runs the combo
    # self-join + Hamming verify twice (measured: two ~8-10 s-executor
    # stages of identical shape inside one run).
    return ordered_once(
        hamming_near_dup_pairs(
            hashed, total_bits=64, max_hamming=6, max_cluster=None
        ),
        "id_a", "id_b",
    )


@register(
    "dd_remove_boilerplate",
    oracle="""
    WITH p AS (
        SELECT doc_id, s.i AS pos, string_split(text, ' ')[s.i] AS w
        FROM documents,
             UNNEST(generate_series(1, len(string_split(text, ' ')))) AS s(i)
    ),
    hot AS (
        SELECT w FROM p WHERE trim(w, ' ') <> ''
        GROUP BY w HAVING COUNT(DISTINCT doc_id) >= 390
    ),
    kept AS (
        SELECT doc_id, pos, w FROM p WHERE w NOT IN (SELECT w FROM hot)
    ),
    r AS (
        SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS text
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(r.text, '') AS text
    FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
    ORDER BY d.doc_id
    """,
)
def dd_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate removal (CCNet-style repeated-segment
    filter): split each document on the separator, count DISTINCT
    documents per segment, strip segments above the repetition bar,
    rebuild in original order. The synthetic corpus has single-line
    documents, so the registry entry runs at word granularity
    (sep=' ', bar=390 of 500 docs) — same operator, same plan: the
    frequency shuffle keys on a 64-bit segment hash, the join back is
    broadcast-able, rebuild preserves positions via posexplode."""
    from vectordb_light_spark.operators.dedup import remove_boilerplate

    docs = load_docs(spark, sf_dir)
    return remove_boilerplate(
        docs.select("doc_id", "text"), sep=" ", min_docs=390
    ).orderBy("doc_id")


@register(
    "dd_line_dedup",
    oracle="""
    WITH p AS (
        SELECT doc_id, s.i AS pos, string_split(text, ' ')[s.i] AS w
        FROM documents,
             UNNEST(generate_series(1, len(string_split(text, ' ')))) AS s(i)
    ),
    f AS (
        SELECT w, MIN(doc_id * 1000000 + pos) AS k
        FROM p WHERE trim(w, ' ') <> '' GROUP BY w
    ),
    kept AS (
        SELECT p.doc_id, p.pos, p.w
        FROM p LEFT JOIN f ON p.w = f.w
        WHERE trim(p.w, ' ') = '' OR p.doc_id * 1000000 + p.pos = f.k
    ),
    r AS (
        SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS text
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(r.text, '') AS text
    FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
    ORDER BY d.doc_id
    """,
)
def dd_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first exact segment dedup (the RefinedWeb / MassiveText
    line-dedup tier, operators/dedup.py dedup_lines_keep_first): every
    distinct non-blank segment survives ONLY at its globally first
    occurrence by (doc_id, position) — all later copies vanish
    corpus-wide, including within-document repeats. The complement of
    dd_remove_boilerplate (which drops ALL copies of hot segments):
    here exactly one canonical copy remains. Single-line synthetic
    corpus ⇒ word granularity (sep=' '), same operator, same plan:
    survivor election is min(struct(doc_id,pos)) grouped on the 64-bit
    segment hash — a map-side-combinable shuffle of fixed-width
    triples, never text — then an equi-join back and a positional
    rebuild. The SQL twin replays the election as MIN(doc_id·10⁶+pos)
    per segment, the identical ordering."""
    from vectordb_light_spark.operators.dedup import dedup_lines_keep_first

    docs = load_docs(spark, sf_dir)
    return dedup_lines_keep_first(
        docs.select("doc_id", "text"), sep=" "
    ).orderBy("doc_id")


# Exact-substring dedup entries (r5): the synthetic corpus carries a
# few natural cross-doc duplicates, and the entries inject two fixed
# blurbs — a 30-token "license" appended to doc_id % 5 == 0 and a
# 10-token "newsletter" line prepended to doc_id % 7 == 0 — so the
# miner sees spans above AND below the 16-token bar. The SQL twin
# replays the same injection and the same algorithm, so every output
# is data-driven (no pinned expectations).
_BLURB_A = (
    "this corpus is released under the creative commons attribution "
    "license please retain this notice when redistributing copies and "
    "cite the original collection maintainers in all derivative works "
    "thank you"
)
_BLURB_B = "subscribe to our weekly newsletter for updates and exclusive offers"

_SPAN_MINE_CTES = r"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN 'subscribe to our weekly newsletter for updates and exclusive offers '
                  ELSE '' END
             || text ||
             CASE WHEN doc_id % 5 = 0
                  THEN ' this corpus is released under the creative commons attribution license please retain this notice when redistributing copies and cite the original collection maintainers in all derivative works thank you'
                  ELSE '' END AS text
      FROM documents
    ),
    tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+') AS toks
      FROM base
    ),
    g0 AS (
      SELECT doc_id,
             UNNEST(list_transform(generate_series(1, len(toks) - 7),
                    i -> {'pos': i - 1,
                          'gk': md5(array_to_string(toks[i:i+7], ' '))})) AS a
      FROM tok WHERE len(toks) >= 8
    ),
    g AS (SELECT doc_id, a.pos AS pos, a.gk AS gk FROM g0),
    hot AS (SELECT gk FROM g GROUP BY gk HAVING count(DISTINCT doc_id) >= 2),
    cov AS (SELECT doc_id, pos AS s, pos + 8 AS e FROM g
            WHERE gk IN (SELECT gk FROM hot)),
    ord AS (
      SELECT doc_id, s, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pme
      FROM cov
    ),
    isl AS (
      SELECT doc_id, s, e,
             sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s) AS island
      FROM ord
    ),
    spans AS (
      SELECT doc_id, min(s) AS ss, max(e) AS se
      FROM isl GROUP BY doc_id, island
      HAVING max(e) - min(s) >= 16
    )
"""


def _docs_with_blurbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir, "doc_id", "text")
    return docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 7 == 0, F.lit(_BLURB_B + " ")).otherwise(
                F.lit("")
            ),
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" " + _BLURB_A)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )


@register(
    "dd_repeated_spans",
    oracle=_SPAN_MINE_CTES
    + """
    SELECT doc_id, CAST(ss AS INT) AS span_start,
           CAST(se AS INT) AS span_end,
           CAST(se - ss AS INT) AS span_tokens
    FROM spans
    ORDER BY doc_id, span_start
    """,
)
def dd_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact-substring mining (dedup.py repeated_spans):
    the Lee et al. 2022 dedup tier — maximal token spans repeated
    across >= 2 distinct documents, anchored on sliding token 8-gram
    md5 keys, merged per doc via gaps-and-islands, reported above a
    16-token bar. Catches a quote duplicated MID-paragraph that no
    paragraph hash (dd_remove_boilerplate) or doc-level Jaccard tier
    sees. Linear everywhere: hot-anchor detection is a count-style
    groupBy on 128-bit keys, the anchor join emits at most one row
    per gram occurrence (never pairs), and the merge window is
    per-document."""
    from vectordb_light_spark.operators.dedup import repeated_spans

    return repeated_spans(
        _docs_with_blurbs(spark, sf_dir),
        anchor=8,
        min_docs=2,
        min_span_tokens=16,
    ).orderBy("doc_id", "span_start")


@register(
    "dd_strip_repeated_spans",
    oracle=_SPAN_MINE_CTES
    + r"""
    ,
    tokp0 AS (
      SELECT doc_id, string_split_regex(trim(text, ' '), '[ \t\n\x0B\f\r]+') AS rtoks FROM base
    ),
    tokp AS (
      SELECT doc_id,
             UNNEST(list_transform(generate_series(1, len(rtoks)),
                    i -> {'pos': i - 1, 'tok': rtoks[i]})) AS a
      FROM tokp0
    ),
    tokf AS (SELECT doc_id, a.pos AS pos, a.tok AS tok FROM tokp),
    keptt AS (
      SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS text
      FROM tokf t
      WHERE NOT EXISTS (SELECT 1 FROM spans s
                        WHERE s.doc_id = t.doc_id
                          AND t.pos >= s.ss AND t.pos < s.se)
      GROUP BY t.doc_id
    ),
    rem AS (
      SELECT doc_id, CAST(sum(se - ss) AS INT) AS removed_tokens
      FROM spans GROUP BY doc_id
    )
    SELECT b.doc_id,
           COALESCE(rem.removed_tokens, 0) AS removed_tokens,
           md5(COALESCE(keptt.text, '')) AS kept_md5
    FROM base b
    LEFT JOIN rem ON b.doc_id = rem.doc_id
    LEFT JOIN keptt ON b.doc_id = keptt.doc_id
    ORDER BY b.doc_id
    """,
)
def dd_strip_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring REMOVAL (dedup.py remove_repeated_spans): strip
    every occurrence of the mined repeated regions from every document
    — the Lee et al. 2022 released tool's remove-all-copies policy —
    and rebuild the text from kept tokens (single-space joined, case
    preserved). Output is the md5 of each rebuilt document plus the
    removed-token count, for all docs; a single mis-kept token
    anywhere flips a hash. The rebuild is one higher-order filter
    over the token array (no UDF), and the span list joins back 1:1
    on doc_id."""
    from vectordb_light_spark.operators.dedup import remove_repeated_spans

    out = remove_repeated_spans(
        _docs_with_blurbs(spark, sf_dir),
        anchor=8,
        min_docs=2,
        min_span_tokens=16,
    )
    # NOT ordered_once (r12 measured negative, 1.72 vs 1.67 s
    # interleaved): the span mining rides exchanges below this point,
    # so the sort's sampling pass only re-runs a cheap tail — the
    # checkpoint materialization costs more than it saves.
    return out.select(
        "doc_id",
        "removed_tokens",
        F.md5("text").alias("kept_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Similarity search at scale (ANN; beyond-reference north star)
# ---------------------------------------------------------------------------


@register(
    "sim_cosine_pairs_exact",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                 b.embedding::DOUBLE[]) >= 0.35
    ORDER BY id_a, id_b
    """,
)
def sim_cosine_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs cosine ≥ 0.35 — the verification tier of the
    similarity-join stack (run within LSH buckets at scale)."""
    from vectordb_light_spark.operators.similarity import cosine_pairs_exact

    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_pairs_exact(emb, threshold=0.35, assume_normalized=False)
    return (
        out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


#: Pool-membership contract oracle for the approximate tiers: the
#: tier's top-10 must sit inside the EXACT top-100 (measured worst
#: exact-rank across tiers and test SFs is 49 — a 2× margin). The
#: trained index itself has no SQL twin (iterative numpy), so the
#: oracle pins the CONTRACT values: 10 ranks, every one in-pool. A
#: tier regression (short results, or a result drifting out of the
#: exact pool) flips a value and fails the driver hash — a bounded
#: hard check instead of the old rows-only row.
_ANN_POOL_ORACLE = """
    SELECT CAST(x AS INT) AS rank, CAST(1 AS INT) AS in_exact_top100
    FROM range(1, 11) t(x) ORDER BY rank
    """


def _ann_pool_contract(
    spark: SparkSession, sf_dir: str, out: DataFrame, *, qid: int = 0, pool: int = 100
) -> DataFrame:
    """(rank, in_exact_top100) for a tier's top-k output — the
    driver-checkable form of "the approximate pool is a subset of the
    exact pool". One extra exact scan (top-``pool``) per query; the
    tier's own plan is unchanged underneath."""
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine

    q = _query_vector(spark, sf_dir, qid)
    emb = load_table(spark, sf_dir, "embeddings")
    exact = topk_cosine(
        emb, q, SearchParams(k=pool, threshold=-2.0),
        id_col="vec_id", vec_col="embedding",
    ).select("vec_id", F.lit(1).alias("__in"))
    w = Window.orderBy(F.col("similarity_score").desc(), "vec_id")
    return (
        out.select("vec_id", "similarity_score")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .join(exact, "vec_id", "left")
        .select(
            "rank",
            F.coalesce(F.col("__in"), F.lit(0)).cast("int").alias("in_exact_top100"),
        )
        .orderBy("rank")
    )


@register("ann_srp_topk", oracle=_ANN_POOL_ORACLE)
def ann_srp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-k: Hamming-ball candidate prefilter on
    a 16-bit sign signature (bit_count(xor) scan, no vector math),
    exact cosine rank within candidates. Seeded-Gaussian planes have
    no SQL twin, so the driver checks the pool-membership contract
    (worst measured exact-rank 17); full recall curves live in
    tests/test_similarity.py and ANN_EVAL.md."""
    from vectordb_light_spark.operators.similarity import add_srp_signature, ann_topk_srp

    q = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    indexed = add_srp_signature(emb, n_planes=16)
    out = ann_topk_srp(indexed, q, k=10, probe_hamming=6, n_planes=16)
    return _ann_pool_contract(spark, sf_dir, out)


@register("ann_ivf_topk", oracle=_ANN_POOL_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: spherical k-means centroids (Lloyd
    iterations as Spark aggregations), nprobe-pruned cluster scan,
    exact rank within probes. With cluster-partitioned storage each
    probe is a partition-pruned read. Iterative training has no SQL
    twin, so the driver checks the pool-membership contract (worst
    measured exact-rank 10 — the probes recover the exact top-10 at
    the contract SFs)."""
    from vectordb_light_spark.operators.similarity import (
        add_ivf_cluster,
        ann_topk_ivf,
        train_ivf_centroids,
    )

    from vectordb_light_spark.session import persist_if_batch

    q = _query_vector(spark, sf_dir)
    # persist: Lloyd iterations rescan the table once per assign step.
    # r13: routed through persist_if_batch so the per-build release
    # drops it — a bare .cache() of the BASE table survived across
    # runs (cross-run caching of the scan, which the bench forbids).
    emb = persist_if_batch(load_table(spark, sf_dir, "embeddings"))
    cents = train_ivf_centroids(emb, n_centroids=8, n_iters=3)
    indexed = add_ivf_cluster(emb, cents)
    out = ann_topk_ivf(indexed, cents, q, k=10, nprobe=4)
    return _ann_pool_contract(spark, sf_dir, out)


#: Per-left pool-membership contract for the LSH top-k join: all 50
#: lefts × 5 ranks, each result inside its left's EXACT top-50
#: (measured worst exact-rank 8 across the test SFs — a 6× margin).
_ANN_JOIN_POOL_ORACLE = """
    SELECT CAST(l.x AS BIGINT) AS l_id, CAST(r.x AS INT) AS rank,
           CAST(1 AS INT) AS in_exact_top50
    FROM range(0, 50) l(x), range(1, 6) r(x)
    ORDER BY l_id, rank
    """


@register("ann_topk_join", oracle=_ANN_JOIN_POOL_ORACLE)
def ann_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large×large approximate top-k similarity JOIN: every left
    vector gets its ≤5 most-similar right vectors via SRP band
    equi-join + exact verify + per-left window rank — the tier past
    broadcastable queries (neither side collected). The seeded SRP
    planes have no SQL twin, so the driver checks the per-left
    pool-membership contract (each result inside its left's exact
    top-50; worst measured exact-rank 8); recall vs the exact batch
    join is asserted in tests/test_similarity.py."""
    from vectordb_light_spark.operators.search import topk_cosine_batch
    from vectordb_light_spark.operators.similarity import ann_topk_join_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    left = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("l_id"), F.col("embedding").alias("l_vec")
    )
    right = emb.select(
        F.col("vec_id").alias("r_id"), F.col("embedding").alias("r_vec")
    )
    # left is `vec_id < 50` — ≤50 rows, far under max_left_bucket, so
    # the left_rows hint skips the hot-key probe and its driver jobs
    # (the skew machinery stays armed for unhinted large lefts).
    out = ann_topk_join_lsh(left, right, k=5, bands=16, left_rows=50)
    exact_pool = topk_cosine_batch(
        emb,
        left.select(
            F.col("l_id").alias("query_id"), F.col("l_vec").alias("query_vec")
        ),
        k=50,
        threshold=-1.0,
        id_col="vec_id",
        vec_col="embedding",
        assume_normalized=False,
    ).select(
        F.col("query_id").alias("l_id"),
        F.col("vec_id").alias("r_id"),
        F.lit(1).alias("__in"),
    )
    return (
        out.join(exact_pool, ["l_id", "r_id"], "left")
        .select(
            "l_id",
            "rank",
            F.coalesce(F.col("__in"), F.lit(0)).cast("int").alias("in_exact_top50"),
        )
        .orderBy("l_id", "rank")
    )


def _embedding_near_dup_oracle_sql() -> str:
    """DuckDB twin of dd_embedding_near_dups: same md5 feature-hash
    embedding (integer bucket weights → exact cross-engine doubles, the
    emb_feature_hash_topk trick), pairwise cosine via a bucket
    inverted-index join. Verified margins on the driver corpus: kept
    pairs sit ≥1.4e-2 from the 0.95 threshold and ≥5e-9 from any 1e-6
    rounding boundary, far above the ~1e-15 engine float drift."""
    return r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+')) AS t
        FROM documents
    ),
    w AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 64 AS bucket,
               CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(t), 9, 1)) AS BIGINT)
                             % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS weight
        FROM tok WHERE t <> '' GROUP BY doc_id, bucket
    ),
    w2 AS (SELECT * FROM w WHERE weight != 0),
    norms AS (
        SELECT doc_id, sqrt(CAST(SUM(weight * weight) AS BIGINT)) AS dnorm
        FROM w2 GROUP BY doc_id
    ),
    dots AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib,
               CAST(SUM(a.weight * b.weight) AS BIGINT) AS dot
        FROM w2 a JOIN w2 b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        GROUP BY ia, ib
    ),
    pairs AS (
        SELECT ia, ib, dot / (na.dnorm * nb.dnorm) AS c
        FROM dots
        JOIN norms na ON dots.ia = na.doc_id
        JOIN norms nb ON dots.ib = nb.doc_id
    )
    SELECT ia AS id_a, ib AS id_b, ROUND(c, 6) AS cosine
    FROM pairs WHERE c >= 0.95
    ORDER BY id_a, id_b
    """


def _semantic_dedup_oracle_sql() -> str:
    """DuckDB twin of dd_semantic_dedup: the dd_embedding_near_dups
    pair CTEs (exact integer feature-hash cosine) feed the
    dd_duplicate_clusters recursive transitive closure, then a
    full-coverage left join gives every document its singleton/
    cluster keep decision — the two proven oracles composed."""
    return r"""
    WITH RECURSIVE tok AS (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+')) AS t
        FROM documents
    ),
    w AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 64 AS bucket,
               CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(t), 9, 1)) AS BIGINT)
                             % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS weight
        FROM tok WHERE t <> '' GROUP BY doc_id, bucket
    ),
    w2 AS (SELECT * FROM w WHERE weight != 0),
    norms AS (
        SELECT doc_id, sqrt(CAST(SUM(weight * weight) AS BIGINT)) AS dnorm
        FROM w2 GROUP BY doc_id
    ),
    dots AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib,
               CAST(SUM(a.weight * b.weight) AS BIGINT) AS dot
        FROM w2 a JOIN w2 b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        GROUP BY ia, ib
    ),
    cand AS MATERIALIZED (
        SELECT ia, ib
        FROM dots
        JOIN norms na ON dots.ia = na.doc_id
        JOIN norms nb ON dots.ib = nb.doc_id
        WHERE dot / (na.dnorm * nb.dnorm) >= 0.95
    ),
    edges AS MATERIALIZED (
        SELECT ia AS a, ib AS b FROM cand
        UNION
        SELECT ib AS a, ia AS b FROM cand
    ),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        FROM reach GROUP BY a
    ),
    sized AS (
        SELECT doc_id, cluster_id,
               COUNT(*) OVER (PARTITION BY cluster_id) AS cs,
               doc_id = MIN(doc_id) OVER (PARTITION BY cluster_id) AS kp
        FROM comp
    )
    SELECT d.doc_id,
           COALESCE(s.cluster_id, d.doc_id) AS cluster_id,
           CAST(COALESCE(s.cs, 1) AS BIGINT) AS cluster_size,
           CAST(COALESCE(s.kp, TRUE) AS INT) AS keep
    FROM documents d LEFT JOIN sized s ON d.doc_id = s.doc_id
    ORDER BY d.doc_id
    """


@register("dd_semantic_dedup", oracle=_semantic_dedup_oracle_sql())
def dd_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 —
    operators/similarity.py semantic_dedup): embedding-cosine ≥ 0.95
    near-dup pairs over the exact feature-hash embeddings (the
    dd_embedding_near_dups tier), min-label transitive clusters, and
    a keep-one-per-cluster decision for EVERY document — unpaired
    docs are singleton keepers, each cluster's min-id doc survives.
    Filter ``keep`` for the deduplicated corpus. The oracle composes
    the two proven SQL twins (integer-cosine pairs + recursive
    transitive closure) with a full-coverage join."""
    from vectordb_light_spark.functions.embedding import feature_hash_weights
    from vectordb_light_spark.operators.similarity import semantic_dedup

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    w2 = feature_hash_weights(docs, dim=64)
    dense = (
        w2.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket").cast("int"), F.col("weight")))
            ).alias("m")
        )
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(0, 63),"
                " b -> cast(coalesce(m[cast(b AS int)], 0) AS double))"
            ).alias("vector"),
        )
    )
    # docs with zero usable tokens never reach the dense table; the
    # full-coverage join below restores them as singleton keepers,
    # mirroring the oracle's LEFT JOIN over documents
    out = semantic_dedup(
        docs.select("doc_id").join(dense, "doc_id", "left").select(
            "doc_id",
            F.coalesce(
                "vector", F.expr("array_repeat(cast(0.0 as double), 64)")
            ).alias("vector"),
        ),
        id_col="doc_id",
        vec_col="vector",
        threshold=0.95,
        tier="exact",
        # pointer_jumping deliberately OFF: the r10 A/B on THIS
        # entry's embedding pair graph (tiny 0.95-threshold cliques,
        # few plain rounds) measured jumping as a wash-to-slower
        # (3.8/3.2 s plain vs 3.8/4.0 s jump, warm) — unlike the
        # 12-round minhash graph where it wins 1.6x (SCALING.md
        # 'pointer jumping'; pipe_leakage_safe_split keeps the flip).
        assume_normalized=False,
    )
    return (
        out.withColumn("keep", F.col("keep").cast("int"))
        .orderBy("doc_id")
    )


@register("dd_embedding_near_dups", oracle=_embedding_near_dup_oracle_sql())
def dd_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ≥ 0.95 over feature-hash
    document embeddings, via the broadcast block-matmul exact tier
    (exact recall; one BLAS pass per partition; scales to ~10M vectors
    per 5 GB of executor broadcast budget). The embedder is the
    zero-Python feature-hash tier (functions/embedding.py
    feature_hash_weights): integer bucket weights densified to a
    64-dim vector JVM-side, which uniquely gives this entry an exact
    DuckDB oracle. Beyond broadcast reach the LSH tiers take over —
    embedding_near_dup_pairs (pigeonhole Hamming guarantee) and
    embedding_near_dup_pairs_banded (S-curve banding), both
    recall-tested in tests/test_similarity.py; auto-tier dispatch in
    operators/similarity.py picks by a count estimate."""
    from vectordb_light_spark.functions.embedding import feature_hash_weights
    from vectordb_light_spark.operators.similarity import cosine_pairs_exact

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    w2 = feature_hash_weights(docs, dim=64)
    dense = (
        w2.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket").cast("int"), F.col("weight")))
            ).alias("m")
        )
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(0, 63),"
                " b -> cast(coalesce(m[cast(b AS int)], 0) AS double))"
            ).alias("vector"),
        )
    )
    out = cosine_pairs_exact(
        dense,
        id_col="doc_id",
        vec_col="vector",
        threshold=0.95,
        assume_normalized=False,
    )
    return out.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


@register(
    "pipe_training_corpus",
    oracle=r"""
    WITH scored AS (
        SELECT doc_id, lang, text,
               least(length(text) / 500.0, 1.0) * 0.4
               + (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
                        ELSE len(regexp_extract_all(text, '[^\w \t\n\x0B\f\r]'))::DOUBLE
                             / length(text) END) <= 0.2
                  THEN 1.0 ELSE 0.5 END) * 0.3
               + (CASE WHEN (CASE
                        WHEN len(regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+')) = 0
                        THEN 0.0
                        ELSE len(list_filter(
                            regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+'),
                            x -> list_contains(
                                ['the','a','an','and','or','of','to','in','is','it',
                                 'that','for','on','with','as','was','at','by','be'],
                                regexp_replace(x, '[^\w]', '', 'g'))))::DOUBLE
                             / len(regexp_split_to_array(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+'))
                        END) >= 0.05
                  THEN 1.0 ELSE 0.5 END) * 0.3 AS quality
        FROM documents
    ),
    gated AS (SELECT * FROM scored WHERE quality >= 0.5),
    keyed AS (
        SELECT *, sha256(lower(trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g'), ' '))) AS k
        FROM gated
    ),
    winners AS (SELECT k, MIN(doc_id) AS doc_id FROM keyed GROUP BY k)
    SELECT keyed.doc_id AS doc_id, lang, ROUND(quality, 6) AS quality
    FROM keyed JOIN winners
      ON keyed.k = winners.k AND keyed.doc_id = winners.doc_id
    ORDER BY keyed.doc_id
    """,
)
def pipe_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition: the training-data curation pipeline
    (quality gate ≥ 0.5 → exact dedup, min-id survivor) as ONE
    Catalyst plan — predicates run in the scan stage, the dedup
    shuffle carries a 64-bit key. Near-dup tier disabled here so the
    whole pipeline stays ANSI-SQL-mirrorable for the oracle; the LSH
    tier is oracle-checked separately (dd_jaccard_pairs)."""
    from vectordb_light_spark.plans.pipelines import training_corpus_plan

    from vectordb_light_spark.session import pushdown_barrier

    # r13: keep the quality gate ABOVE the rebalance exchange (it was
    # pushed into the single-split scan task — two 0.25 s 1-task jobs;
    # interleaved A/B barrier 0.58 s vs pushed 1.15 s).
    docs = pushdown_barrier(load_docs(spark, sf_dir, "doc_id", "lang", "text"))
    out = training_corpus_plan(
        docs, min_quality=0.5, languages=None, near_dup_threshold=None
    )
    return out.select(
        "doc_id", "lang", F.round("quality", 6).alias("quality")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Multimodal columns (beyond-reference; decode stubbed, plumbing real)
# ---------------------------------------------------------------------------


@register(
    "mm_frame_counts",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(greatest((length(text) * 10) // 500, 1) AS INT) AS n_frames,
           CAST((greatest((length(text) * 10) // 500, 1) - 1) * 500 AS INT)
               AS last_frame_ts_ms
    FROM documents
    ORDER BY media_id
    """,
)
def mm_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: media rows exploded to one row
    per sampled frame (500 ms cadence); per-media frame count and last
    frame timestamp. ``with_bytes=False``: counting frames must not
    pay the per-frame byte stage — the plan is pure codegen and
    column pruning drops the binary content from the scan."""
    from vectordb_light_spark.operators.multimodal import (
        media_from_documents,
        sample_frames,
    )

    media = media_from_documents(spark, sf_dir, kind="video")
    frames = sample_frames(media, every_ms=500, with_bytes=False)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_frames"),
            F.max("frame_ts_ms").cast("int").alias("last_frame_ts_ms"),
        )
        .orderBy("media_id")
    )


@register(
    "mm_image_decode",
    oracle=r"""
    WITH s AS (
        SELECT doc_id AS media_id,
               substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 1024) AS a
        FROM documents WHERE doc_id < 200
    )
    SELECT media_id,
           CAST(16 AS INT) AS width,
           CAST(greatest(CAST(ceil(length(a) / 16.0) AS BIGINT), 1) AS INT)
               AS height,
           CAST(3 AS INT) AS channels,
           CAST(3 * COALESCE(list_aggregate(
                   list_transform(generate_series(1, length(a)),
                                  i -> ord(substr(a, i, 1))), 'sum'),
               0) AS BIGINT) AS px_sum
    FROM s
    ORDER BY media_id
    """,
)
def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, driver-verified bit-for-bit: each document's
    printable-ASCII bytes (≤1024) become a 16-wide grayscale→RGB BMP
    via ``sources/media.bmp_encode`` (zero-padded last row), the
    stage chain decodes it back with the pure-stdlib BMP parser
    (operators/multimodal.decode_images), and the oracle recomputes
    width/height/px byte-sum from the SAME text with independent SQL
    byte math — a decode error of a single pixel anywhere in the 200
    images flips px_sum and fails the hash. px_sum is recovered as
    round(px_mean·W·H·C): the mean is an exact double rational (sums
    ≤ 255·1024·3 ≪ 2⁵³), so the round-trip is exact."""
    from collections.abc import Iterator as _Iter

    import numpy as _np
    import pandas as _pd

    from vectordb_light_spark.operators.multimodal import decode_images
    from vectordb_light_spark.sources.media import bmp_encode

    docs = load_docs(spark, sf_dir, "doc_id", "text").where(F.col("doc_id") < 200)

    def build(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for media_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = "".join(
                    c for c in (text or "") if " " <= c <= "~"
                ).encode("ascii")[:1024]
                h = max(-(-len(raw) // 16), 1)
                buf = _np.zeros(h * 16, dtype=_np.uint8)
                buf[: len(raw)] = _np.frombuffer(raw, dtype=_np.uint8)
                out_rows.append((int(media_id), bmp_encode(buf.reshape(h, 16))))
            yield _pd.DataFrame(out_rows, columns=["media_id", "content"])

    media = docs.mapInPandas(build, schema="media_id long, content binary")
    decoded = decode_images(media)
    # r12: ordered_once — the range sampling otherwise re-runs the
    # BMP/PNG build + decode Python chain twice.
    return ordered_once(
        decoded.select(
            "media_id",
            "width",
            "height",
            "channels",
            F.round(
                F.col("px_mean")
                * F.col("width")
                * F.col("height")
                * F.col("channels")
            )
            .cast("long")
            .alias("px_sum"),
        ),
        "media_id",
    )


@register(
    "mm_jpeg_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(24 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST((doc_id * 7) % 256 AS INT) AS r,
           CAST((doc_id * 13) % 256 AS INT) AS g,
           CAST((doc_id * 29) % 256 AS INT) AS b,
           CAST(1 AS INT) AS within_tol
    FROM documents WHERE doc_id < 200
    ORDER BY media_id
    """,
)
def mm_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode under a bounded contract (r4 — the
    codec is sources/media.py jpeg_encode/jpeg_decode, written from
    ITU-T T.81): each doc id becomes a constant-color 24x16 RGB image
    encoded as 4:2:0 JFIF WITH a restart interval (the full decoder
    path: marker parse, stream-defined Huffman/quant tables, MCU
    entropy decode across RST boundaries, dequant+IDCT, chroma
    upsample, YCbCr→RGB), decoded back by the stage chain
    (multimodal.decode_images real tier). JPEG is lossy, so instead
    of a bit-exact px_sum the oracle pins the geometry plus a
    within_tol flag: the decoded mean must sit within 3/255 of the
    encoded constant — a constant image survives quantization to
    within half a DC quant step per channel (measured ≤1.2 at q90,
    2.5x margin, tests/test_multimodal.py)."""
    from collections.abc import Iterator as _Iter

    import numpy as _np
    import pandas as _pd

    from vectordb_light_spark.operators.multimodal import decode_images
    from vectordb_light_spark.sources.media import jpeg_encode

    docs = load_docs(spark, sf_dir, "doc_id").where(F.col("doc_id") < 200)

    def build(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id in pdf["doc_id"]:
                i = int(media_id)
                rgb = (i * 7 % 256, i * 13 % 256, i * 29 % 256)
                img = _np.tile(
                    _np.array(rgb, dtype=_np.uint8)[None, None, :], (16, 24, 1)
                )
                rows.append(
                    (
                        i,
                        jpeg_encode(
                            img, quality=90, subsampling="420",
                            restart_interval=2,
                        ),
                        float(sum(rgb)) / 3.0,
                    )
                )
            yield _pd.DataFrame(rows, columns=["media_id", "content", "want"])

    media = docs.mapInPandas(
        build, schema="media_id long, content binary, want double"
    )
    decoded = decode_images(media)
    # r12: ordered_once — the range sampling otherwise re-runs the
    # JPEG encode + full decode Python chain twice.
    return ordered_once(
        decoded.select(
            "media_id",
            "width",
            "height",
            "channels",
            ((F.col("media_id") * 7) % 256).cast("int").alias("r"),
            ((F.col("media_id") * 13) % 256).cast("int").alias("g"),
            ((F.col("media_id") * 29) % 256).cast("int").alias("b"),
            (F.abs(F.col("px_mean") - F.col("want")) <= 3.0)
            .cast("int")
            .alias("within_tol"),
        ),
        "media_id",
    )


@register(
    "mm_video_frames",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(fi AS INT) AS frame_index,
           CAST(fi * 500 AS INT) AS frame_ts_ms,
           CAST(24 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST((doc_id * 7 + fi * 31) % 256 AS INT) AS r,
           CAST((doc_id * 13 + fi * 17) % 256 AS INT) AS g,
           CAST((doc_id * 29 + fi * 11) % 256 AS INT) AS b,
           CAST(1 AS INT) AS within_tol
    FROM documents CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS fi)
    WHERE doc_id < 100
    ORDER BY media_id, frame_index
    """,
)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame extraction under a bounded contract (r4): each
    doc id becomes a 4-frame 2 fps MJPEG-AVI (sources/media.py
    avi_encode over per-frame constant-color JPEGs), sample_frames
    walks the RIFF container and returns the stored JPEG stream
    nearest each 500 ms timestamp (operators/multimodal.py real tier
    — no re-encode), and decode_images decodes those frame bytes with
    the pure-Python baseline-JPEG codec. The oracle pins the sampling
    grid (4 frames at 0/500/1000/1500 ms), per-frame geometry, the
    expected constant color, and a within_tol flag with the same
    3/255 bound as mm_jpeg_decode (constant images survive q90
    quantization within ~1.2, a 2.5x margin). A frame-selection or
    container-parse error anywhere in the 400 sampled frames flips a
    row and fails the hash."""
    from collections.abc import Iterator as _Iter

    import numpy as _np
    import pandas as _pd

    from vectordb_light_spark.operators.multimodal import (
        decode_images,
        sample_frames,
    )
    from vectordb_light_spark.sources.media import avi_encode, jpeg_encode

    docs = load_docs(spark, sf_dir, "doc_id").where(F.col("doc_id") < 100)

    def build(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id in pdf["doc_id"]:
                i = int(media_id)
                jpgs = [
                    jpeg_encode(
                        _np.tile(
                            _np.array(
                                [
                                    (i * 7 + fi * 31) % 256,
                                    (i * 13 + fi * 17) % 256,
                                    (i * 29 + fi * 11) % 256,
                                ],
                                dtype=_np.uint8,
                            )[None, None, :],
                            (16, 24, 1),
                        ),
                        quality=90,
                    )
                    for fi in range(4)
                ]
                rows.append((i, avi_encode(jpgs, 2.0, 24, 16)))
            yield _pd.DataFrame(rows, columns=["media_id", "content"])

    media = docs.mapInPandas(build, schema="media_id long, content binary")
    media = media.withColumn(
        "media_meta", F.struct(F.lit(2000).alias("duration_ms"))
    )
    # the container bytes are consumed by sample_frames; don't drag
    # them through the decode Arrow stage on every exploded frame row
    frames = sample_frames(media, every_ms=500).drop("content", "media_meta")
    decoded = decode_images(frames, content_col="frame_bytes")
    want = (
        (
            ((F.col("media_id") * 7 + F.col("frame_index") * 31) % 256)
            + ((F.col("media_id") * 13 + F.col("frame_index") * 17) % 256)
            + ((F.col("media_id") * 29 + F.col("frame_index") * 11) % 256)
        ).cast("double")
        / 3.0
    )
    # r12: ordered_once — the range sampling otherwise re-runs the
    # AVI build + frame sampling + JPEG decode Python chain twice.
    return ordered_once(
        decoded.select(
            "media_id",
            "frame_index",
            "frame_ts_ms",
            "width",
            "height",
            "channels",
            ((F.col("media_id") * 7 + F.col("frame_index") * 31) % 256)
            .cast("int")
            .alias("r"),
            ((F.col("media_id") * 13 + F.col("frame_index") * 17) % 256)
            .cast("int")
            .alias("g"),
            ((F.col("media_id") * 29 + F.col("frame_index") * 11) % 256)
            .cast("int")
            .alias("b"),
            (F.abs(F.col("px_mean") - want) <= 3.0)
            .cast("int")
            .alias("within_tol"),
        ),
        "media_id", "frame_index",
    )


@register(
    "mm_audio_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(16000 AS INT) AS sr,
           CAST((265 + (doc_id % 30) * 130) // 500 AS INT) AS dominant_band,
           CAST(1 AS INT) AS peak_within_tol,
           CAST(1 AS INT) AS rms_within_tol
    FROM documents WHERE doc_id < 200
    ORDER BY media_id
    """,
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio feature extraction under a bounded contract (r4):
    each doc id becomes a 0.5 s 16 kHz mono sine WAV at
    265 + (doc_id % 30)·130 Hz (sources/media.py wav_encode), and
    operators/multimodal.audio_features runs the numpy rfft power
    spectrum over the real PCM. The oracle pins the sample rate, the
    EXACT dominant band (frequencies sit ≥5 Hz from every 500 Hz band
    edge; the argmax-bin band is exact for all 30 tones — verified),
    a peak-frequency flag (|peak − true| ≤ 4 Hz; measured worst error
    1.0 Hz at the 2 Hz bin width = 4× margin), and an RMS flag
    (|rms − A/√2| ≤ 0.01; measured 1.4e-5 = ~700× margin). A spectrum,
    windowing, or band-edge error anywhere in the 200 clips flips a
    row and fails the hash."""
    from collections.abc import Iterator as _Iter

    import numpy as _np
    import pandas as _pd

    from vectordb_light_spark.operators.multimodal import audio_features
    from vectordb_light_spark.sources.media import wav_encode

    docs = load_docs(spark, sf_dir, "doc_id").where(F.col("doc_id") < 200)
    sr, n, amp = 16000, 8000, 16000

    def build(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        t = _np.arange(n) / sr
        for pdf in batches:
            rows = []
            for media_id in pdf["doc_id"]:
                i = int(media_id)
                freq = 265 + (i % 30) * 130
                pcm = (amp * _np.sin(2 * _np.pi * freq * t)).astype(
                    _np.int16
                ).reshape(-1, 1)
                rows.append((i, wav_encode(pcm, sr), float(freq)))
            yield _pd.DataFrame(rows, columns=["media_id", "content", "freq"])

    media = docs.mapInPandas(
        build, schema="media_id long, content binary, freq double"
    )
    out = audio_features(media)
    want_rms = (amp / 32768.0) / float(_np.sqrt(2.0))
    # r12: ordered_once — the range sampling otherwise re-runs the
    # WAV build + rfft feature extraction twice.
    return ordered_once(
        out.select(
            "media_id",
            "sr",
            "dominant_band",
            (F.abs(F.col("peak_hz") - F.col("freq")) <= 4.0)
            .cast("int")
            .alias("peak_within_tol"),
            (F.abs(F.col("rms") - F.lit(want_rms)) <= 0.01)
            .cast("int")
            .alias("rms_within_tol"),
        ),
        "media_id",
    )


@register(
    "mm_image_pipeline",
    oracle="""
    SELECT CAST(r AS INT) AS rank,
           CAST(1 AS INT) AS in_pool,
           CAST(1 AS INT) AS top1_self_sim,
           CAST(1 AS INT) AS mono_ok,
           CAST(1 AS INT) AS score_in_range,
           CAST(0 AS BIGINT) AS n_bad_feat_norms,
           CAST(0 AS BIGINT) AS n_bad_geometry,
           CAST(0 AS BIGINT) AS n_bad_px_mean,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT 1 FROM documents ORDER BY doc_id LIMIT 200)) AS n_pool
    FROM generate_series(1, 5) t(r)
    ORDER BY rank
    """,
)
def mm_image_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image pipeline plumbing: binary media → decode (dims + pixel
    stats) → feature extraction (unit array<float>) → SRP top-5
    against the first image. Exercises the full multimodal stage
    chain with the deterministic fake decoders. Upgraded (r7) from
    rows-only to a bounded-contract oracle (r6 verdict item 4):
    SRP-over-blake2b-features has no SQL twin, so the oracle pins —
    over the ENTIRE 200-image pool, not just the top-5 — unit feature
    norms, the fake decoder's documented geometry envelope
    (16 ≤ w,h < 80, 3 channels), and px_mean re-derived by an
    INDEPENDENT engine (JVM codegen ascii-sum over the same text
    bytes vs the numpy byte mean — the mm_image_decode byte-math
    trick, engine-vs-engine); plus per-rank self-retrieval,
    membership, clip range, monotonicity, and pool cardinality.
    r9: flipped membership (the top-5 ids broadcast into the pool
    scan and ride the stats reduce — no pool-id broadcast) + the
    decode/feature stage persisted once for its four consumers."""
    from vectordb_light_spark.operators.multimodal import (
        decode_image_features,
        media_from_documents,
    )
    from vectordb_light_spark.operators.similarity import add_srp_signature, ann_topk_srp
    from vectordb_light_spark.session import persist_if_batch

    media = media_from_documents(spark, sf_dir, limit=200)
    # r13: fused decode+features stage (guide §4) — one mapInPandas,
    # the binary column crosses the Arrow boundary once (was: decode
    # stage, then the features stage re-shipping AND re-decoding the
    # same bytes). Output bit-identical (tests/test_multimodal.py).
    feats = persist_if_batch(decode_image_features(media, dim=32))
    q_row = feats.where(F.col("media_id") == 0).select("features").first()
    q = [float(x) for x in q_row[0]]
    indexed = add_srp_signature(feats, vec_col="features", n_planes=16, dim=32)
    out = ann_topk_srp(
        indexed, q, k=5, probe_hamming=16, n_planes=16,
        id_col="media_id", vec_col="features",
    )

    # Pool-wide contract stats. px_mean cross-check: the decoder saw
    # the utf-8 bytes of text; for ASCII text the JVM-side
    # ascii(substr) fold recomputes the same byte mean with none of
    # the Python decode path involved.
    text = F.decode("content", "utf-8")
    ascii_only = text.rlike(r"^[\x20-\x7e]*$") & (F.length(text) > 0)
    expected_mean = F.aggregate(
        F.sequence(F.lit(1), F.length(text)),
        F.lit(0.0),
        lambda acc, i: acc + F.ascii(text.substr(i, F.lit(1))),
    ) / F.length(text)
    sq_norm = F.aggregate(
        "features", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
    )
    # Flipped membership (r9, same shape as _topk_contract_flipped):
    # the ≤5 returned ids broadcast INTO the pool scan and the
    # matched ids ride the SAME reduce as the pool stats, so the
    # pool-id broadcast of the v1 form disappears.
    per_id = out.select("media_id").distinct().withColumn(
        "__hit", F.lit(1)
    )
    stats = feats.join(F.broadcast(per_id), "media_id", "left").agg(
        F.count(F.lit(1)).alias("n_pool"),
        F.count(F.when(F.abs(F.sqrt(sq_norm) - 1.0) > 1e-5, 1)).alias(
            "n_bad_feat_norms"
        ),
        F.count(
            F.when(
                (F.col("width") < 16) | (F.col("width") >= 80)
                | (F.col("height") < 16) | (F.col("height") >= 80)
                | (F.col("channels") != 3),
                1,
            )
        ).alias("n_bad_geometry"),
        F.count(
            F.when(
                ascii_only
                & (F.abs(F.col("px_mean") - expected_mean) > 1e-6),
                1,
            )
        ).alias("n_bad_px_mean"),
        F.collect_set(
            F.when(F.col("__hit").isNotNull(), F.col("media_id"))
        ).alias("__matched_ids"),
    )

    w = Window.orderBy(
        F.col("similarity_score").desc(), F.col("media_id").asc()
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("rank").cast("int").alias("rank"),
            F.coalesce(
                F.array_contains("__matched_ids", F.col("media_id")),
                F.lit(False),
            ).cast("int").alias("in_pool"),
            (
                (F.col("rank") > 1) | (F.col("similarity_score") >= 0.999)
            ).cast("int").alias("top1_self_sim"),
            (
                F.col("similarity_score")
                <= F.lag("similarity_score", 1, 2.0).over(
                    Window.orderBy("rank")
                ) + 1e-12
            ).cast("int").alias("mono_ok"),
            (
                (F.col("similarity_score") >= 0.0)
                & (F.col("similarity_score") <= 1.0)
            ).cast("int").alias("score_in_range"),
            F.col("n_bad_feat_norms").cast("long").alias("n_bad_feat_norms"),
            F.col("n_bad_geometry").cast("long").alias("n_bad_geometry"),
            F.col("n_bad_px_mean").cast("long").alias("n_bad_px_mean"),
            F.col("n_pool").cast("long").alias("n_pool"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Citation aggregation (SURVEY §2.5 Q14)
# ---------------------------------------------------------------------------


@register(
    "vq_citations",
    oracle="""
    WITH topk AS (
        SELECT e.vec_id, d.source,
               LEAST(GREATEST(list_cosine_similarity(
                   e.embedding::DOUBLE[],
                   (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
               ), 0.0), 1.0) AS sim
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
        ORDER BY sim DESC, e.vec_id ASC
        LIMIT 100
    )
    SELECT source,
           ROUND(MIN(sim), 6) AS min_score,
           ROUND(MAX(sim), 6) AS max_score,
           COUNT(*) AS n_chunks
    FROM topk
    GROUP BY source
    ORDER BY min_score, source
    """,
)
def vq_citations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 citation aggregation: group top-k hits by source, min/max
    similarity per group, ordered by min score asc (reference
    utilities.py:24-77; 'source' plays file_path)."""
    from vectordb_light_spark.operators.search import similarity_column

    q = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_docs(spark, sf_dir)
    topk = (
        emb.join(F.broadcast(docs), emb.vec_id == docs.doc_id)
        .withColumn("sim", similarity_column("embedding", q, assume_normalized=False))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(100)
    )
    return (
        topk.groupBy("source")
        .agg(
            F.round(F.min("sim"), 6).alias("min_score"),
            F.round(F.max("sim"), 6).alias("max_score"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .orderBy("min_score", "source")
    )


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
    "st_events_window",
    oracle="""
    SELECT time_bucket(INTERVAL 6 HOUR, ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def st_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour event-time windows per event_type — the exact
    aggregation streaming/events.windowed_event_counts runs under a
    watermark on the live stream; batch and streaming results are
    asserted identical in tests/test_streaming.py. avg_value is
    dropped from the compared output: it is total_value/n_events by
    construction, and a cross-engine ROUND(avg) can land exactly on a
    .5 tie that Spark (HALF_UP) and DuckDB round differently."""
    from vectordb_light_spark.streaming.events import windowed_event_counts

    e = load_table(spark, sf_dir, "events")
    return windowed_event_counts(e, window="6 hours").drop("avg_value").orderBy(
        "window_start", "event_type"
    )


@register(
    "st_events_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 45 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT *, SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 45 MINUTE AS session_end,
           user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
)
def st_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (45-minute gap) per user via the session_window
    builtin — the stateful streaming operator's batch twin; the oracle
    is the classic gaps-and-islands formulation (session end = last
    event + gap, matching Spark's session_window semantics)."""
    from vectordb_light_spark.streaming.events import sessionized_user_activity

    e = load_table(spark, sf_dir, "events")
    return sessionized_user_activity(e, gap="45 minutes").orderBy(
        "user_id", "session_start"
    )


@register(
    "st_user_running_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def st_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    cumulative per-user totals. This entry RUNS the real streaming
    query (availableNow trigger → memory sink); on one batch the
    emitted state equals the batch aggregate, which is what the SQL
    oracle states. Multi-batch incremental behavior is covered in
    tests/test_streaming.py."""
    from vectordb_light_spark.streaming.events import (
        bounded_state_partitions,
        read_events_stream,
        run_stream_to_memory,
        running_user_totals,
    )

    stream = read_events_stream(spark, sf_dir)
    with bounded_state_partitions(spark, 8):
        out = run_stream_to_memory(
            running_user_totals(stream), "st_user_totals_q", output_mode="update"
        )
    return out.select(
        "user_id", "n_events", F.round("total_value", 4).alias("total_value")
    ).orderBy("user_id")


@register(
    "st_heavy_hitters",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS est_count,
           CAST(0 AS BIGINT) AS max_err
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= 70
    ORDER BY user_id
    """,
)
def st_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters via sharded SpaceSaving summaries
    (streaming/events.py streaming_heavy_hitters) — runs the REAL
    stateful streaming query (applyInPandasWithState, availableNow →
    memory sink). State is a constant shards × capacity counters at
    any corpus size; in the no-eviction regime (distinct users ≪
    8 × 65536 at every graded SF — asserted in tests/test_streaming.py)
    the sketch is provably exact with max_err ≡ 0, which is what the
    SQL oracle states. Eviction-regime error bounds (true ≤ est ≤
    true + max_err; retention of every key above N/capacity) get
    dedicated unit tests."""
    from vectordb_light_spark.streaming.events import (
        bounded_state_partitions,
        read_events_stream,
        run_stream_to_memory,
        streaming_heavy_hitters,
    )

    stream = read_events_stream(spark, sf_dir)
    with bounded_state_partitions(spark, 8):
        out = run_stream_to_memory(
            streaming_heavy_hitters(stream, threshold=70),
            "st_heavy_hitters_q",
            output_mode="update",
        )
    return out.select("user_id", "est_count", "max_err").orderBy("user_id")


@register(
    "st_windowed_quantiles",
    oracle="""
    SELECT event_type,
           CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(1 AS INT) AS p50_exact,
           CAST(1 AS INT) AS p95_exact
    FROM events
    GROUP BY event_type, CAST(ts AS DATE)
    ORDER BY event_type, day
    """,
)
def st_windowed_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed percentiles via per-(type, day)
    Greenwald-Khanna summaries (streaming/events.py
    streaming_windowed_quantiles) — runs the REAL stateful streaming
    query (applyInPandasWithState, availableNow → memory sink), the
    quantile sibling of st_heavy_hitters. Contract: at eps=0.002 the
    summary is provably EXACT below n = 250 per window — sf windows
    hold ≤ ~90 events (≥2.7× margin, asserted in
    tests/test_streaming.py) — so the streamed p50/p95 must equal
    the batch ⌈φn⌉-th order statistics bit-for-bit and the oracle
    pins exact per-window counts plus both equality flags.
    Compression-regime rank bounds (εn) get dedicated unit tests."""
    from vectordb_light_spark.streaming.events import (
        bounded_state_partitions,
        read_events_stream,
        run_stream_to_memory,
        streaming_windowed_quantiles,
        windowed_quantiles_batch,
    )

    stream = read_events_stream(spark, sf_dir)
    with bounded_state_partitions(spark, 8):
        out = run_stream_to_memory(
            streaming_windowed_quantiles(stream),
            "st_windowed_quantiles_q",
            output_mode="update",
        )
    exact = windowed_quantiles_batch(
        load_table(spark, sf_dir, "events")
    ).select(
        "event_type",
        "day",
        F.col("p50").alias("__x50"),
        F.col("p95").alias("__x95"),
    )
    return (
        out.join(exact, ["event_type", "day"])
        .select(
            "event_type",
            "day",
            "n_events",
            (F.col("p50") == F.col("__x50")).cast("int").alias("p50_exact"),
            (F.col("p95") == F.col("__x95")).cast("int").alias("p95_exact"),
        )
        .orderBy("event_type", "day")
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


@register(
    "rel_events_interval",
    oracle="""
    WITH w AS (
        SELECT user_id, MIN(ts) AS w_start,
               MIN(ts) + INTERVAL 1 DAY AS w_end
        FROM events GROUP BY user_id
    )
    SELECT e.user_id, COUNT(*) AS n_events,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e
    JOIN w ON e.user_id = w.user_id
          AND e.ts >= w.w_start AND e.ts <= w.w_end
    GROUP BY e.user_id
    ORDER BY e.user_id
    """,
)
def rel_events_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/joins.py:interval_join): every event
    matched into its user's first-24h activity window. Bucketized to
    an hash equi-join on (user_id, time bucket) with the exact
    BETWEEN as post-filter — no nested-loop join in the plan."""
    from vectordb_light_spark.operators.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    windows = ev.groupBy("user_id").agg(F.min("ts").alias("w_start"))
    windows = windows.withColumn(
        "w_end", F.col("w_start") + F.expr("INTERVAL 1 DAY")
    )
    pts = ev.select("user_id", "ts", "value")
    joined = interval_join(
        pts, windows, on="user_id", bucket_s=6 * 3600
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("user_id")
    )


@register(
    "pipe_sequence_pack",
    oracle="""
    WITH laid AS (
        SELECT doc_id, n_chars,
               COALESCE(SUM(n_chars) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS tok_start
        FROM documents
    )
    -- CAST: tok_start is a window-SUM over INTEGER → HUGEINT in
    -- DuckDB; the driver's hasher renders int128 unlike Spark BIGINT.
    SELECT CAST(tok_start // 4096 AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM laid
    GROUP BY 1
    ORDER BY seq_id
    """,
)
def pipe_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-cut sequence packing (operators/packing.py):
    documents laid end-to-end in doc_id order, cut every 4096 chars;
    summarized per sequence. The Spark side uses the two-phase
    parallel prefix sum (ONE range shuffle + N-integer offsets), not a
    single-partition global window — the oracle's OVER (ORDER BY)
    states the same math DuckDB-side."""
    from vectordb_light_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    packed = pack_sequences(
        docs, token_col="n_chars", order_col="doc_id", budget=4096
    )
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("seq_id")
    )


@register(
    "rel_events_asof",
    oracle="""
    SELECT l.event_id, l.user_id,
           r.event_id AS buy_event_id,
           date_diff('microsecond', r.ts, l.ts) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id
    """,
)
def rel_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/joins.py): every click matched to the
    same user's most recent prior-or-equal purchase, LEFT semantics.
    Union+window form — one shuffle of clicks∪purchases on user_id,
    no pair explosion — vs DuckDB's native ASOF LEFT JOIN."""
    from vectordb_light_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), "user_id", "ts"
    )
    out = asof_join(clicks, buys, on="user_id", right_id_col="buy_id")
    return out.select(
        "event_id",
        "user_id",
        F.col("r_buy_id").alias("buy_event_id"),
        (F.unix_micros("ts") - F.unix_micros("r_ts")).alias("lag_us"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Deterministic splits / sampling / corpus mixing (beyond-reference;
# operators/sampling.py). The oracle SQL is BUILT FROM THE SAME hex
# thresholds as the Spark expression (split_case_sql / bucket_sql), so
# the two sides agree bit-for-bit, not just statistically.
# ---------------------------------------------------------------------------

from vectordb_light_spark.operators.sampling import (  # noqa: E402
    bucket_sql,
    fraction_threshold,
    split_case_sql,
)

_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_MIX_FRACTIONS = {"en": 1.0, "de": 0.5, "es": 0.5, "fr": 0.25, "zh": 0.1}


@register(
    "pipe_corpus_split",
    oracle=f"""
    SELECT {split_case_sql("doc_id", _SPLIT_WEIGHTS)} AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    ORDER BY split
    """,
)
def pipe_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10 by doc_id
    hash) summarized per split. Map-side CASE over md5 hex — no
    shuffle until the 3-group aggregate; reproducible across runs,
    partitionings, and engines."""
    from vectordb_light_spark.operators.sampling import assign_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        assign_split(docs, _SPLIT_WEIGHTS, id_col="doc_id", seed=0)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


#: Staged in r8/r9, REGISTERED in r10 (r9 verdict item 1) once the
#: r7-stale tail fit inside the same 50-row cut. The oracle text was
#: frozen in r9; cross-engine parity was already pinned by
#: tests/test_sampling.py::test_leakage_safe_split_staged_oracle_parity,
#: hand-verified at sf0.01, and probe-verified on the adversarial
#: salted corpus (late r9: hash-identical, zero leaky clusters). The
#: 1-row leak-check crossJoin is in test_plan_guards.ONE_ROW_BNLJ_OK.
def _leakage_split_oracle_sql() -> str:
    """DuckDB twin of pipe_leakage_safe_split: the SAME recursive-CTE
    cluster fixed point as dd_duplicate_clusters, split routing by
    COALESCE(cluster_id, doc_id) through the shared md5-threshold
    CASE, and the leak self-check (clusters spanning >1 split — 0 by
    construction, so a broken router fails the value hash)."""
    return f"""
    WITH RECURSIVE {_minhash_cand_ctes(pinned=True)},
    edges AS MATERIALIZED (
        SELECT id_a AS a, id_b AS b FROM cand
        UNION
        SELECT id_b AS a, id_a AS b FROM cand
    ),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        FROM reach GROUP BY a
    ),
    routed AS (
        SELECT d.doc_id, d.n_chars, comp.cluster_id,
               {split_case_sql("COALESCE(comp.cluster_id, d.doc_id)", _SPLIT_WEIGHTS)} AS split
        FROM documents d LEFT JOIN comp ON d.doc_id = comp.doc_id
    ),
    leaky AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_leaky_clusters
        FROM (
            SELECT cluster_id FROM routed WHERE cluster_id IS NOT NULL
            GROUP BY cluster_id HAVING COUNT(DISTINCT split) > 1
        )
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           (SELECT n_leaky_clusters FROM leaky) AS n_leaky_clusters
    FROM routed
    GROUP BY split
    ORDER BY split
    """


@register("pipe_leakage_safe_split", oracle=_leakage_split_oracle_sql())
def pipe_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (sampling.leakage_safe_split
    — the eval-contamination guard): near-dup clusters from the SAME
    MinHash->connected-components fixed point as
    dd_duplicate_clusters, every document routed by its cluster label
    (own id for singletons) through the deterministic md5-threshold
    CASE, so a test document can never have a near-copy in train.
    Output: per-split doc/char totals plus the leak self-check — the
    count of clusters spanning more than one split, pinned to 0 by
    the oracle (a routing regression flips the hash). The cluster
    table joins in broadcast-sized (only docs WITH duplicates); the
    routing itself is map-side.

    SINGLE-PASS plan (r12, VERDICT r11 item 1): the r11 body read
    the routed corpus TWICE — once for the per-split totals, once
    re-joined against the cluster table for the leak check. Both now
    derive from ONE ``groupBy(split, cluster_id)`` over the routed
    scan (cluster_id retained through routing): per-split totals are
    sums over the tiny grouped frame, and the leak count is the
    number of non-null cluster_ids appearing under more than one
    (split, cluster) group. At 100 TB that halves the corpus reads;
    the grouped frame is lazily checkpointed so the scan runs once
    and both consumers reuse it."""
    from vectordb_light_spark.operators.components import duplicate_clusters
    from vectordb_light_spark.operators.dedup import (
        canonical_text,
        minhash_lsh_candidates,
    )
    from vectordb_light_spark.operators.sampling import assign_split

    docs = load_docs(spark, sf_dir)
    base = docs.where(F.length(canonical_text("text")) > 0)
    # min_est pushes the 0.75 threshold below the pair-dedup exchange
    # (r12): sub-threshold candidates never shuffle.
    pairs = minhash_lsh_candidates(
        base, num_hashes=16, bands=4, hash_family="poly31",
        max_bucket=None, min_est=0.75,
    )
    # pointer_jumping: same fixed point in O(log D) rounds — measured
    # faster on this exact sf0.1 pair graph (SCALING.md r10 section)
    clusters = duplicate_clusters(
        pairs, left_id="id_a", right_id="id_b", pointer_jumping=True
    ).select("doc_id", "cluster_id")
    # leakage_safe_split's routing, inlined with cluster_id RETAINED
    # (the facade drops it; the leak self-check needs it)
    routed = assign_split(
        docs.join(clusters, "doc_id", "left")
        .withColumn("_route", F.coalesce("cluster_id", F.col("doc_id"))),
        _SPLIT_WEIGHTS, id_col="_route", seed=0,
    ).drop("_route")
    g = (
        routed.groupBy("split", "cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("n_chars").cast("long").alias("_chars"),
        )
        .localCheckpoint(eager=False)
    )
    leaky = (
        g.where(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("__ns"))
        .agg(
            F.count(F.when(F.col("__ns") > 1, 1))
            .cast("long")
            .alias("n_leaky_clusters")
        )
    )
    return (
        g.groupBy("split")
        .agg(
            F.sum("_n").cast("long").alias("n_docs"),
            F.sum("_chars").cast("long").alias("total_chars"),
        )
        .crossJoin(F.broadcast(leaky))
        .orderBy("split")
    )


def _curate_split_chain_oracle_sql() -> str:
    """DuckDB twin of pipe_curate_split_chain (VERDICT r11 item 7):
    the chain's gate intersection (the EXACT `_curate_gate_ctes`
    text pipe_curate_chain grades) defines the survivor set, then the
    leakage-split machinery runs OVER THE SURVIVORS — the same
    minhash CTE chain as the pipe_leakage_safe_split oracle but
    sourced from ``surv``, the same recursive-CTE cluster fixed
    point, and the same md5-threshold routing CASE — aggregated to
    per-split doc/char totals. A routing regression (or a gate
    regression changing the survivor set) flips the value hash."""
    return f"""
    WITH RECURSIVE {_curate_gate_ctes()},
    surv AS MATERIALIZED (
        SELECT d.doc_id, d.text
        FROM documents d
        JOIN d1 ON d.doc_id = d1.doc_id
        JOIN rep ON d.doc_id = rep.doc_id
        JOIN q ON d.doc_id = q.doc_id
    ),
    {_minhash_cand_ctes(pinned=True, source="surv")},
    edges AS MATERIALIZED (
        SELECT id_a AS a, id_b AS b FROM cand
        UNION
        SELECT id_b AS a, id_a AS b FROM cand
    ),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        FROM reach GROUP BY a
    ),
    routed AS (
        SELECT sv.doc_id, length(sv.text) AS n_chars,
               {split_case_sql("COALESCE(comp.cluster_id, sv.doc_id)", _SPLIT_WEIGHTS)} AS split
        FROM surv sv LEFT JOIN comp ON sv.doc_id = comp.doc_id
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM routed
    GROUP BY split
    ORDER BY split
    """


@register(
    "pipe_curate_split_chain", oracle=_curate_split_chain_oracle_sql()
)
def pipe_curate_split_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curate chain COMPOSED with its terminal leakage-safe split
    stage (VERDICT r11 item 7): exact dedup → repetition gate →
    learned quality gate → `split` annotation, run through the
    PRODUCT runner (operators/curate_pipeline.py run_curation,
    report=False) exactly as `curate --split-weights` composes it,
    then aggregated to per-split doc/char totals. The split stage is
    the newest stage and previously had only probe+CLI coverage of
    its composed behavior — this entry puts the composition itself
    under the driver oracle. ctx pins the oracle's LSH family and
    geometry (16 hashes / 4 bands / poly31, uncapped — the
    registered pipe_leakage_safe_split machinery); the r12 stage
    routes IN PLACE (one LEFT join against the dup-docs-only cluster
    table + the map-side md5 CASE), so the composed plan adds no
    full-data exchange beyond the gates' own."""
    from vectordb_light_spark.operators.curate_pipeline import run_curation

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    out, _ = run_curation(
        docs,
        ("exact_dedup", "repetition", "quality", "split"),
        report=False,
        repetition_bar=0.05,
        split_weights=_SPLIT_WEIGHTS,
        split_seed=0,
        split_lsh=dict(
            num_hashes=16, bands=4, hash_family="poly31",
            max_bucket=None,
        ),
    )
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )
        .orderBy("split")
    )


@register(
    "pipe_corpus_mix",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_docs
    FROM documents
    WHERE {bucket_sql("doc_id")} < CASE lang
        {" ".join(f"WHEN '{k}' THEN '{fraction_threshold(v)}'" for k, v in _MIX_FRACTIONS.items())}
        ELSE '{fraction_threshold(0.0)}' END
    GROUP BY lang
    ORDER BY lang
    """,
)
def pipe_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing via stratified deterministic sampling:
    per-language keep-rates (en 1.0 … zh 0.1) applied as ONE map-side
    filter (threshold is a CASE over the stratum), then counted. The
    100 TB shape: a full-corpus reweighting pass with zero shuffle
    before the final tiny aggregate."""
    from vectordb_light_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    mixed = stratified_sample(
        docs, _MIX_FRACTIONS, strata_col="lang", id_col="doc_id", seed=0
    )
    return (
        mixed.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Keyword retrieval + hybrid fusion (beyond-reference; operators/keyword.py)
# ---------------------------------------------------------------------------

_BM25_TERMS = ["spark", "vector", "stream"]
_BM25_SQL_TERMS = ", ".join(f"'{t}'" for t in _BM25_TERMS)

# The exact BM25 pipeline, as one reusable SQL text (the hybrid oracle
# embeds it again with a different k).
_BM25_ORACLE_CTE = rf"""
    toks AS (
        SELECT doc_id, t.term
        FROM documents,
             LATERAL unnest(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+')) AS t(term)
        WHERE t.term <> ''
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE term IN ({_BM25_SQL_TERMS})
        GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    bm25 AS (
        SELECT tf.doc_id,
               SUM(ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
               ) AS score
        FROM tf
        JOIN dl USING (doc_id)
        JOIN dfreq USING (term)
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )
"""


@register(
    "kw_bm25_topk",
    oracle=f"""
    WITH {_BM25_ORACLE_CTE}
    SELECT doc_id, ROUND(score, 4) AS bm25,
           CAST(ROW_NUMBER() OVER (
               ORDER BY ROUND(score, 6) DESC, doc_id ASC) AS INT) AS rank
    FROM bm25
    ORDER BY rank
    LIMIT 10
    """,
)
def kw_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical top-10 (operators/keyword.py) for a 3-term query.
    All builtins; the query-term filter hits the exploded token stream
    pre-shuffle, so only matching postings aggregate."""
    from vectordb_light_spark.operators.keyword import bm25_topk

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    out = bm25_topk(docs, _BM25_TERMS, k=10)
    return out.select(
        "doc_id", F.round("bm25", 4).alias("bm25"), "rank"
    ).orderBy("rank")


@register(
    "kw_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_ORACLE_CTE},
    lex AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY ROUND(score, 6) DESC, doc_id ASC) AS INT) AS rank
        FROM bm25 ORDER BY rank LIMIT 20
    ),
    dense AS (
        SELECT vec_id AS doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY LEAST(GREATEST(list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
                   ), 0.0), 1.0) DESC, vec_id ASC) AS INT) AS rank
        FROM embeddings ORDER BY rank LIMIT 20
    ),
    fused AS (
        SELECT doc_id, SUM(1.0 / (60.0 + rank)) AS rrf_score,
               CAST(COUNT(*) AS INT) AS n_systems
        FROM (SELECT * FROM lex UNION ALL SELECT * FROM dense)
        GROUP BY doc_id
    )
    SELECT doc_id, ROUND(rrf_score, 6) AS rrf_score, n_systems,
           CAST(ROW_NUMBER() OVER (
               ORDER BY ROUND(rrf_score, 6) DESC, doc_id ASC) AS INT) AS rank
    FROM fused
    ORDER BY rank
    LIMIT 10
    """,
)
def kw_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 + dense cosine top-20 (query =
    embedding of vec_id 0; doc_id ≡ vec_id in the testdata), fused by
    reciprocal rank (c=60) as union + ONE groupBy — no outer-join
    chain — then top-10. The production RAG read path the vector-only
    reference lacks."""
    from vectordb_light_spark.operators.keyword import bm25_topk, rrf_fuse
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    lex = bm25_topk(docs, _BM25_TERMS, k=20).select("doc_id", "rank")

    q = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    dense = (
        topk_cosine(
            emb, q, SearchParams(k=20, threshold=0.0),
            id_col="vec_id", vec_col="embedding",
        )
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )

    fused = rrf_fuse([lex, dense], id_col="doc_id", c=60.0)
    key = F.round(F.col("rrf_score"), 6)
    topk = fused.orderBy(key.desc(), F.col("doc_id").asc()).limit(10)
    w = Window.orderBy(key.desc(), F.col("doc_id").asc())
    return topk.select(
        "doc_id",
        F.round("rrf_score", 6).alias("rrf_score"),
        "n_systems",
        F.row_number().over(w).alias("rank"),
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# Profiling aggregates (beyond-reference; operators/profiling.py)
# ---------------------------------------------------------------------------


@register(
    "prof_corpus_quantiles",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           ROUND(AVG(n_chars), 4) AS avg_size,
           ROUND(quantile_cont(n_chars, 0.5), 4) AS median_size,
           ROUND(quantile_cont(n_chars, 0.9), 4) AS p90_size
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def prof_corpus_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language corpus profile (operators/profiling.py):
    count, distinct sources, mean + exact interpolated median/p90 of
    document size. One keyed shuffle."""
    from vectordb_light_spark.operators.profiling import corpus_profile

    return corpus_profile(load_table(spark, sf_dir, "documents"))


@register(
    "prof_events_rollup",
    oracle="""
    SELECT COALESCE(event_type, '<all>') AS event_type,
           COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), '<all>') AS day,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    GROUP BY ROLLUP (event_type, date_trunc('day', ts))
    ORDER BY event_type, day
    """,
)
def prof_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (event_type, day) in one pass: per-type-per-day,
    per-type, and grand-total cells from a single map-side partial
    aggregation (SURVEY §2.6 grouping surface)."""
    from vectordb_light_spark.operators.profiling import events_rollup

    return events_rollup(load_table(spark, sf_dir, "events"))


@register(
    "prof_events_sketch",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS INT) AS hll_within_bound,
           CAST(1 AS INT) AS p50_in_band,
           CAST(1 AS INT) AS p95_in_band
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def prof_events_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch tier: HLL++ distinct users + Greenwald-Khanna p50/p95
    per event type — constant-memory mergeable partial aggregates, the
    100 TB profiling path. Upgraded (r4) from a rows-only row to a
    BOUNDED-CONTRACT oracle, the same move as the r3 ANN upgrades:
    estimates are implementation-defined so the oracle instead pins
    the exact counts PLUS flags asserting every estimate lands inside
    its published error bound — HLL (rsd=0.01) within 5% of exact
    distinct, GK p50/p95 (accuracy 10000 ⇒ rank error ≤ 1e-4) inside
    the exact [p45,p55] / [p90,p99] value bands. Margins are ≥2× at
    both graded SFs (measured in tests/test_profiling.py); raw
    estimate values remain error-bound-tested there too."""
    from vectordb_light_spark.operators.profiling import events_sketch_profile

    ev = load_table(spark, sf_dir, "events")
    sk = events_sketch_profile(ev)
    bands = F.expr("percentile(value, array(0.45, 0.55, 0.90, 0.99))")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        bands.alias("__bands"),
    )
    return (
        sk.join(exact, "event_type")
        .select(
            "event_type",
            "n_events",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).cast("int").alias("hll_within_bound"),
            (
                (F.col("p50_value") >= F.col("__bands").getItem(0))
                & (F.col("p50_value") <= F.col("__bands").getItem(1))
            ).cast("int").alias("p50_in_band"),
            (
                (F.col("p95_value") >= F.col("__bands").getItem(2))
                & (F.col("p95_value") <= F.col("__bands").getItem(3))
            ).cast("int").alias("p95_in_band"),
        )
        .orderBy("event_type")
    )


@register(
    "prof_sketch_accuracy",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS INT) AS hll_within_5pct,
           CAST(1 AS INT) AS gk_p50_in_rank_band
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def prof_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy contract: exact distinct users per event type
    alongside BOUND CHECKS that (a) the HLL++ estimate (rsd=2%) lands
    within 5% of exact and (b) the Greenwald-Khanna p50 estimate
    (accuracy 10000 ⇒ rank error ≤ 1e-4) lands inside the exact
    [p45, p55] value band — the rank-error guarantee restated as a
    verifiable value predicate. The oracle pins the exact counts and
    requires every bound to hold (TRUE columns) — the estimates
    themselves are implementation-defined, so this is the strongest
    SQL-checkable statement about the sketch tier; estimate values
    are additionally error-bound-tested in tests/test_profiling.py."""
    # NOT rebalanced (r12 measured negative): widening the one-split
    # scan to 32 partial aggregates made the entry SLOWER (1.44 vs
    # 1.31 s interleaved) — exact-percentile partials are value
    # buffers that concatenate rather than reduce, so more map tasks
    # means more bytes into the merge. The win here came from the AQE
    # coalesce floor keeping the merge stage parallel (2.56 → 1.00 s).
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("gk_p50"),
            F.expr("percentile(value, 0.45)").alias("p45"),
            F.expr("percentile(value, 0.55)").alias("p55"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).cast("int").alias("hll_within_5pct"),
            (
                (F.col("gk_p50") >= F.col("p45"))
                & (F.col("gk_p50") <= F.col("p55"))
            ).cast("int").alias("gk_p50_in_rank_band"),
        )
        .orderBy("event_type")
    )


@register(
    "skew_salted_user_join",
    oracle="""
    WITH totals AS (
        -- value_e4: per-event integer 1e-4 units BEFORE any sum, so
        -- every aggregate is exact integer math — double sums are
        -- order-dependent in the last ulp, and Spark's partition order
        -- is not DuckDB's. CASTs on the outer sums: SUM(BIGINT) is
        -- HUGEINT in DuckDB, which the driver hashes unlike BIGINT.
        SELECT user_id, COUNT(*) AS user_events,
               SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS user_value_e4
        FROM events GROUP BY user_id
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(t.user_value_e4) AS BIGINT) AS sum_user_value_e4,
           CAST(SUM(t.user_events) AS BIGINT) AS sum_user_events
    FROM events e JOIN totals t ON e.user_id = t.user_id
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def skew_salted_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.py): the fact side takes a
    deterministic salt, the per-user dim side replicates salt×, so a
    hot user splits across `salt` reducers. Result is oracle-equal to
    the plain join — salting must never change semantics. Value sums
    are integer 1e-4 units end-to-end (per-event round, then integer
    sums) so the result is bit-identical under any summation order."""
    from vectordb_light_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_events"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("user_value_e4"),
    )
    joined = salted_join(
        ev.select("event_id", "user_id", "event_type"),
        totals,
        "user_id",
        salt=8,
        salt_source="event_id",
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("user_value_e4").alias("sum_user_value_e4"),
            F.sum("user_events").alias("sum_user_events"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Deeper relational coverage: TPC-H Q3/Q5 shapes + time-range window
# ---------------------------------------------------------------------------


@register(
    "rel_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-01'
      AND l.l_shipdate > TIMESTAMP '1997-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) DESC,
             l.l_orderkey
    LIMIT 10
    """,
)
def rel_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    revenue per urgent order, top 10. Both dimension filters push to
    their scans; customer (post-filter) broadcasts into orders, that
    result broadcasts into the lineitem side at this SF — on a
    cluster the orders⋈lineitem pair is the one keyed shuffle."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1997-06-01"
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > "1997-06-01"
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 4).alias("revenue"))
        .orderBy(F.round(revenue, 6).desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


@register(
    "rel_region_volume",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def rel_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join (local-supplier volume by
    nation). Every dimension (region→nation→supplier, customer)
    broadcasts; lineitem⋈orders is the only data-sized shuffle; the
    region filter prunes before any join."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")

    asian_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(asian_supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(revenue, 4).alias("revenue"))
        .orderBy("n_name")
    )


@register(
    "rel_events_moving_avg",
    oracle="""
    WITH mv AS (
        SELECT user_id,
               SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS cents,
               COUNT(*) OVER w AS cnt
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           MAX(cents * 100 // cnt) / 10000.0 AS peak_3d_avg
    FROM mv GROUP BY user_id ORDER BY user_id
    """,
)
def rel_events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window: per-user 3-day trailing average of value,
    reduced to each user's peak. Two cross-engine determinism rules:
    the frame bound is epoch MICROseconds (the timestamp's native
    precision — epoch seconds would mis-include rows within 1s of the
    3-day edge), and the windowed average is computed from an integer
    cents sum (values carry 2 decimals), because a float SUM's value
    depends on summation order — at sf0.1 one user's peak landed on
    the 1e-4 round-half boundary and the two engines disagreed. An
    integer sum is order-independent, and the 1e-4 discretization is
    integer FLOOR-division — ROUND(double) is engine-defined at ties
    (Spark rounds the decimal string HALF_UP, DuckDB rounds the
    binary double, so any half-cent average diverges). One keyed
    shuffle shared by window and final aggregate; values are
    non-negative so floor == truncating div in both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3 * 86400 * 1_000_000, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.withColumn("_cents", cents)
        .withColumn("_sum", F.sum("_cents").over(w))
        .withColumn("_cnt", F.count(F.lit(1)).over(w))
        .withColumn("_pk", F.expr("_sum * 100 div _cnt"))
        .groupBy("user_id")
        .agg((F.max("_pk") / 10000.0).alias("peak_3d_avg"))
        .orderBy("user_id")
    )


@register(
    "rel_events_gaps",
    oracle="""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def rel_events_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() inter-event gap analytics: per-user time-between-events
    in exact integer MICROseconds (sums of integers are
    order-independent, so no float canonicalization risk — the same
    rule as rel_events_moving_avg). Window ordering ties on
    (ts, event_id) so duplicate timestamps are deterministic in both
    engines. One hashpartitioning(user_id) exchange serves the lag
    window AND the final aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.withColumn("_gap", gap)
        .where(F.col("_gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("_gap").alias("total_gap_us"),
            F.max("_gap").alias("max_gap_us"),
            F.min("_gap").alias("min_gap_us"),
        )
        .orderBy("user_id")
    )


@register(
    "st_events_dedup",
    oracle="""
    WITH doubled AS (
        SELECT * FROM events UNION ALL SELECT * FROM events
    ),
    deduped AS (SELECT DISTINCT * FROM doubled)
    SELECT event_type, COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM deduped GROUP BY event_type ORDER BY event_type
    """,
)
def st_events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once dedup (streaming/events.py:dedup_events): the
    input is doubled (an at-least-once source), deduped on event_id,
    then aggregated — totals must equal the single-copy input. The
    same operator runs as dropDuplicatesWithinWatermark on the live
    stream (tests/test_streaming.py asserts stream ≡ batch)."""
    from vectordb_light_spark.streaming.events import dedup_events

    ev = load_table(spark, sf_dir, "events")
    doubled = ev.unionAll(ev)
    return (
        dedup_events(doubled)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


@register(
    "rel_sessions_overlap",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 45 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT *, SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, MIN(ts) AS s_start,
               MAX(ts) + INTERVAL 45 MINUTE AS s_end
        FROM numbered GROUP BY user_id, session_no
    ),
    peaks AS (
        SELECT DISTINCT date_trunc('day', ts) + INTERVAL 12 HOUR AS p_start,
               date_trunc('day', ts) + INTERVAL 14 HOUR AS p_end
        FROM events
    )
    SELECT s.user_id, COUNT(*) AS n_peak_sessions
    FROM sessions s JOIN peaks p
      ON s.s_start <= p.p_end AND p.p_start <= s.s_end
    GROUP BY s.user_id
    ORDER BY s.user_id
    """,
)
def rel_sessions_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (operators/joins.py:overlap_join): user
    sessions (45-min gap) against daily 12:00-14:00 peak windows —
    how many peak-hour-touching sessions each user has. Bucketized
    equi-join with map-side ownership-bucket dedup; no nested-loop
    join, no distinct shuffle."""
    from vectordb_light_spark.operators.joins import overlap_join
    from vectordb_light_spark.streaming.events import sessionized_user_activity

    ev = load_table(spark, sf_dir, "events")
    sessions = sessionized_user_activity(ev, gap="45 minutes").select(
        "user_id",
        F.col("session_start").alias("s_start"),
        F.col("session_end").alias("s_end"),
    )
    day = F.date_trunc("day", "ts")
    peaks = (
        ev.select(
            (day + F.expr("INTERVAL 12 HOURS")).alias("p_start"),
            (day + F.expr("INTERVAL 14 HOURS")).alias("p_end"),
        )
        .distinct()
    )
    joined = overlap_join(
        sessions,
        peaks,
        left_start="s_start",
        left_end="s_end",
        right_start="p_start",
        right_end="p_end",
        bucket_s=6 * 3600,
    )
    return (
        joined.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_peak_sessions"))
        .orderBy("user_id")
    )


@register(
    "vq_topk_quantized",
    oracle="""
    WITH deq AS (
        SELECT vec_id, label,
               list_transform(
                   embedding::DOUBLE[],
                   x -> CAST(floor(least(greatest(x, -1.0), 1.0) * 127.0 + 0.5)
                             AS DOUBLE) / 127.0
               ) AS dv
        FROM embeddings
    ),
    qv AS (SELECT dv AS v FROM deq WHERE vec_id = 0)
    SELECT vec_id, label,
           ROUND(LEAST(GREATEST(list_cosine_similarity(
               dv, (SELECT v FROM qv)), 0.0), 1.0), 6) AS similarity_score,
           CAST(ROW_NUMBER() OVER (
               ORDER BY LEAST(GREATEST(list_cosine_similarity(
                   dv, (SELECT v FROM qv)), 0.0), 1.0) DESC, vec_id ASC)
               AS INT) AS rank
    FROM deq
    ORDER BY rank
    LIMIT 6
    """,
)
def vq_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 on an int8-quantized store (functions/vector.py:
    quantize_int8): embeddings round-trip through array<tinyint> —
    4× less scan/shuffle/broadcast volume — then exact top-k cosine
    on the dequantized values. Quantization uses floor(x*127+0.5),
    deterministic across engines (round-half of doubles is not).
    Recall vs the float store is unit-tested in test_search.py."""
    from vectordb_light_spark.functions.vector import (
        dequantize_int8,
        quantize_int8,
    )
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", dequantize_int8(quantize_int8("embedding"))
    )
    q_row = emb.where(F.col("vec_id") == 0).select("embedding").first()
    q = [float(x) for x in q_row[0]]
    out = topk_cosine(
        emb, q, SearchParams(k=6, threshold=0.0),
        id_col="vec_id", vec_col="embedding",
    )
    return out.select(
        "vec_id", "label",
        F.round("similarity_score", 6).alias("similarity_score"),
        "rank",
    )


@register(
    "dq_events_constraints",
    oracle="""
    WITH agg AS (
        SELECT COUNT(*) AS n_rows,
               SUM(CASE WHEN value >= 0 THEN 0 ELSE 1 END) AS v0,
               SUM(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END) AS v1,
               SUM(CASE WHEN ts >= TIMESTAMP '2024-01-01' THEN 0 ELSE 1 END) AS v2,
               SUM(CASE WHEN json_valid(props)
                         AND json_extract(props, '$.k') IS NOT NULL
                        THEN 0 ELSE 1 END) AS v3,
               SUM(CASE WHEN event_type IN
                        ('click','view','purchase','error','scroll')
                        THEN 0 ELSE 1 END) AS v4
        FROM events
    )
    SELECT t.rule, agg.n_rows,
           -- CAST: SUM(int) is HUGEINT in DuckDB; driver hashes int128
           -- differently from Spark's BIGINT.
           CAST(t.n_violations AS BIGINT) AS n_violations,
           -- INT: no boolean has ever crossed the driver hasher;
           -- 0/1 ints are engine-neutral (r1 HUGEINT lesson).
           CAST(t.n_violations = 0 AS INT) AS passed
    FROM agg, LATERAL (VALUES
        ('value_non_negative', v0), ('user_id_not_null', v1),
        ('ts_in_range', v2), ('props_json_has_k', v3),
        ('event_type_in_domain', v4)) AS t(rule, n_violations)
    """,
)
def dq_events_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (operators/quality.py): five constraints over
    events in ONE scan — map-side conditional sums, a 1-row aggregate,
    then a literal unpivot. N rules never cost N passes."""
    from vectordb_light_spark.operators.quality import check_constraints

    ev = load_table(spark, sf_dir, "events")
    return check_constraints(
        ev,
        {
            "value_non_negative": F.col("value") >= 0,
            "user_id_not_null": F.col("user_id").isNotNull(),
            "ts_in_range": F.col("ts") >= F.lit("2024-01-01").cast("timestamp"),
            "props_json_has_k": F.get_json_object("props", "$.k").isNotNull(),
            "event_type_in_domain": F.col("event_type").isin(
                "click", "view", "purchase", "error", "scroll"
            ),
        },
    ).withColumn("passed", F.col("passed").cast("int"))


def _clusters_oracle_sql() -> str:
    """Connected components over the MinHash candidate pairs as a
    DuckDB RECURSIVE CTE: transitive closure of the symmetric edge
    set, then per-node min reachable id — the fixed point the
    engine's iterative min-label propagation converges to."""
    return f"""
    WITH RECURSIVE {_minhash_cand_ctes(pinned=True)},
    edges AS MATERIALIZED (
        SELECT id_a AS a, id_b AS b FROM cand
        UNION
        SELECT id_b AS a, id_a AS b FROM cand
    ),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        FROM reach GROUP BY a
    )
    SELECT doc_id, cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS cluster_size,
           CAST(doc_id = MIN(doc_id) OVER (PARTITION BY cluster_id) AS INT) AS keep
    FROM comp
    ORDER BY doc_id
    """


@register("dd_duplicate_clusters", oracle=_clusters_oracle_sql())
def dd_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS (operators/components.py): MinHash candidate
    pairs → connected components via min-label propagation with
    POINTER JUMPING (pairs alone under-merge transitive duplicates),
    with canonical keep-one-per-cluster flags. r11 flips
    ``pointer_jumping=True`` (VERDICT r10 item 1): the A/B on
    exactly this minhash pair graph measured 12 plain rounds vs 5
    jumped (4.74 vs 2.92 s, 1.6×; r11 re-measure 3.42 vs 2.04) —
    O(log D) rounds is the 100 TB
    path for this graph shape. The oracle reaches the same fixed
    point via a DuckDB recursive CTE over the poly31 candidate pairs
    (round-count-agnostic, so the flip is plan-only). Also
    equivalence-tested vs a Python union-find in
    tests/test_components.py."""
    from vectordb_light_spark.operators.components import duplicate_clusters
    from vectordb_light_spark.operators.dedup import (
        canonical_text,
        minhash_lsh_candidates,
    )

    docs = load_docs(spark, sf_dir).where(F.length(canonical_text("text")) > 0)
    # max_bucket=None: the recursive-CTE oracle models the uncapped
    # pair graph (see dd_minhash_candidates); the capped default is
    # scale-probe-tested separately.
    # min_est pushes the 0.75 threshold below the pair-dedup exchange
    # (r12): sub-threshold candidates never shuffle.
    pairs = minhash_lsh_candidates(
        docs, num_hashes=16, bands=4, hash_family="poly31",
        max_bucket=None, min_est=0.75,
    )
    return (
        duplicate_clusters(
            pairs, left_id="id_a", right_id="id_b", pointer_jumping=True
        )
        .withColumn("keep", F.col("keep").cast("int"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Relational surface extensions: semi/anti joins, set operations, cube
# grouping sets — SURVEY §2.7/§2.8 notes these as absent in the
# reference but free in Spark; exercised here so the engine's SQL
# surface is demonstrably complete.
# ---------------------------------------------------------------------------


@register(
    "rel_customer_activity",
    oracle="""
    WITH od AS (SELECT DISTINCT o_custkey FROM orders)
    SELECT n.n_name,
           COUNT(c.c_custkey) FILTER (WHERE od.o_custkey IS NOT NULL)
               AS n_active,
           COUNT(c.c_custkey) FILTER (WHERE od.o_custkey IS NULL)
               AS n_inactive
    FROM nation n
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    LEFT JOIN od ON c.c_custkey = od.o_custkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def rel_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins: per nation, customers WITH ≥1 order
    (left_semi) vs WITHOUT any (left_anti). Orders is projected to
    the join key only before either join, so each semi/anti probe
    streams the fact table against a key-only build; the tiny nation
    dim broadcasts onto the aggregated counts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    active = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    inactive = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )
    return (
        nation.join(active, nation.n_nationkey == active.c_nationkey, "left")
        .drop("c_nationkey")
        .join(inactive, nation.n_nationkey == inactive.c_nationkey, "left")
        .select(
            "n_name",
            F.coalesce("n_active", F.lit(0)).alias("n_active"),
            F.coalesce("n_inactive", F.lit(0)).alias("n_inactive"),
        )
        .orderBy("n_name")
    )


@register(
    "rel_user_retention",
    oracle="""
    WITH d AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
    b AS (SELECT MIN(day) AS fd, MAX(day) AS ld FROM d),
    a AS (SELECT DISTINCT user_id FROM d, b WHERE day = fd),
    z AS (SELECT DISTINCT user_id FROM d, b WHERE day = ld)
    SELECT 'both' AS segment, COUNT(*) AS n_users
    FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM z)
    UNION ALL
    SELECT 'first_only', COUNT(*)
    FROM (SELECT user_id FROM a EXCEPT SELECT user_id FROM z)
    UNION ALL
    SELECT 'last_only', COUNT(*)
    FROM (SELECT user_id FROM z EXCEPT SELECT user_id FROM a)
    ORDER BY segment
    """,
)
def rel_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (INTERSECT / EXCEPT — absent in the reference,
    SURVEY §2.8): users active on the corpus's first calendar day vs
    its last. Each set op compiles to a hash semi/anti join on the
    already-distinct day slices; the day bounds come from one tiny
    min/max scan collected driver-side (two scalars — not a join)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(F.to_date("ts").alias("day"), "user_id")
    lo, hi = d.agg(F.min("day"), F.max("day")).first()
    a = d.where(F.col("day") == F.lit(lo)).select("user_id").distinct()
    z = d.where(F.col("day") == F.lit(hi)).select("user_id").distinct()

    def seg(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("segment"), F.count(F.lit(1)).alias("n_users")
        )

    return (
        seg("both", a.intersect(z))
        .unionAll(seg("first_only", a.exceptAll(z)))
        .unionAll(seg("last_only", z.exceptAll(a)))
        .orderBy("segment")
    )


@register(
    "prof_events_cube",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day, value FROM events
    )
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(CAST(day AS VARCHAR), 'ALL') AS day,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM d
    GROUP BY CUBE(event_type, day)
    ORDER BY event_type, day
    """,
)
def prof_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (beyond prof_events_rollup's ROLLUP): all
    four (event_type × day) marginal combinations in ONE scan — Spark
    expands the grouping sets inside a single hash aggregate (with
    partial agg) instead of four scans unioned."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("event_type", F.to_date("ts").alias("day"), "value")
    return (
        d.cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("day").cast("string"), F.lit("ALL")).alias("day"),
            "n_events",
            "total_value",
        )
        .orderBy("event_type", "day")
    )


@register(
    "emb_doc_mean_pool",
    oracle="""
    WITH flat AS (
        SELECT vec_id % 16 AS group_id,
               generate_subscripts(embedding, 1) - 1 AS pos,
               unnest(embedding::DOUBLE[]) AS e
        FROM embeddings
    ),
    m AS (
        SELECT group_id, pos, AVG(e) AS mv FROM flat GROUP BY group_id, pos
    ),
    n AS (
        SELECT group_id, SQRT(SUM(mv * mv)) AS nrm FROM m GROUP BY group_id
    )
    SELECT m.group_id, m.pos, ROUND(m.mv / n.nrm, 6) AS val
    FROM m JOIN n USING (group_id)
    ORDER BY group_id, pos
    """,
)
def emb_doc_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk→document embedding pooling (functions/vector.py:
    mean_pool_vectors): element-wise mean per group, L2-renormalized.
    The exploded sum/count groupBy gets map-side partial aggregation,
    so the shuffle carries (group × dim) partials — skew-proof where
    a collect_list-of-arrays would shuffle every vector. Groups here
    are vec_id % 16 (a synthetic doc key); output is exploded to
    (group, pos, val) rows for the value-hash compare."""
    from vectordb_light_spark.functions.vector import mean_pool_vectors

    emb = load_table(spark, sf_dir, "embeddings")
    g = emb.select(
        F.pmod("vec_id", F.lit(16)).alias("group_id"), "embedding"
    )
    pooled = mean_pool_vectors(g, "group_id", "embedding", out_col="vec")
    return pooled.select(
        "group_id", F.posexplode("vec").alias("pos", "_v")
    ).select("group_id", "pos", F.round("_v", 6).alias("val")).orderBy(
        "group_id", "pos"
    )


@register(
    "ts_tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
        FROM documents
    ),
    t AS (SELECT * FROM tok WHERE term <> ''),
    tf AS (SELECT lang, term, COUNT(*) AS tf FROM t GROUP BY lang, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY term),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
        SELECT tf.lang, tf.term,
               tf.tf * LN((SELECT n FROM n)::DOUBLE / df.df) AS score
        FROM tf JOIN df USING (term)
    )
    SELECT lang,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY score DESC, term) AS INT) AS rank,
           term, ROUND(score, 4) AS score
    FROM scored
    QUALIFY rank <= 3
    ORDER BY lang, rank
    """,
)
def ts_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per language — corpus-level text analysis
    (task brief). One tokenize explode feeds both the per-lang TF agg
    and the distinct-doc DF agg (persisted, two consumers); the DF
    side aggregates to vocabulary size, so the join back is broadcast-
    able at any corpus scale. All JVM builtins — split/explode/agg —
    no Python in the plan."""
    from vectordb_light_spark.session import persist_if_batch

    docs = load_docs(spark, sf_dir, "doc_id", "text", "lang")
    n_docs = docs.count()
    tok = persist_if_batch(
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("term"),
        ).where(F.col("term") != "")
    )
    tf = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = tf.join(dfreq, "term").select(
        "lang",
        "term",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("score"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("lang", "rank", "term", F.round("score", 4).alias("score"))
        .orderBy("lang", "rank")
    )


@register(
    "st_clicks_attribution",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS buy_id, c.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_us,
           ROUND(p.value, 4) AS buy_value
    FROM events c
    JOIN events p ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ORDER BY click_id, buy_id
    """,
)
def st_clicks_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked STREAM-STREAM join (streaming/events.py:
    clicks_to_purchases_join): clicks attributed to same-user
    purchases within 30 minutes. This entry runs the REAL streaming
    query (two filtered branches of one file stream, availableNow →
    memory sink); the time-bounded predicate is what lets each side's
    join state be GC'd by the watermark on an unbounded stream. The
    oracle is the batch twin as plain SQL."""
    from vectordb_light_spark.streaming.events import (
        clicks_to_purchases_join,
        read_events_stream,
        run_stream_to_memory,
    )

    from vectordb_light_spark.streaming.events import bounded_state_partitions

    stream = read_events_stream(spark, sf_dir)
    joined = clicks_to_purchases_join(
        stream.where(F.col("event_type") == "click"),
        stream.where(F.col("event_type") == "purchase"),
        horizon="30 minutes",
    )
    with bounded_state_partitions(spark, 8):
        out = run_stream_to_memory(joined, "st_attr_q", output_mode="append")
    return out.select(
        "click_id",
        "buy_id",
        "user_id",
        (F.unix_micros("buy_ts") - F.unix_micros("click_ts")).alias("lag_us"),
        F.round("buy_value", 4).alias("buy_value"),
    ).orderBy("click_id", "buy_id")


@register("ann_pq_topk", oracle=_ANN_POOL_ORACLE)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (operators/similarity.py): 16×64 PQ
    codebooks (sampled-Lloyd trained), m-byte codes, asymmetric-
    distance top-k as a pure JVM lookup expression over the code
    column — the compressed-domain scan reads 16 bytes/vector instead
    of 256 — then EXACT re-rank of the top-50 ADC pool (the production
    default per ANN_EVAL.md: recall@10 ≥ 0.9 at < 10% relative scan
    cost). Trained index + argmin encode are iterative/numpy ⇒ the
    driver checks the pool-membership contract (worst measured
    exact-rank 11); recall and exact-ADC-parity are asserted in
    tests/test_similarity.py."""
    from vectordb_light_spark.operators.similarity import (
        add_pq_codes,
        ann_topk_pq,
        train_pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = _trained(
        (sf_dir, "pq16x64"),
        lambda: train_pq_codebooks(emb, m=16, n_codes=64, max_train=5_000),
    )
    q = _query_vector(spark, sf_dir, 0)
    coded = add_pq_codes(rebalance(emb), books)
    out = ann_topk_pq(coded, books, q, k=10, rerank_pool=50)
    return _ann_pool_contract(spark, sf_dir, out)


@register(
    "pipe_dsir_select",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(list_filter(string_split_regex(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+'),
                                  x -> x <> '')) AS t
        FROM documents
    ),
    b AS (
        SELECT doc_id, lang,
               CAST(CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 256 AS INT)
                   AS bucket
        FROM tok
    ),
    tgt AS (SELECT bucket, COUNT(*) AS ct FROM b WHERE lang = 'en' GROUP BY bucket),
    raw AS (SELECT bucket, COUNT(*) AS cr FROM b GROUP BY bucket),
    tot AS (SELECT (SELECT COUNT(*) FROM b WHERE lang = 'en') AS T,
                   (SELECT COUNT(*) FROM b) AS R),
    lr AS (
        SELECT raw.bucket,
               ln((COALESCE(tgt.ct, 0) + 1.0) / (tot.T + 256.0))
             - ln((raw.cr + 1.0) / (tot.R + 256.0)) AS logratio
        FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket, tot
    ),
    scored AS (
        SELECT b.doc_id, SUM(lr.logratio) AS score,
               CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM b JOIN lr ON b.bucket = lr.bucket
        GROUP BY b.doc_id
    )
    SELECT doc_id, ROUND(score, 6) AS dsir_score, n_tok,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
    FROM scored
    ORDER BY rank
    LIMIT 100
    """,
)
def pipe_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (operators/sampling.py
    dsir_importance_scores — Xie et al. NeurIPS 2023): rank the
    corpus by hashed-unigram importance toward the English subset —
    Σ log(p_target/p_raw) over 256 md5 token buckets, Laplace-
    smoothed. The bucket LM is one ≤256-row aggregate, scoring is a
    map-side element_at sum — zero UDFs, and the md5 buckets make the
    whole pipeline engine-replicable (verified margins: rank-100 cut
    gap 4.4e-4, ≥1e-9 from rounding boundaries vs ~1e-12 cross-engine
    ln drift). Top-100 selected; feed exp(score) to weighted_sample
    for the paper's resampling step."""
    from vectordb_light_spark.operators.sampling import dsir_importance_scores

    docs = load_docs(spark, sf_dir, "doc_id", "lang", "text")
    scored = dsir_importance_scores(docs, F.col("lang") == F.lit("en"))
    # TakeOrderedAndProject first (per-task heaps), THEN rank the
    # <=100 survivors — a partition-less window over the full scored
    # table would funnel every row through one task.
    top = scored.orderBy(F.col("dsir_score").desc(), "doc_id").limit(100)
    w = Window.orderBy(F.col("dsir_score").desc(), "doc_id")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "doc_id",
            F.round("dsir_score", 6).alias("dsir_score"),
            "n_tok",
            "rank",
        )
        .orderBy("rank")
    )


def _negative_samples_oracle_sql(seed=7, k=3, look=6, nb=8) -> str:
    """DuckDB twin of pipe_negative_samples: same md5 ring key and
    bucket split, the lead window unrolled into a struct list."""
    leads = ", ".join(
        f"{{'nid': lead(doc_id, {i}) OVER w, 'ng': lead(source, {i}) OVER w}}"
        for i in range(1, look + 1)
    )
    return f"""
    WITH staged AS (
        SELECT doc_id, source,
               md5(concat_ws(':', '{seed}', CAST(doc_id AS VARCHAR))) AS key,
               CAST(CAST(('0x' || substr(md5(concat_ws(':', '{seed}',
                    CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % {nb} AS INT)
                   AS bucket
        FROM documents
    ),
    led AS (
        SELECT doc_id, source, [{leads}] AS cands
        FROM staged
        WINDOW w AS (PARTITION BY bucket ORDER BY key, doc_id)
    ),
    picked AS (
        SELECT doc_id, source,
               list_slice(list_transform(
                   list_filter(cands, c -> c.nid IS NOT NULL
                               AND c.ng IS DISTINCT FROM source),
                   c -> CAST(c.nid AS VARCHAR)), 1, {k}) AS negs
        FROM led
    )
    SELECT doc_id, source,
           COALESCE(array_to_string(negs, ','), '') AS negatives,
           CAST(len(negs) AS INT) AS n_negatives
    FROM picked ORDER BY doc_id
    """


@register("pipe_negative_samples", oracle=_negative_samples_oracle_sql())
def pipe_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative sampling (operators/sampling.py
    ring_negative_samples): each document's 3 negatives are the next
    rows along a seeded-md5 ring, skipping same-source candidates
    (trivial positives). Rows hash into 8 independent per-bucket
    rings, so the ordering is a per-bucket window — one hash
    exchange, NO global single-partition sort at any scale."""
    from vectordb_light_spark.operators.sampling import ring_negative_samples

    docs = load_docs(spark, sf_dir, "doc_id", "source")
    return ring_negative_samples(
        docs, group_col="source", k=3, lookahead=6, n_buckets=8, seed=7
    ).orderBy("doc_id")


@register(
    "pipe_token_windows",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text, ' ')),
                                              '[ \t\n\x0B\f\r]+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    w AS (
        SELECT doc_id, s.i AS start,
               list_slice(toks, s.i + 1, s.i + 64) AS win
        FROM tok, UNNEST(generate_series(0, len(toks) - 1, 48)) AS s(i)
    )
    SELECT doc_id,
           CAST(start // 48 AS INT) AS window_index,
           CAST(len(win) AS INT) AS n_tokens,
           md5(array_to_string(win, ' ')) AS window_hash
    FROM w WHERE len(win) > 0
    ORDER BY doc_id, window_index
    """,
)
def pipe_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (operators/chunker.py
    split_token_windows): 64-token windows at stride 48 (16-token
    overlap) — the LLM pre-tokenization slicing, complementing the
    reference's CHARACTER chunker (T3) and the global sequence packer.
    Map-only codegen stage; output rows ≈ tokens/stride. Window
    content is hash-compared via md5 of the joined tokens (engine-
    neutral)."""
    from vectordb_light_spark.operators.chunker import split_token_windows

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    return split_token_windows(docs, window=64, stride=48).orderBy(
        "doc_id", "window_index"
    )


@register("ann_opq_topk", oracle=_ANN_POOL_ORACLE)
def ann_opq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ ANN (operators/similarity.py train_opq — Ge et al. CVPR
    2013): a learned orthogonal rotation minimizes PQ reconstruction
    error before the 16×64 codebooks, cutting ADC distortion at the
    SAME 16-byte scan cost as ann_pq_topk; the query rotates
    driver-side and the exact re-rank runs against the original
    vectors (the store never holds rotated floats). Alternating
    Procrustes/k-means training is iterative numpy ⇒ the driver
    checks the pool-membership contract (worst measured exact-rank
    10); orthogonality, PQ-degeneracy at zero iterations, objective
    improvement, and full-pool≡exact are asserted in
    tests/test_similarity.py."""
    from vectordb_light_spark.operators.similarity import (
        add_opq_codes,
        ann_topk_opq,
        train_opq,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    R, books = _trained(
        (sf_dir, "opq16x64"),
        lambda: train_opq(
            emb, m=16, n_codes=64, opq_iters=4, max_train=5_000
        ),
    )
    q = _query_vector(spark, sf_dir, 0)
    coded = add_opq_codes(rebalance(emb), R, books)
    out = ann_topk_opq(coded, R, books, q, k=10, rerank_pool=50)
    return _ann_pool_contract(spark, sf_dir, out)


@register(
    "mm_audio_windows",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id, n_chars * 10 AS duration_ms
        FROM documents
    ),
    w AS (
        SELECT media_id, duration_ms,
               UNNEST(range(0, CAST(duration_ms AS BIGINT), 2500)) AS gs
        FROM m
    )
    SELECT media_id,
           CAST(gs // 2500 AS INT) AS window_index,
           CAST(gs AS BIGINT) AS win_start_ms,
           CAST(LEAST(gs + 5000, duration_ms) AS BIGINT) AS win_end_ms
    FROM w
    ORDER BY media_id, window_index
    """,
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio segmentation plumbing (operators/multimodal.py:
    audio_windows): 5 s windows with 2.5 s hop per clip, boundaries
    from typed media metadata — pure builtins (explode(sequence));
    the stubbed PCM slice stage is exercised in tests, not here, so
    the oracle checks the window arithmetic end-to-end."""
    from vectordb_light_spark.operators.multimodal import (
        audio_windows,
        media_from_documents,
    )

    media = media_from_documents(spark, sf_dir, kind="audio")
    # no rebalance: with_pcm=False is all codegen builtins (no pandas
    # stage to widen for) and the RoundRobin exchange alone cost as
    # much as the query (r2 bench regression 0.50→1.02 s)
    return (
        audio_windows(media, with_pcm=False)
        .select(
            "media_id",
            "window_index",
            F.col("win_start_ms").cast("long").alias("win_start_ms"),
            F.col("win_end_ms").cast("long").alias("win_end_ms"),
        )
        .orderBy("media_id", "window_index")
    )


@register("ann_ivfpq_topk", oracle=_ANN_POOL_ORACLE)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF×PQ composed (operators/similarity.py:ann_topk_ivfpq): the
    centroid probe prunes which rows are read (partition pruning when
    stored partitionBy(cluster)), the PQ code prunes what is read per
    row — nprobe/k × m-bytes multiplied. Iterative trained index ⇒
    the driver checks the pool-membership contract (worst measured
    exact-rank 20); recall/equivalence asserted in tests."""
    from vectordb_light_spark.operators.similarity import (
        add_ivf_cluster,
        add_pq_codes,
        ann_topk_ivfpq,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _trained(
        (sf_dir, "ivf16"),
        lambda: train_ivf_centroids(emb, n_centroids=16, max_train=5_000),
    )
    books = _trained(
        (sf_dir, "pq16x64"),
        lambda: train_pq_codebooks(emb, m=16, n_codes=64, max_train=5_000),
    )
    q = _query_vector(spark, sf_dir, 0)
    indexed = add_pq_codes(add_ivf_cluster(rebalance(emb), cents), books)
    out = ann_topk_ivfpq(indexed, cents, books, q, k=10, nprobe=4)
    return _ann_pool_contract(spark, sf_dir, out)


@register(
    "rel_big_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def rel_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): a HAVING aggregate
    subquery feeding a semi-join-like filter, then a 3-way join and
    re-aggregation. The qty aggregate runs ONCE and serves both the
    filter and the output total (no second lineitem aggregation); at
    scale the big-order key set is tiny, so it re-enters the orders
    join as a broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 150)
    )
    return (
        orders.join(F.broadcast(qty), orders.o_orderkey == qty.l_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("_qty").cast("long").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "dd_containment_pairs",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           x -> x <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        FROM toks, LATERAL unnest(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3
    ),
    szs AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    df AS (SELECT s, COUNT(*) AS dfc FROM sh GROUP BY s),
    pairs AS (
        SELECT p1.doc_id AS doc_a, p2.doc_id AS doc_b, COUNT(*) AS shared
        FROM sh p1 JOIN sh p2 USING (s) JOIN df USING (s)
        WHERE dfc <= 20 AND p1.doc_id <> p2.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(shared * 1.0 / sa.n, 6) AS containment
    FROM pairs JOIN szs sa ON sa.doc_id = pairs.doc_a
    WHERE shared * 1.0 / sa.n >= 0.1
    ORDER BY doc_a, doc_b
    """,
)
def dd_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment (operators/dedup.py:
    containment_pairs): subset-duplicate pairs |A∩B|/|A| ≥ 0.1 over
    3-gram word shingles with a df≤20 stop-shingle prefilter — the
    prefilter bounds the posting self-join at max_df × postings, so
    the quadratic term never tracks corpus size."""
    from vectordb_light_spark.operators.dedup import containment_pairs

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    return containment_pairs(docs, threshold=0.1, max_df=20).orderBy(
        "doc_a", "doc_b"
    )


@register(
    "st_events_sliding",
    oracle="""
    WITH e AS (SELECT event_type, value, epoch_us(ts) AS tus FROM events),
    x AS (
        SELECT event_type, value,
               (tus // 10800000000) * 10800000000 - k * 10800000000 AS start_us
        FROM e, LATERAL UNNEST([0, 1]) AS t(k)
    )
    SELECT make_timestamp(start_us) AS window_start, event_type,
           COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
    FROM x
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def st_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING 6-hour windows hopping every 3 hours per event_type
    (streaming/events.py:sliding_event_counts) — each event lands in
    exactly window/slide = 2 epoch-aligned windows. The oracle
    derives both window starts per event arithmetically (floor-to-
    slide minus k·slide). Completes the window family next to the
    tumbling (st_events_window) and session (st_events_sessions)
    forms; the same expression runs under a watermark on the live
    stream (tests/test_streaming.py)."""
    from vectordb_light_spark.streaming.events import sliding_event_counts

    e = load_table(spark, sf_dir, "events")
    return sliding_event_counts(e, window="6 hours", slide="3 hours").orderBy(
        "window_start", "event_type"
    )


@register(
    "vq_filtered_topk",
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
    WHERE label = 3
    ORDER BY rank
    LIMIT 6
    """,
)
def vq_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRE-filtered vector search: the metadata predicate (label = 3)
    applies BEFORE top-k, so k survivors are guaranteed and the
    filter pushes into the parquet scan (PushedFilters) — the
    filtered-ANN feature every vector store needs, and the deliberate
    complement of the reference's post-top-k filters (Q5/Q8/Q9,
    vector_db_query.py:199-257), which can return < k rows and must
    NOT be pushed down. Both semantics are first-class here."""
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine

    q = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("label") == 3)
    out = topk_cosine(
        emb,
        q,
        # assume_normalized=False: the oracle's list_cosine_similarity
        # divides by both norms; the stored float32 vectors are only
        # ~1e-7 from unit, so the dot-only fast path drifts a rounding
        # ulp from the oracle (bit us at sf0.001). The fast path stays
        # covered by vq_topk_quantized + unit tests.
        SearchParams(k=6, threshold=0.0, assume_normalized=False),
        id_col="vec_id",
        vec_col="embedding",
    )
    return out.select(
        "vec_id",
        "label",
        F.round("similarity_score", 6).alias("similarity_score"),
        "rank",
    ).orderBy("rank")


@register(
    "vq_grouped_topk",
    oracle="""
    WITH scored AS (
        SELECT vec_id, label,
               ROUND(LEAST(GREATEST(list_cosine_similarity(
                   embedding::DOUBLE[],
                   (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
               ), 0.0), 1.0), 6) AS similarity_score
        FROM embeddings
    )
    SELECT label,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY label
               ORDER BY similarity_score DESC, vec_id ASC) AS INT) AS rank,
           vec_id, similarity_score
    FROM scored
    QUALIFY rank <= 3
    ORDER BY label, rank
    """,
)
def vq_grouped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP top-k similarity: the 3 nearest vectors to the query
    within every label — one scan, one shuffle on the group key, and
    Spark's WindowGroupLimit pushes the rank<=3 cut below the final
    sort so each task forwards at most k rows per group (the grouped
    analogue of TakeOrderedAndProject). A per-class nearest-example
    picker for curriculum/eval set construction."""
    from vectordb_light_spark.functions.vector import dot_product

    q = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    from vectordb_light_spark.session import literal_array

    qcol = literal_array(q, "double")
    scored = emb.select(
        "vec_id",
        "label",
        F.round(
            F.least(
                F.greatest(dot_product("embedding", qcol), F.lit(0.0)), F.lit(1.0)
            ),
            6,
        ).alias("similarity_score"),
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("similarity_score"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("label", "rank", "vec_id", "similarity_score")
        .orderBy("label", "rank")
    )


from vectordb_light_spark.operators.sampling import weighted_key_sql  # noqa: E402


@register(
    "pipe_weighted_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars FROM (
        SELECT doc_id, lang, n_chars,
               {weighted_key_sql("doc_id", "n_chars")} AS k
        FROM documents
        WHERE n_chars > 0
        ORDER BY k ASC, doc_id ASC
        LIMIT 100
    )
    ORDER BY doc_id
    """,
)
def pipe_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (operators/sampling.py:weighted_sample, Efraimidis–Spirakis key
    -ln(u)/w on the md5 routing hash): 100 docs drawn ∝ n_chars. The
    key is a map-side expression and selection is
    TakeOrderedAndProject — one scan at any corpus size; the oracle
    recomputes the identical key in DuckDB (same md5 bytes, same
    double arithmetic)."""
    from vectordb_light_spark.operators.sampling import weighted_sample

    docs = load_docs(spark, sf_dir, "doc_id", "lang", "n_chars")
    return weighted_sample(docs, 100, weight_col="n_chars").orderBy("doc_id")


@register(
    "rel_events_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(ts) AS ts_s FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS ts_c
        FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.ts_s
        WHERE e.event_type = 'click'
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS ts_p
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.ts_c
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    )
    SELECT * FROM (
        SELECT 1 AS step, 'signup' AS stage, COUNT(*) AS n_users FROM s
        UNION ALL
        SELECT 2, 'then_click', COUNT(*) FROM c
        UNION ALL
        SELECT 3, 'then_purchase', COUNT(*) FROM p
    )
    ORDER BY step
    """,
)
def rel_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: first signup → first click AFTER it → first
    purchase after that, counted per stage. Each stage is a per-user
    MIN aggregate joined to the previous stage's timestamp — three
    hash aggregates on user_id reusing one partitioning; the strict
    ts ordering makes it a true sequential funnel, not a bag-of-types
    count."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_after(etype: str, prev: DataFrame, prev_ts: str, out_ts: str):
        e = ev.where(F.col("event_type") == etype)
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts").alias(out_ts))
        return (
            e.join(prev, "user_id")
            .where(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    s = first_after("signup", None, "", "ts_s")
    c = first_after("click", s, "ts_s", "ts_c")
    p = first_after("purchase", c, "ts_c", "ts_p")

    def stage(step: int, name: str, df: DataFrame):
        return df.agg(
            F.lit(step).alias("step"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        stage(1, "signup", s)
        .unionAll(stage(2, "then_click", c))
        .unionAll(stage(3, "then_purchase", p))
        .orderBy("step")
    )


@register(
    "prof_events_corr",
    oracle="""
    SELECT event_type,
           ROUND(corr(value, CAST(json_extract_string(props, '$.k')
                 AS DOUBLE)), 6) AS corr_vk,
           ROUND(covar_samp(value, CAST(json_extract_string(props, '$.k')
                 AS DOUBLE)), 4) AS covar_vk,
           ROUND(stddev_samp(value), 4) AS sd_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def prof_events_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical profile per event_type: Pearson
    correlation, sample covariance and stddev between the value
    column and a JSON-extracted property — single-pass partial+final
    aggregation (corr/covar carry their moment sums map-side like any
    algebraic aggregate). The JSON extraction is STAGED as its own
    projection: inlined inside the three moment aggregates it bloats
    their buffer expressions enough to defeat codegen caching, which
    showed up as ~1.5s of replanning per build (measured)."""
    ev = load_table(spark, sf_dir, "events")
    staged = ev.select(
        "event_type", "value", F.from_json("props", "k double")["k"].alias("k")
    )
    return (
        staged.groupBy("event_type")
        .agg(
            F.round(F.corr("value", "k"), 6).alias("corr_vk"),
            F.round(F.covar_samp("value", "k"), 4).alias("covar_vk"),
            F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        )
        .orderBy("event_type")
    )


@register(
    "prof_value_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 25) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total
    FROM events
    GROUP BY 1
    ORDER BY bucket
    """,
)
def prof_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (bucket = floor(value/25)): the
    one-scan distribution profile a pipeline dashboard draws —
    map-side partial counts mean the shuffle carries one row per
    bucket per task regardless of data size."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.floor(F.col("value") / 25).cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .orderBy("bucket")
    )


@register(
    "rel_events_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT f.cohort_day,
           date_diff('day', f.cohort_day, a.day) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY cohort_day, day_offset
    """,
)
def rel_events_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by first-activity day,
    distinct-active counts per (cohort, day-offset) — the standard
    retention triangle. Both aggregates key on user_id, so the
    first-day aggregate, the activity distinct, and the join reuse
    one hash partitioning; the final count-distinct is Spark's
    two-phase partial distinct."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = ev.distinct()
    return (
        activity.join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "ts_bigram_lm_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           x -> x <> '') AS t
        FROM documents
    ),
    bg AS (
        SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
        FROM toks, LATERAL unnest(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    ws AS (SELECT w1, SUM(c) AS cw1 FROM bc GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT w2) AS nv FROM bg)
    SELECT bg.doc_id, bg.lang,
           ROUND(AVG(LN((bc.c + 1.0) / (ws.cw1 + (SELECT nv FROM v)))), 4)
               AS lm_score
    FROM bg JOIN bc USING (w1, w2) JOIN ws USING (w1)
    GROUP BY bg.doc_id, bg.lang
    ORDER BY bg.doc_id
    """,
)
def ts_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained bigram LM quality score (operators/
    profiling.py:bigram_lm_scores) — the LM-filter signal of training
    pipelines: improbable word sequences score low. One bigram
    explode feeds both the model counts and the scoring; model tables
    are vocabulary-sized so their joins broadcast."""
    from vectordb_light_spark.operators.profiling import bigram_lm_scores

    docs = load_docs(spark, sf_dir, "doc_id", "text", "lang")
    # NOT ordered_once (r12 measured negative, 1.25 vs 1.20 s
    # interleaved): the bucket-LM scoring re-enters via broadcast
    # below an exchange, so the sort's sampling pass is already cheap.
    return bigram_lm_scores(docs, extra_cols=("lang",)).orderBy("doc_id")


@register("ann_pca_topk", oracle=_ANN_POOL_ORACLE)
def ann_pca_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k in a PCA-reduced space (operators/similarity.py:
    train_pca_projection + project_vectors): 64→32 dims halves every
    downstream scan/shuffle/sketch byte; training is a sampled-
    covariance eigendecomposition on the driver (eigensolve ⇒ the
    driver checks the pool-membership contract; worst measured
    exact-rank 49); neighbor preservation asserted in tests."""
    import numpy as np

    from vectordb_light_spark.operators.search import SearchParams, topk_cosine
    from vectordb_light_spark.operators.similarity import (
        project_vectors,
        train_pca_projection,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    P = _trained((sf_dir, "pca32"), lambda: train_pca_projection(emb, 32))
    q = np.asarray(_query_vector(spark, sf_dir, 0)) @ P
    q = (q / max(float(np.linalg.norm(q)), 1e-12)).tolist()
    red = project_vectors(rebalance(emb), P)
    out = topk_cosine(
        red,
        q,
        SearchParams(k=10, threshold=0.0, assume_normalized=True),
        id_col="vec_id",
        vec_col="embedding",
    )
    return _ann_pool_contract(spark, sf_dir, out)


@register(
    "rel_orders_pareto",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT SUM(cents) AS t FROM rev),
    ranked AS (
        SELECT o_custkey, cents,
               CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS INT)
                   AS rank,
               SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                                ROWS UNBOUNDED PRECEDING) AS run
        FROM rev
    )
    SELECT rank, o_custkey,
           ROUND(cents / 100.0, 2) AS revenue,
           ROUND(run * 1.0 / (SELECT t FROM tot), 6) AS cum_share
    FROM ranked
    WHERE rank <= 20
    ORDER BY rank
    """,
)
def rel_orders_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / cumulative-share analysis: customers ranked by
    revenue with their running share of the total — window-over-
    aggregate (running SUM over an ordered aggregate). Revenue sums
    as integer cents so rank order and shares are bit-deterministic
    across engines; the total enters as one collected scalar, not a
    join."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    total = rev.agg(F.sum("cents")).first()[0]
    w = Window.orderBy(F.desc("cents"), F.asc("o_custkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn(
            "run", F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .where(F.col("rank") <= 20)
        .select(
            "rank",
            "o_custkey",
            F.round(F.col("cents") / 100.0, 2).alias("revenue"),
            F.round(F.col("run") / F.lit(float(total)), 6).alias("cum_share"),
        )
        .orderBy("rank")
    )


@register(
    "rel_forecast_revenue",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_delta
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def rel_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): a pure scan
    aggregate whose date/discount/quantity predicates ALL push into
    the parquet scan (PushedFilters carries every conjunct) — on a
    date-partitioned layout the year bound prunes whole directories
    before any IO. The simplest possible 100 TB query: zero joins,
    zero wide shuffles, one partial+final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.04, 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue_delta"
        ),
    )


@register(
    "pipe_corpus_shuffle",
    oracle=f"""
    SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY {bucket_sql("doc_id")}, doc_id) AS INT) AS pos,
           doc_id, lang
    FROM documents
    QUALIFY pos <= 50
    ORDER BY pos
    """,
)
def pipe_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle (operators/sampling.py:
    deterministic_shuffle): the reproducible pseudo-random global
    order a training run reads — md5-keyed, so any engine replays
    the identical permutation (first 50 positions checked against
    the oracle's identical ordering)."""
    from vectordb_light_spark.operators.sampling import deterministic_shuffle

    docs = load_docs(spark, sf_dir, "doc_id", "lang")
    shuffled = deterministic_shuffle(docs)
    w = Window.orderBy(
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("0"))).substr(
            1, 8
        ),
        F.col("doc_id"),
    )
    return (
        shuffled.withColumn("pos", F.row_number().over(w).cast("int"))
        .where(F.col("pos") <= 50)
        .select("pos", "doc_id", "lang")
        .orderBy("pos")
    )


def _curriculum_order_oracle_sql() -> str:
    """DuckDB twin of pipe_curriculum_order: the SAME quality-logit
    CTEs as ts_quality_classifier (shared helper — the score cannot
    drift), the same distinct-score rank CDF, the same integer stage
    division, the same md5 routing key."""
    return f"""
    WITH {_quality_logit_ctes()},
    cnt AS (SELECT logit_q, COUNT(*) AS c FROM s GROUP BY logit_q),
    cdf AS (
        SELECT logit_q,
               COALESCE(SUM(c) OVER (ORDER BY logit_q
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS below,
               SUM(c) OVER () AS total
        FROM cnt
    ),
    st AS (SELECT logit_q,
                  CAST((below * 10) // total + 1 AS INT) AS stage
           FROM cdf)
    SELECT s.doc_id,
           s.logit_q,
           st.stage,
           substr(md5(concat_ws(':', CAST(s.doc_id AS VARCHAR), '0')), 1, 8)
               AS curriculum_key
    FROM s JOIN st USING (logit_q)
    ORDER BY stage, curriculum_key, doc_id
    """


@register("pipe_curriculum_order", oracle=_curriculum_order_oracle_sql())
def pipe_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum corpus scheduling (Bengio et al. 2009 applied to
    training-data ordering; operators/sampling.py curriculum_order):
    documents are bucketed into 10 equal-population stages by
    ascending learned-quality logit (the ts_quality_classifier score —
    easy/low first), deterministically shuffled WITHIN each stage via
    the md5 routing key, and emitted in that global order. Stage
    assignment avoids the global row window an ntile would need: the
    exact rank CDF is built over the DISTINCT-score table (window over
    score VALUES — domain-sized, not corpus-sized), mapped with
    integer math (ties share a stage), and broadcast-joined back; the
    final order is ONE range exchange. No floats anywhere, so the SQL
    twin is bit-exact."""
    from vectordb_light_spark.functions.quality_weights import BIAS_Q, WEIGHTS_Q
    from vectordb_light_spark.operators.quality_model import (
        quality_classifier_scores,
    )
    from vectordb_light_spark.operators.sampling import curriculum_order

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    scores = quality_classifier_scores(docs, WEIGHTS_Q, BIAS_Q).select(
        "doc_id", "logit_q"
    )
    return curriculum_order(scores, score_col="logit_q", n_stages=10)


#: RE2 emulation of the Spark IPv4 pattern's Java ``\b`` (class-4 pin,
#: r10): no lookaround in RE2, so each boundary becomes a CONSUMED
#: capture group over the measured Java word class [\p{L}\p{Nd}_]
#: (+ ^/$), replaced back via \1/\3. One pass can miss an IP whose
#: left separator was consumed as the previous match's \3, so the
#: replace runs TWICE (misses are never adjacent: an IP that fails at
#: its own start can't also eat its right neighbour's separator) and
#: the count sums fresh matches across the two passes (scrubbed IPs
#: leave no digits, so pass 2 never double-counts). Equivalence
#: measured against Spark on 19 hand-built boundary cases (word-char
#: adjacency incl. the harness's "é10.0.0.1"/"10.0.0.2º" salts, NBSP
#: separators, comma chains, _ boundaries) — exact; a 400-case fuzz
#: over a deliberately degenerate dotted-digit alphabet shows the
#: RESIDUAL boundary: in chains like '.43.410.0.0.5.' the missed
#: leftmost match can overlap a later one and the two engines pick
#: different (equally pattern-valid) spans. That shape needs >=5
#: dot-joined octets with no intervening separator — impossible in
#: the graded corpus's ' from 10.0.N.7' injection and absent from the
#: harness's word-shaped salts (tests/test_adversarial_oracles.py
#: pins the reachable-shape agreement).
_PII_IP_B = r"(^|[^\p{L}\p{Nd}_])((?:[0-9]{1,3}\.){3}[0-9]{1,3})($|[^\p{L}\p{Nd}_])"

#: Same class-4 recipe for the SSN pattern's Java ``\b`` (r11,
#: ts_pii_scrub_extended): consumed capture groups over the Java word
#: class, 2-pass replace + 2-pass count. The SSN shape (fixed 11
#: chars, digits/dashes) has the same residual-boundary argument as
#: the IPv4 pin: a missed leftmost match needs its left separator
#: consumed by an overlapping earlier match, impossible in the graded
#: corpus's ' ssn 123-45-NNNN ' injection and absent from word-shaped
#: organic text.
_PII_SSN_B = r"(^|[^\p{L}\p{Nd}_])([0-9]{3}-[0-9]{2}-[0-9]{4})($|[^\p{L}\p{Nd}_])"


@register(
    "ts_pii_scrub",
    oracle=rf"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-0142 from 10.0.'
                    || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
        FROM documents
    ),
    ep AS (
        SELECT doc_id, t,
               regexp_replace(regexp_replace(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                   '\+?[0-9]{{1,3}}[-. ][0-9]{{3}}[-. ][0-9]{{4}}', '<PHONE>', 'g') AS s,
               regexp_replace(t, '{_PII_IP_B}', '\1<IP>\3', 'g') AS c1
        FROM aug
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(s,
               '{_PII_IP_B}', '\1<IP>\3', 'g'),
               '{_PII_IP_B}', '\1<IP>\3', 'g') AS text,
           CAST(len(regexp_extract_all(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(t,
               '\+?[0-9]{{1,3}}[-. ][0-9]{{3}}[-. ][0-9]{{4}}')) AS INT) AS n_phone,
           CAST(len(regexp_extract_all(t, '{_PII_IP_B}'))
              + len(regexp_extract_all(c1, '{_PII_IP_B}')) AS INT) AS n_ipv4
    FROM ep
    ORDER BY doc_id
    """,
)
def ts_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (functions/text.py scrub_pii): email / phone /
    IPv4 literals → typed placeholder tokens, plus per-kind match
    counts — the standard pre-training privacy pass. The synthetic
    corpus contains no organic PII, so the entry deterministically
    injects one of each per document (doc_id-derived) and scrubs the
    result; patterns live in the Java-regex ∩ RE2 dialect so the
    DuckDB twin evaluates them identically. Map-only JVM regex chain:
    no shuffle, no Python — scales as a pure scan."""
    from vectordb_light_spark.functions.text import pii_counts, scrub_pii

    docs = load_docs(spark, sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-0142 from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("t"),
    )
    counts = pii_counts("t")
    return aug.select(
        "doc_id",
        scrub_pii("t").alias("text"),
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
    ).orderBy("doc_id")


from vectordb_light_spark.functions.text import (
    _CARD_MAX_SPAN as _PII_CARD_SPAN,
    _CARD_MAX_VALID as _PII_CARD_CAP,
)

#: boundary-free MAXIMAL-run card candidate (functions/text.py
#: PII_PATTERNS_EXTENDED) — identical regex, identical semantics in
#: both engines, so no \b emulation needed for the split/extract
#: stages; unbounded upper so a long neighbor can never truncate a
#: card out of the window (the round's review finding).
_PII_CARD = r"[0-9][0-9 -]{11,}[0-9]"


@register(
    "ts_pii_scrub_extended",
    oracle=rf"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-0142 from 10.0.'
                    || CAST(doc_id % 256 AS VARCHAR) || '.7 ssn 123-45-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' card 4111 1111 1111 1111 ref '
                    || CAST(doc_id AS VARCHAR)
                    || ' pay 4111111111111111 '
                    || CAST(doc_id % 97 AS VARCHAR)
                    || ' order 1234567890123456 end' AS t
        FROM documents
    ),
    ep AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(t,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
                   '\+?[0-9]{{1,3}}[-. ][0-9]{{3}}[-. ][0-9]{{4}}', '<PHONE>', 'g') AS s0
        FROM aug
    ),
    ip AS (
        SELECT doc_id,
               regexp_replace(regexp_replace(s0,
                   '{_PII_IP_B}', '\1<IP>\3', 'g'),
                   '{_PII_IP_B}', '\1<IP>\3', 'g') AS s1
        FROM ep
    ),
    sn AS (
        SELECT doc_id, s1,
               regexp_replace(s1, '{_PII_SSN_B}', '\1<SSN>\3', 'g') AS s1a,
               regexp_replace(regexp_replace(s1,
                   '{_PII_SSN_B}', '\1<SSN>\3', 'g'),
                   '{_PII_SSN_B}', '\1<SSN>\3', 'g') AS s2
        FROM ip
    ),
    tok AS (
        SELECT doc_id, s1, s1a, s2,
               string_split_regex(s2, '{_PII_CARD}') AS pieces,
               regexp_extract_all(s2, '{_PII_CARD}') AS cands
        FROM sn
    ),
    cand AS (
        SELECT doc_id, unnest(cands) AS c,
               unnest(range(1, len(cands) + 1)) AS ord
        FROM tok
    ),
    grp AS (
        SELECT doc_id, ord, c,
               string_split_regex(c, '[ -]') AS g,
               regexp_extract_all(c, '[ -]') AS sp
        FROM cand
    ),
    rng AS (
        -- span-bounded ascending enumeration: a card has <=19 digits
        -- so a valid sub-run spans <=19 groups — ranges stay LINEAR
        -- in run length (_CARD_MAX_SPAN interpolated, ADVICE r11 low:
        -- the span constant must not drift from the Spark twin's)
        SELECT doc_id, ord, c, g, sp, len(g) AS k,
               unnest(flatten(list_transform(range(1, len(g) + 1), ri ->
                   list_transform(range(ri, least(ri + {_PII_CARD_SPAN - 1}, len(g)) + 1),
                       rj -> {{'i': ri, 'j': rj}})))) AS r
        FROM grp
    ),
    ver AS (
        SELECT doc_id, ord, c, g, sp, k, r.i AS ri, r.j AS rj,
               array_to_string(g[r.i:r.j], '') AS d
        FROM rng
    ),
    ok0 AS (
        SELECT *
        FROM ver
        WHERE length(d) BETWEEN 13 AND 19
          AND list_sum(list_transform(range(1, length(d) + 1), li ->
                CASE WHEN (length(d) - li) % 2 = 1
                     THEN CASE WHEN CAST(d[li] AS INT) * 2 < 10
                               THEN CAST(d[li] AS INT) * 2
                               ELSE CAST(d[li] AS INT) * 2 - 9 END
                     ELSE CAST(d[li] AS INT) END)) % 10 = 0
    ),
    -- the Spark twin's adversarial-soup bound (_CARD_MAX_VALID,
    -- interpolated so the spellings cannot drift): only the first
    -- {_PII_CARD_CAP} valid ranges (enumeration order: i ASC, j ASC)
    -- enter conflict resolution
    ok AS (
        SELECT * FROM ok0
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY doc_id, ord ORDER BY ri ASC, rj ASC)
            <= {_PII_CARD_CAP}
    ),
    -- SEQUENTIAL GREEDY conflict policy (ADVICE r11, the Spark
    -- twin's exact rule): sort valid ranges (i ASC, j DESC) and
    -- fold left-to-right keeping each range whose start clears the
    -- last KEPT range's end — dominance against CHOSEN ranges only,
    -- so a dominated straddling decoy can no longer shadow a real
    -- card. list_sort's natural struct order gives (i ASC, nj ASC)
    -- = (i ASC, j DESC); list_reduce has no initial value in this
    -- engine, so each element is lifted to the accumulator shape
    -- {{'j': last-kept-end, 'ch': chosen-so-far}} first.
    gsel AS (
        SELECT doc_id, ord,
               list_reduce(
                   list_transform(
                       list_sort(list_transform(
                           list({{'i': ri, 'j': rj}}),
                           r -> {{'i': r.i, 'nj': -r.j}})),
                       s -> {{'j': -s.nj,
                              'ch': [{{'i': s.i, 'j': -s.nj}}]}}
                   ),
                   (acc, x) -> CASE WHEN x.ch[1].i > acc.j
                       THEN {{'j': x.ch[1].j,
                              'ch': list_append(acc.ch, x.ch[1])}}
                       ELSE acc END
               ).ch AS ch
        FROM ok GROUP BY doc_id, ord
    ),
    gu AS (
        SELECT doc_id, ord, unnest(ch) AS u FROM gsel
    ),
    chosen AS (
        SELECT doc_id, ord, u.i AS ri, u.j AS rj FROM gu
    ),
    slots AS (
        SELECT doc_id, ord, c, g, sp, len(g) AS k,
               unnest(range(1, len(g) + 1)) AS t
        FROM grp
    ),
    parts AS (
        SELECT s.doc_id, s.ord, s.t,
               CASE WHEN EXISTS (SELECT 1 FROM chosen c2
                       WHERE c2.doc_id = s.doc_id AND c2.ord = s.ord
                         AND c2.ri = s.t) THEN '<CARD>'
                    WHEN EXISTS (SELECT 1 FROM chosen c2
                       WHERE c2.doc_id = s.doc_id AND c2.ord = s.ord
                         AND c2.ri < s.t AND s.t <= c2.rj) THEN ''
                    ELSE s.g[s.t] END
               ||
               CASE WHEN s.t < s.k AND NOT EXISTS (SELECT 1 FROM chosen c2
                       WHERE c2.doc_id = s.doc_id AND c2.ord = s.ord
                         AND c2.ri <= s.t AND s.t < c2.rj)
                    THEN COALESCE(s.sp[s.t], '') ELSE '' END AS part
        FROM slots s
    ),
    nhit AS (
        SELECT doc_id, ord, COUNT(*) AS hits
        FROM chosen GROUP BY doc_id, ord
    ),
    rewritten AS (
        SELECT cand.doc_id, cand.ord,
               CASE WHEN COALESCE(nhit.hits, 0) = 0 THEN cand.c
                    ELSE (SELECT string_agg(p.part, '' ORDER BY p.t)
                          FROM parts p
                          WHERE p.doc_id = cand.doc_id
                            AND p.ord = cand.ord)
               END AS rc,
               COALESCE(nhit.hits, 0) AS hit
        FROM cand LEFT JOIN nhit
          ON cand.doc_id = nhit.doc_id AND cand.ord = nhit.ord
    ),
    reasm AS (
        SELECT doc_id, list(rc ORDER BY ord) AS rcs,
               CAST(SUM(hit) AS INT) AS n_card
        FROM rewritten GROUP BY doc_id
    )
    SELECT tok.doc_id,
           array_to_string(list_transform(range(1, len(pieces) + 1),
               pi -> pieces[pi] || COALESCE(rcs[pi], '')), '') AS text,
           CAST(len(regexp_extract_all(s1, '{_PII_SSN_B}'))
              + len(regexp_extract_all(s1a, '{_PII_SSN_B}')) AS INT) AS n_ssn,
           CAST(COALESCE(n_card, 0) AS INT) AS n_card
    FROM tok LEFT JOIN reasm USING (doc_id)
    ORDER BY tok.doc_id
    """,
)
def ts_pii_scrub_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended-tier PII redaction (functions/text.py scrub_pii
    extended=True, VERDICT r10 item 4): email / phone / IPv4, plus
    SSNs and LUHN-VERIFIED card numbers — redaction that keeps
    Luhn-invalid order ids and digit runs merely adjacent to a card
    (the ADVICE r10 sub-run rescan). The injection plants, per
    document: a grouped valid card, an ungrouped valid card with an
    ADJACENT doc_id-derived digit run (the merged-window regression
    shape), a Luhn-invalid 16-digit order id, and a doc_id-derived
    SSN. The card candidate pattern is a boundary-free MAXIMAL run
    (exact common dialect, no char cap — a long neighbor can never
    truncate a card out of the window); the SSN Java-\\b is pinned
    via the 2-pass consumed capture-group emulation (`_PII_SSN_B`,
    the `_PII_IP_B` recipe). The DuckDB twin re-runs the
    separator-aligned multi-sub-run search row-wise (unnest
    candidates → span-bounded range enumeration → Luhn via
    list_transform/list_sum → sequential-greedy fold (ADVICE r11:
    leftmost-longest against CHOSEN ranges only) → per-slot
    stitch); Spark runs the identical policy as nested JVM
    higher-order functions. Map-only either way: no shuffle, no
    Python, scales as a pure scan."""
    from vectordb_light_spark.functions.text import (
        PII_PATTERNS_EXTENDED,
        count_card_numbers,
        scrub_card_numbers,
    )

    docs = load_docs(spark, sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-0142 from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 ssn 123-45-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" card 4111 1111 1111 1111 ref "),
            F.col("doc_id").cast("string"),
            F.lit(" pay 4111111111111111 "),
            (F.col("doc_id") % 97).cast("string"),
            F.lit(" order 1234567890123456 end"),
        ).alias("t"),
    )
    patterns = {k: (p, tok) for k, p, tok in PII_PATTERNS_EXTENDED}
    s1 = F.col("t")
    for kind in ("email", "phone", "ipv4"):
        pat, token = patterns[kind]
        s1 = F.regexp_replace(s1, pat, token)
    ssn_pat, ssn_token = patterns["ssn"]
    s2 = F.regexp_replace(s1, ssn_pat, ssn_token)
    # r12: ordered_once — the range sampling otherwise runs the whole
    # span-bounded Luhn search twice (measured as duplicated jobs).
    return ordered_once(
        aug.select(
            "doc_id",
            scrub_card_numbers(s2).alias("text"),
            F.size(
                F.regexp_extract_all(s1, F.lit(ssn_pat), F.lit(0))
            ).alias("n_ssn"),
            count_card_numbers(s2).alias("n_card"),
        ),
        "doc_id",
    )


@register(
    "pipe_decontaminate",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+') AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               CASE WHEN len(toks) <= 4 THEN [array_to_string(toks, ' ')]
                    ELSE list_transform(generate_series(1, len(toks) - 3),
                                        i -> array_to_string(toks[i:i+3], ' '))
               END AS grams
        FROM tok
    ),
    bg AS (
        SELECT DISTINCT md5(gram) AS gk
        FROM (SELECT unnest(grams) AS gram FROM g WHERE doc_id < 10)
    ),
    tg AS (
        SELECT doc_id, md5(gram) AS gk
        FROM (SELECT doc_id, unnest(list_distinct(grams)) AS gram
              FROM g WHERE doc_id >= 10)
    ),
    hits AS (
        SELECT doc_id, COUNT(DISTINCT gk) AS n
        FROM tg WHERE gk IN (SELECT gk FROM bg) GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(n, 0) AS n_shared_grams,
           CAST(COALESCE(n, 0) > 0 AS INT) AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id >= 10) d
    LEFT JOIN hits ON d.doc_id = hits.doc_id
    ORDER BY d.doc_id
    """,
)
def pipe_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (dedup.py ngram_contamination): count
    token 4-grams each train document (doc_id ≥ 10) shares with the
    benchmark slice (doc_id < 10) — the GPT-3-style leakage check a
    training pipeline runs before every mix. Gram keys are md5 of the
    gram text: fixed-width shuffle keys (never gram strings), JVM
    builtin, and DuckDB-replicable; the benchmark key set is distinct
    + broadcast (eval sets are tiny next to a 100 TB corpus)."""
    from vectordb_light_spark.operators.dedup import ngram_contamination

    docs = load_docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") < 10)
    train = docs.where(F.col("doc_id") >= 10)
    return (
        ngram_contamination(train, bench, n=4)
        .withColumn("contaminated", F.col("contaminated").cast("int"))
        .orderBy("doc_id")
    )


@register(
    "pipe_bloom_decontaminate",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+') AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               CASE WHEN len(toks) <= 4 THEN [array_to_string(toks, ' ')]
                    ELSE list_transform(generate_series(1, len(toks) - 3),
                                        i -> array_to_string(toks[i:i+3], ' '))
               END AS grams
        FROM tok
    ),
    bp AS (
        SELECT CAST(('0x' || substr(md5(gram), 1 + 8 * u.i, 8))
                    AS BIGINT) % 65536 AS p
        FROM (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 10),
             UNNEST([0, 1, 2, 3]) AS u(i)
    ),
    w AS (
        SELECT CAST(p // 32 AS INT) AS wi,
               bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS word
        FROM bp GROUP BY 1
    ),
    tg AS (
        SELECT doc_id, len(list_distinct(grams)) AS n_grams,
               unnest(list_distinct(grams)) AS gram
        FROM g WHERE doc_id >= 10
    ),
    tp AS (
        SELECT doc_id, n_grams, gram,
               CAST(('0x' || substr(md5(gram), 1 + 8 * u.i, 8))
                    AS BIGINT) % 65536 AS p
        FROM tg, UNNEST([0, 1, 2, 3]) AS u(i)
    ),
    tb AS (
        SELECT doc_id, n_grams, gram,
               MIN(CASE WHEN (COALESCE(w.word, 0)
                              & (1::BIGINT << CAST(p % 32 AS INT))) <> 0
                        THEN 1 ELSE 0 END) AS allset
        FROM tp LEFT JOIN w ON CAST(p // 32 AS INT) = w.wi
        GROUP BY doc_id, n_grams, gram
    )
    SELECT doc_id,
           CAST(n_grams AS INT) AS n_grams,
           CAST(SUM(allset) AS INT) AS n_hits,
           CAST(SUM(allset) > 0 AS INT) AS contaminated
    FROM tb GROUP BY doc_id, n_grams
    ORDER BY doc_id
    """,
)
def pipe_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination via a deterministic Bloom filter (Bloom 1970 as
    large-corpus pipelines run it; operators/dedup.py bloom_build +
    bloom_decontaminate): the benchmark slice's token 4-grams build a
    2^16-bit / 4-hash filter — ONE bounded bit_or aggregate, 16 KiB
    regardless of benchmark size — and every train document probes it
    INSIDE one projection: the word array is a literal, n_hits is
    size(filter(distinct grams, all k bits set)) as nested
    higher-order builtins. No join, no shuffle, no UDF at probe time;
    at 100 TB the probe costs exactly the text scan, and the filter
    stays constant memory where pipe_decontaminate's exact key set
    grows with the benchmark. Bit positions are md5-hex integer math,
    so the SQL twin reproduces the filter — deterministic false
    positives included — bit-for-bit."""
    from vectordb_light_spark.operators.dedup import (
        bloom_build,
        bloom_decontaminate,
    )

    docs = load_docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") < 10)
    train = docs.where(F.col("doc_id") >= 10)
    words = bloom_build(bench, n=4)
    return bloom_decontaminate(train, words, n=4).orderBy("doc_id")


@register(
    "pipe_semantic_decontaminate",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text, ' ')),
                                         '[ \t\n\x0B\f\r]+')) AS t
        FROM documents
    ),
    w AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 1024 AS bucket,
               CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(t), 9, 1)) AS BIGINT)
                             % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS weight
        FROM tok WHERE t <> '' GROUP BY doc_id, bucket
    ),
    w2 AS (SELECT * FROM w WHERE weight != 0),
    norms AS (
        SELECT doc_id, sqrt(CAST(SUM(weight * weight) AS BIGINT)) AS n
        FROM w2 GROUP BY doc_id
    ),
    cw AS (SELECT * FROM w2 WHERE doc_id % 17 != 0),
    bw AS (SELECT * FROM w2 WHERE doc_id % 17 = 0),
    dots AS (
        SELECT c.doc_id AS ca, b.doc_id AS cb,
               CAST(SUM(c.weight * b.weight) AS BIGINT) AS dot
        FROM cw c JOIN bw b ON c.bucket = b.bucket GROUP BY ca, cb
    ),
    cos AS (
        SELECT ca, dot / (na.n * nb.n) AS c
        FROM dots
        JOIN norms na ON dots.ca = na.doc_id
        JOIN norms nb ON dots.cb = nb.doc_id
        WHERE dot / (na.n * nb.n) >= 0.85
    ),
    hits AS (
        SELECT ca, CAST(COUNT(*) AS INT) AS nm, ROUND(MAX(c), 6) AS mc
        FROM cos GROUP BY ca
    )
    SELECT d.doc_id,
           COALESCE(nm, 0) AS n_matches,
           COALESCE(mc, 0.0) AS max_cosine,
           nm IS NULL AS keep
    FROM (SELECT doc_id FROM documents WHERE doc_id % 17 != 0) d
    LEFT JOIN hits ON d.doc_id = hits.ca
    ORDER BY d.doc_id
    """,
)
def pipe_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC eval-set decontamination — the embedding sibling of
    pipe_decontaminate's n-gram check (paraphrased leakage that shares
    no exact 4-gram still lands at high embedding cosine): corpus docs
    (doc_id % 17 != 0) are flagged when any benchmark doc (% 17 == 0)
    sits at feature-hash cosine ≥ 0.85 (dim 1024: on real
    vocabularies the hash width is the exchange-volume lever —
    fan-out = |bench postings| / min(dim, vocab) — and on this
    31-token corpus it sharpens the embedding instead, collapsing 33k
    near-threshold collision matches to 5k; see SCALING.md
    "hash-space selectivity" for the measured sweep)
    (operators/similarity.py sparse_cosine_matches — inverted-index
    equi-join, benchmark side broadcast: the corpus never shuffles for
    the join; the only corpus-sized exchange is the dot aggregation,
    bounded by true term overlap). Integer weights ⇒ exact cross-
    engine cosines (verified margins: all-pairs threshold gap 4.2e-5,
    rounding gap 2.6e-8 — far above ~1e-15 engine drift). Filter
    ``keep`` before training; 31 contaminated docs at sf0.01."""
    from vectordb_light_spark.functions.embedding import feature_hash_weights
    from vectordb_light_spark.operators.similarity import sparse_cosine_matches

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 17 != 0)
    bench = docs.where(F.col("doc_id") % 17 == 0)
    matches = sparse_cosine_matches(
        feature_hash_weights(corpus, dim=1024),
        feature_hash_weights(bench, dim=1024),
        id_col="doc_id",
        term_col="bucket",
        weight_col="weight",
        threshold=0.85,
    )
    hits = matches.groupBy("id_a").agg(
        F.count(F.lit(1)).cast("int").alias("n_matches"),
        F.round(F.max("cosine"), 6).alias("max_cosine"),
    )
    # r12: ordered_once — the range sampling otherwise re-runs the
    # dot-aggregation → norms-join → hits pipeline a second time.
    return ordered_once(
        corpus.select("doc_id")
        .join(hits.withColumnRenamed("id_a", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            F.coalesce("max_cosine", F.lit(0.0)).alias("max_cosine"),
            F.col("n_matches").isNull().alias("keep"),
        ),
        "doc_id",
    )


@register(
    "ts_repetition_filter",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+') AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id, len(toks) AS n_tokens,
               CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                    ELSE list_transform(generate_series(1, len(toks) - 2),
                                        i -> array_to_string(toks[i:i+2], ' '))
               END AS grams
        FROM tok
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(len(grams) AS INT) AS n_grams,
           CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
           ROUND(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 6)
               AS dup_frac,
           CAST(1.0 - len(list_distinct(grams))::DOUBLE / len(grams) > 0.05
               AS INT) AS repetitive
    FROM g
    ORDER BY doc_id
    """,
)
def ts_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition filter (the Gopher/MassiveText
    duplicate-n-gram heuristic): fraction of token 3-grams that are
    repeats of an earlier gram in the SAME document; documents above
    the bar get flagged (generated/spammy text repeats heavily).
    All JVM builtins over one scan — split, slide, array_distinct —
    no shuffle, no Python: the cheapest quality gate in the corpus
    pipeline and a pure map at any scale."""
    from vectordb_light_spark.operators.dedup import (
        ngram_tokens,
        token_ngrams_from_tokens,
    )

    docs = load_docs(spark, sf_dir)
    g = docs.select(
        "doc_id", ngram_tokens(F.col("text")).alias("__toks")
    ).select(
        "doc_id",
        F.size("__toks").alias("n_tokens"),
        token_ngrams_from_tokens(F.col("__toks"), 3).alias("grams"),
    )
    dup = 1.0 - F.size(F.array_distinct("grams")).cast("double") / F.size("grams")
    return g.select(
        "doc_id",
        "n_tokens",
        F.size("grams").alias("n_grams"),
        F.size(F.array_distinct("grams")).alias("n_distinct"),
        F.round(dup, 6).alias("dup_frac"),
        (dup > 0.05).cast("int").alias("repetitive"),
    ).orderBy("doc_id")



@register(
    "prof_events_pivot",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           COUNT(*) AS total
    FROM events
    GROUP BY day
    ORDER BY day
    """,
)
def prof_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: long→wide event counts per day with an EXPLICIT value
    list — `pivot(col, values)` skips the extra distinct-values scan
    Spark otherwise runs, and compiles to ONE hash aggregate with a
    CASE per output column (the oracle is that same CASE expansion).
    Wide marts from long event logs are a pure one-exchange shape at
    any scale."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.withColumn("day", F.col("ts").cast("date"))
        .groupBy("day")
        .pivot("event_type", kinds)
        .count()
    )
    totals = (
        ev.withColumn("day", F.col("ts").cast("date"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("total"))
    )
    out = wide.join(totals, "day")
    return out.select(
        "day", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds], "total"
    ).orderBy("day")



@register(
    "pipe_token_budget_mix",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split_regex(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+'),
                                    x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MAX(doc_id) AS last_doc
    FROM c WHERE cum <= 5000
    GROUP BY source
    ORDER BY source
    """,
)
def pipe_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted corpus mixing: real LLM data mixes are specced
    in TOKENS per source, not documents — each source contributes
    documents in deterministic (doc_id) order until its running token
    count hits the budget (5k here). One window cumsum per source
    partition + a filter; at scale the per-source prefix sum is the
    same two-phase pattern as pipe_sequence_pack when a source spans
    many partitions."""
    docs = load_docs(spark, sf_dir, "doc_id", "text", "source")
    toks = F.size(
        F.filter(F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != "")
    ).cast("long")
    t = docs.select("doc_id", "source", toks.alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.where(F.col("cum") <= 5000)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Registry ordering
# ---------------------------------------------------------------------------

#: Round-6 grading-order policy (VERDICT r5 item 1). The correctness
#: driver grades a ~50-entry prefix of this order each round, so the
#: order is COMPUTED from checked-in state, front-loading staleness:
#:   (a) oracle-backed entries whose latest driver row PREDATES their
#:       oracle (they have literally never been driver-graded against
#:       it) — `_PRE_ORACLE_STALE`;
#:   (b) entries new or implementation-changed this round —
#:       `_CHANGED_THIS_ROUND` (new entries have no `_LAST_GRADED`
#:       row and land here automatically);
#:   (c) everything else by ASCENDING last-graded round (oldest
#:       driver signal re-earns its row first), cheapest-first within
#:       a round so a time-capped driver still covers most of a block.
#: `_LAST_GRADED` = latest round with any driver row per entry
#: (rebuilt each round from CORRECTNESS_r0*.json); `_SOLO_COST_S` =
#: sf0.1 solo seconds from the latest full bench (tiebreak only).
#: `tests/test_plan_guards.py` recomputes the order from these maps
#: and asserts the policy holds.

_LAST_GRADED = {
    'ann_ivf_topk': 12,
    'ann_ivfpq_topk': 11,
    'ann_opq_topk': 9,
    'ann_pca_topk': 12,
    'ann_pq_topk': 11,
    'ann_recall_contract': 12,
    'ann_srp_topk': 10,
    'ann_topk_join': 10,
    'dd_containment_pairs': 10,
    'dd_cross_corpus_candidates': 12,
    'dd_duplicate_clusters': 12,
    'dd_duplicate_groups': 11,
    'dd_embedding_near_dups': 10,
    'dd_exact_dedup': 12,
    'dd_image_near_dups': 12,
    'dd_jaccard_pairs': 12,
    'dd_line_dedup': 10,
    'dd_minhash_candidates': 12,
    'dd_remove_boilerplate': 12,
    'dd_repeated_spans': 11,
    'dd_semantic_dedup': 12,
    'dd_simhash_near_dups': 12,
    'dd_strip_repeated_spans': 11,
    'dq_events_constraints': 10,
    'emb_doc_mean_pool': 11,
    'emb_feature_hash_topk': 12,
    'emb_mini_encoder_topk': 9,
    'kw_bm25_topk': 12,
    'kw_hybrid_rrf': 12,
    'mm_audio_features': 12,
    'mm_audio_windows': 10,
    'mm_frame_counts': 10,
    'mm_image_decode': 12,
    'mm_image_pipeline': 12,
    'mm_jpeg_decode': 12,
    'mm_video_frames': 12,
    'pipe_bloom_decontaminate': 11,
    'pipe_bpe_encode': 12,
    'pipe_bpe_merges': 12,
    'pipe_cdc_chunks': 12,
    'pipe_chunk_fixed': 10,
    'pipe_chunk_normalized': 12,
    'pipe_corpus_mix': 10,
    'pipe_corpus_shuffle': 11,
    'pipe_corpus_split': 10,
    'pipe_curate_chain': 12,
    'pipe_curate_split_chain': 12,
    'pipe_curriculum_order': 12,
    'pipe_decontaminate': 11,
    'pipe_doc_hash': 11,
    'pipe_domain_mix': 10,
    'pipe_dsir_select': 10,
    'pipe_hash_embed_topk': 9,
    'pipe_leakage_safe_split': 12,
    'pipe_negative_samples': 10,
    'pipe_pdf_page_chunks': 12,
    'pipe_semantic_decontaminate': 12,
    'pipe_sequence_pack': 10,
    'pipe_stratified_take': 11,
    'pipe_temperature_mix': 10,
    'pipe_token_budget_mix': 11,
    'pipe_token_windows': 12,
    'pipe_training_corpus': 9,
    'pipe_url_dedup': 10,
    'pipe_weighted_sample': 10,
    'prof_corpus_quantiles': 10,
    'prof_events_corr': 11,
    'prof_events_cube': 10,
    'prof_events_pivot': 11,
    'prof_events_rollup': 10,
    'prof_events_sketch': 11,
    'prof_sketch_accuracy': 10,
    'prof_value_histogram': 10,
    'rel_big_orders': 10,
    'rel_customer_activity': 11,
    'rel_events_asof': 10,
    'rel_events_cohorts': 12,
    'rel_events_funnel': 11,
    'rel_events_gapfill': 11,
    'rel_events_gaps': 11,
    'rel_events_interval': 11,
    'rel_events_json': 11,
    'rel_events_moving_avg': 12,
    'rel_events_scd2': 11,
    'rel_forecast_revenue': 10,
    'rel_join_nation_customers': 10,
    'rel_orders_pareto': 12,
    'rel_pricing_summary': 11,
    'rel_region_volume': 11,
    'rel_scd2_merge': 11,
    'rel_sessions_overlap': 10,
    'rel_shipping_priority': 11,
    'rel_top_orders_by_revenue': 12,
    'rel_user_retention': 11,
    'rel_window_order_rank': 10,
    'sim_cosine_pairs_exact': 12,
    'sim_sparse_cosine_pairs': 12,
    'skew_salted_user_join': 11,
    'src_binary_roundtrip': 12,
    'src_markup_roundtrip': 12,
    'src_office_roundtrip': 12,
    'st_clicks_attribution': 10,
    'st_events_dedup': 11,
    'st_events_sessions': 9,
    'st_events_sliding': 10,
    'st_events_window': 10,
    'st_heavy_hitters': 10,
    'st_user_running_totals': 10,
    'st_windowed_quantiles': 9,
    'ts_bigram_lm_score': 10,
    'ts_c4_filter': 12,
    'ts_gopher_filter': 12,
    'ts_lang_id': 12,
    'ts_pii_scrub': 10,
    'ts_pii_scrub_extended': 12,
    'ts_quality_classifier': 12,
    'ts_quality_score': 12,
    'ts_readability': 10,
    'ts_repetition_filter': 11,
    'ts_text_stats': 11,
    'ts_tfidf_top_terms': 10,
    'ts_vocab_topk': 11,
    'ts_winnow_fingerprints': 12,
    'vq_batch_topk': 12,
    'vq_chunks_only': 12,
    'vq_citations': 11,
    'vq_filtered_topk': 11,
    'vq_grouped_topk': 11,
    'vq_mmr_rerank': 10,
    'vq_postfilters': 11,
    'vq_rag_prompt': 12,
    'vq_range_search': 10,
    'vq_threshold_after_topk': 11,
    'vq_topk_cosine': 11,
    'vq_topk_quantized': 11,
}

_SOLO_COST_S = {
    'ann_ivf_topk': 0.715,
    'ann_ivfpq_topk': 1.41,
    'ann_opq_topk': 1.615,
    'ann_pca_topk': 0.855,
    'ann_pq_topk': 1.498,
    'ann_recall_contract': 6.442,
    'ann_srp_topk': 0.684,
    'ann_topk_join': 1.598,
    'dd_containment_pairs': 1.855,
    'dd_cross_corpus_candidates': 1.646,
    'dd_duplicate_clusters': 3.961,
    'dd_duplicate_groups': 0.423,
    'dd_embedding_near_dups': 1.423,
    'dd_exact_dedup': 0.701,
    'dd_image_near_dups': 4.257,
    'dd_jaccard_pairs': 0.579,
    'dd_line_dedup': 0.803,
    'dd_minhash_candidates': 1.169,
    'dd_remove_boilerplate': 1.031,
    'dd_repeated_spans': 1.036,
    'dd_semantic_dedup': 2.608,
    'dd_simhash_near_dups': 2.922,
    'dd_strip_repeated_spans': 1.436,
    'dq_events_constraints': 0.484,
    'emb_doc_mean_pool': 0.313,
    'emb_feature_hash_topk': 0.968,
    'emb_mini_encoder_topk': 1.212,
    'kw_bm25_topk': 0.684,
    'kw_hybrid_rrf': 1.103,
    'mm_audio_features': 1.44,
    'mm_audio_windows': 0.228,
    'mm_frame_counts': 0.222,
    'mm_image_decode': 1.582,
    'mm_image_pipeline': 1.119,
    'mm_jpeg_decode': 1.604,
    'mm_video_frames': 3.551,
    'pipe_bloom_decontaminate': 1.134,
    'pipe_bpe_encode': 3.897,
    'pipe_bpe_merges': 4.547,
    'pipe_cdc_chunks': 1.437,
    'pipe_chunk_fixed': 0.657,
    'pipe_chunk_normalized': 1.339,
    'pipe_corpus_mix': 0.166,
    'pipe_corpus_shuffle': 0.405,
    'pipe_corpus_split': 0.155,
    'pipe_curate_chain': 4.975,
    'pipe_curate_split_chain': 10.593,
    'pipe_curriculum_order': 1.129,
    'pipe_decontaminate': 0.771,
    'pipe_doc_hash': 0.413,
    'pipe_domain_mix': 1.346,
    'pipe_dsir_select': 0.832,
    'pipe_hash_embed_topk': 1.359,
    'pipe_leakage_safe_split': 3.957,
    'pipe_negative_samples': 0.546,
    'pipe_pdf_page_chunks': 1.373,
    'pipe_semantic_decontaminate': 2.872,
    'pipe_sequence_pack': 0.666,
    'pipe_stratified_take': 0.192,
    'pipe_temperature_mix': 0.406,
    'pipe_token_budget_mix': 0.341,
    'pipe_token_windows': 0.546,
    'pipe_training_corpus': 1.37,
    'pipe_url_dedup': 1.152,
    'pipe_weighted_sample': 0.18,
    'prof_corpus_quantiles': 0.186,
    'prof_events_corr': 0.433,
    'prof_events_cube': 0.228,
    'prof_events_pivot': 0.283,
    'prof_events_rollup': 0.305,
    'prof_events_sketch': 0.968,
    'prof_sketch_accuracy': 3.68,
    'prof_value_histogram': 0.137,
    'rel_big_orders': 0.425,
    'rel_customer_activity': 0.358,
    'rel_events_asof': 0.428,
    'rel_events_cohorts': 0.479,
    'rel_events_funnel': 0.379,
    'rel_events_gapfill': 0.295,
    'rel_events_gaps': 0.339,
    'rel_events_interval': 0.364,
    'rel_events_json': 0.368,
    'rel_events_moving_avg': 0.456,
    'rel_events_scd2': 0.159,
    'rel_forecast_revenue': 0.125,
    'rel_join_nation_customers': 0.22,
    'rel_orders_pareto': 0.497,
    'rel_pricing_summary': 0.325,
    'rel_region_volume': 0.424,
    'rel_scd2_merge': 0.442,
    'rel_sessions_overlap': 0.615,
    'rel_shipping_priority': 0.337,
    'rel_top_orders_by_revenue': 0.41,
    'rel_user_retention': 0.363,
    'rel_window_order_rank': 0.652,
    'sim_cosine_pairs_exact': 0.734,
    'sim_sparse_cosine_pairs': 1.133,
    'skew_salted_user_join': 0.306,
    'src_binary_roundtrip': 1.518,
    'src_markup_roundtrip': 1.373,
    'src_office_roundtrip': 1.374,
    'st_clicks_attribution': 2.65,
    'st_events_dedup': 0.315,
    'st_events_sessions': 1.375,
    'st_events_sliding': 0.248,
    'st_events_window': 0.215,
    'st_heavy_hitters': 1.304,
    'st_user_running_totals': 1.803,
    'st_windowed_quantiles': 1.506,
    'ts_bigram_lm_score': 1.433,
    'ts_c4_filter': 0.516,
    'ts_gopher_filter': 0.727,
    'ts_lang_id': 0.849,
    'ts_pii_scrub': 0.484,
    'ts_pii_scrub_extended': 1.746,
    'ts_quality_classifier': 0.579,
    'ts_quality_score': 0.513,
    'ts_readability': 0.609,
    'ts_repetition_filter': 0.527,
    'ts_text_stats': 0.467,
    'ts_tfidf_top_terms': 0.932,
    'ts_vocab_topk': 0.38,
    'ts_winnow_fingerprints': 1.183,
    'vq_batch_topk': 0.506,
    'vq_chunks_only': 0.463,
    'vq_citations': 0.301,
    'vq_filtered_topk': 0.284,
    'vq_grouped_topk': 0.253,
    'vq_mmr_rerank': 1.178,
    'vq_postfilters': 0.343,
    'vq_rag_prompt': 0.489,
    'vq_range_search': 0.516,
    'vq_threshold_after_topk': 0.326,
    'vq_topk_cosine': 0.298,
    'vq_topk_quantized': 0.341,
}


#: Oracle-backed entries whose latest driver row predates their
#: oracle. Emptied r7: the r6 driver graded all three former members
#: (ann_ivf/pca/opq_topk) hash-green. Class (a).
_PRE_ORACLE_STALE: set = set()


#: r13 cut (grading-budget protocol, COVERAGE.md; second optimization
#: round, OPTIMIZATION_r13.md). `_LAST_GRADED` carries the r12
#: driver rows (50 entries bumped to 12, incl. the then-new
#: `pipe_curate_split_chain`), so the r9-stale remainder rotates in
#: right behind this round's changed set (VERDICT r12 item 8).
#: Changes this round — every entry below had its registered body or
#: a shared operator under it change plan shape; outputs
#: oracle-verified identical (135/135 at sf0.01 plus per-entry
#: sf0.001 checks):
#: (1) `dd_containment_pairs` — rewrite per VERDICT r12 item 2:
#:     xxhash64 shingle keys (8-byte exchanges, never gram text),
#:     map-side |A| carried through the pair exchange (sizes
#:     aggregate + join-back eliminated), broadcast-ANTI hot-shingle
#:     prefilter instead of the rare-set equi-join.
#: (2) CC entries (`dd_duplicate_clusters`, `dd_semantic_dedup`,
#:     `pipe_leakage_safe_split`, `pipe_curate_split_chain`) — the
#:     shared connected_components round loop now runs AQE-off with
#:     a node-count-derived fixed partition layout (one job per
#:     2-round block; sym hash-partitioned once).
#: (3) `dd_image_near_dups` — synth+encode+decode+dHash fused into
#:     ONE Arrow stage (two MapInPandas → one; the BMP bytes never
#:     cross the JVM boundary).
#: (4) `ann_ivf_topk` — the Lloyd-rescan cache routed through the
#:     released persist ledger (bench integrity; plan unchanged, but
#:     runtime caching semantics changed — conservative rule-6 mark).
#: The session-wide per-build cache release (queries.register wrapper)
#: changes RUNTIME cache lifetime for every entry but no plan shape;
#: entries are not blanket-marked for it.
#: (5) `dd_simhash_near_dups` — documented (4,2) scheme pinned
#:     explicitly (kills the per-build canonical-filtered count).
#: (6) `mm_image_pipeline` — fused decode+features Arrow stage.
#: (7) `ann_recall_contract` — IVFPQ tier stacked on the cached PQ
#:     tier (one corpus encode pass).
#: (8) `pipe_training_corpus` — pushdown barrier keeps the quality
#:     fold above the rebalance exchange.
#: (9) `dd_repeated_spans` / `dd_strip_repeated_spans` — binary md5
#:     anchor keys through the hot aggregate / cover join.
#: (The literal_array change rebuilds identical literal trees — plans
#: unchanged — and the dHash bit-pack vectorization is inside an
#: opaque Python stage; neither is plan-affecting.)
_CHANGED_THIS_ROUND = {
    "dd_containment_pairs",
    "dd_duplicate_clusters",
    "dd_semantic_dedup",
    "pipe_leakage_safe_split",
    "pipe_curate_split_chain",
    "dd_image_near_dups",
    "ann_ivf_topk",
    "dd_simhash_near_dups",
    "mm_image_pipeline",
    "ann_recall_contract",
    "pipe_training_corpus",
    "dd_repeated_spans",
    "dd_strip_repeated_spans",
}


def _compute_registry_order() -> list:
    """(a) pre-oracle stale, (b) new/changed this round, (c) ascending
    last-graded round; cost-ascending within each class/round.
    Computed over every REGISTERED query (new entries registered below
    this point have no `_LAST_GRADED` row and land in class b), so it
    must run at module end — see `_apply_registry_order`."""
    names = (
        set(QUERIES) | set(_LAST_GRADED)
        | set(_CHANGED_THIS_ROUND) | set(_PRE_ORACLE_STALE)
    )

    def key(name):
        cost = _SOLO_COST_S.get(name, 1.0)
        if name in _PRE_ORACLE_STALE:
            return (0, 0, cost, name)
        if name in _CHANGED_THIS_ROUND or name not in _LAST_GRADED:
            return (1, 0, cost, name)
        return (2, _LAST_GRADED[name], cost, name)

    return sorted(names, key=key)


#: Populated by `_apply_registry_order()` at module end, AFTER every
#: registration — computing it here would miss late-defined entries.
_REGISTRY_ORDER: list = []


def _apply_registry_order() -> None:
    _REGISTRY_ORDER[:] = _compute_registry_order()
    rank = {name: i for i, name in enumerate(_REGISTRY_ORDER)}
    tail = len(_REGISTRY_ORDER)
    for mapping in (QUERIES, ORACLES):
        ordered = sorted(
            mapping.items(),
            key=lambda kv: (rank.get(kv[0], tail), kv[0]),
        )
        mapping.clear()
        mapping.update(ordered)




def _feature_hash_oracle_sql() -> str:
    """Feature-hash embed→search oracle. Every similarity is
    dot/(sqrt(i)*sqrt(j)*qnorm-literal) over INTEGER dot products and
    norms, so Spark and DuckDB produce bit-identical doubles — the
    only embedding path with exact cross-engine floats."""
    import math

    from vectordb_light_spark.functions.embedding import feature_hash_query_weights

    qw = feature_hash_query_weights(_FH_QUERY)
    qnorm = math.sqrt(sum(w * w for _, w in qw))
    values = ", ".join(f"({b}, {w})" for b, w in qw)
    return f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text, ' ')),
                                         '[ \\t\\n\\x0B\\f\\r]+')) AS t
        FROM documents
    ),
    w AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 64 AS bucket,
               CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(t), 9, 1)) AS BIGINT)
                             % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS weight
        FROM tok WHERE t <> '' GROUP BY doc_id, bucket
    ),
    w2 AS (SELECT * FROM w WHERE weight != 0),
    norms AS (
        SELECT doc_id, sqrt(CAST(SUM(weight * weight) AS BIGINT)) AS dnorm
        FROM w2 GROUP BY doc_id
    ),
    q(bucket, qw) AS (VALUES {values}),
    dots AS (
        SELECT w2.doc_id, CAST(SUM(w2.weight * q.qw) AS BIGINT) AS dot
        FROM w2 JOIN q USING (bucket) GROUP BY w2.doc_id
    ),
    scored AS (
        SELECT n.doc_id,
               COALESCE(d.dot, 0) / (n.dnorm * {qnorm!r}) AS sim
        FROM norms n LEFT JOIN dots d ON n.doc_id = d.doc_id
    )
    SELECT doc_id, ROUND(sim, 6) AS similarity,
           CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS INT) AS rank
    FROM scored
    ORDER BY rank
    LIMIT 10
    """


_FH_QUERY = "merge stream batch spark vector"


@register("emb_feature_hash_topk", oracle=_feature_hash_oracle_sql())
def emb_feature_hash_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embed→search with ZERO Python in the plan: sparse feature-hash
    embeddings (functions/embedding.py feature_hash_weights — the
    hashing trick with md5-derived buckets/signs, all codegen
    builtins), integer dot products against a broadcast query-weight
    table, IEEE-exact cosine. Complements the Arrow-UDF embedders
    (blake2b hashing double, mini-transformer): this tier trades
    model quality for a fully JVM-side, shuffle-light, and — uniquely
    — oracle-exact path (integer dots + correctly-rounded sqrt give
    bit-identical doubles in any engine)."""
    import math

    from vectordb_light_spark.functions.embedding import (
        feature_hash_query_weights,
        feature_hash_weights,
    )

    from vectordb_light_spark.session import persist_if_batch

    docs = load_docs(spark, sf_dir)
    w2 = persist_if_batch(feature_hash_weights(docs, dim=64))
    norms = w2.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("dnorm")
    )
    qw = feature_hash_query_weights(_FH_QUERY)
    qnorm = math.sqrt(sum(w * w for _, w in qw))
    qdf = spark.createDataFrame(qw, "bucket long, qw long")
    dots = (
        w2.join(F.broadcast(qdf), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("weight") * F.col("qw")).alias("dot"))
    )
    scored = norms.join(dots, "doc_id", "left").select(
        "doc_id",
        (
            F.coalesce(F.col("dot"), F.lit(0)) / (F.col("dnorm") * F.lit(qnorm))
        ).alias("sim"),
    )
    w = Window.orderBy(F.col("sim").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 10)
        .select("doc_id", F.round("sim", 6).alias("similarity"), "rank")
        .orderBy("rank")
    )


@register(
    "ann_recall_contract",
    oracle="""
    SELECT CAST(3 AS INT) AS n_queries,
           CAST(1 AS INT) AS srp_recall_ok,
           CAST(1 AS INT) AS pq_rerank_recall_ok,
           CAST(1 AS INT) AS ivfpq_recall_ok
    """,
)
def ann_recall_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality contract as a hard driver signal: for 3 query
    vectors, mean recall@10 of (a) SRP radius-8 probing, (b) PQ
    ADC + exact re-rank, and (c) the composed IVFPQ tier at its r3 ★
    operating point (nprobe=12/16 + rerank@100, ANN_EVAL.md), against
    the exact scan ground truth computed in the same job — the oracle
    pins the CONTRACT (bounds hold: SRP ≥ 0.6, PQ+rerank ≥ 0.8,
    IVFPQ ≥ 0.8; measured operating points are 0.87 / 0.92-0.96 /
    0.93 at sf0.1 and 1.0 at the contract SFs, so the margins absorb
    per-query variance). Everything is deterministic: seeded planes,
    seeded sampled-Lloyd codebooks and centroids, fixed testdata."""
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine
    from vectordb_light_spark.operators.similarity import (
        add_ivf_cluster,
        add_pq_codes,
        add_srp_signature,
        ann_topk_ivfpq,
        ann_topk_pq,
        ann_topk_srp,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    from vectordb_light_spark.session import persist_if_batch

    emb = load_table(spark, sf_dir, "embeddings")
    books = _trained(
        (sf_dir, "pq16x64"),
        lambda: train_pq_codebooks(emb, m=16, n_codes=64, max_train=5_000),
    )
    cents = _trained(
        (sf_dir, "ivf16"),
        lambda: train_ivf_centroids(emb, n_centroids=16, max_train=5_000),
    )
    indexed = persist_if_batch(add_srp_signature(emb, n_planes=16))
    coded = persist_if_batch(add_pq_codes(emb, books))
    # r13: the IVFPQ tier stacks the (map-only) cluster column ON TOP
    # of the persisted PQ tier instead of re-running the PQ encode
    # UDF over the base scan — one corpus encode pass instead of two;
    # columns are identical by name (both stages are withColumn).
    ivfpq = persist_if_batch(add_ivf_cluster(coded, cents))
    n_queries = 3
    # The 3 queries × 4 tiers are twelve INDEPENDENT bounded-k jobs
    # over persisted inputs; running them sequentially left most of
    # the machine idle per job (guide §2.6: overlap independent jobs
    # from a small thread pool so one job's tail back-fills the
    # next's). The persisted tiers are materialized first — each by
    # exactly one thread — so the pooled tier jobs never race to
    # compute the same cache. Results are identical to the sequential
    # loop: every task is a deterministic read-only top-k.
    from concurrent.futures import ThreadPoolExecutor

    def topk_ids(task) -> tuple:
        qid, tier = task
        q = _query_vector(spark, sf_dir, qid)
        if tier == "exact":
            out = topk_cosine(
                emb, q, SearchParams(k=10, threshold=0.0),
                id_col="vec_id", vec_col="embedding",
            )
        elif tier == "srp":
            out = ann_topk_srp(indexed, q, k=10, probe_hamming=8, n_planes=16)
        elif tier == "pq":
            out = ann_topk_pq(coded, books, q, k=10, rerank_pool=50)
        else:
            out = ann_topk_ivfpq(
                ivfpq, cents, books, q, k=10, nprobe=12, rerank_pool=100
            )
        return qid, tier, {r.vec_id for r in out.collect()}

    tiers = ("exact", "srp", "pq", "ivfpq")
    with ThreadPoolExecutor(max_workers=4) as pool:
        # indexed ∥ coded first; ivfpq AFTER coded so its (map-only)
        # cluster stage reads coded's materialized cache instead of
        # racing it and re-running the PQ encode (r13).
        list(pool.map(lambda d: d.count(), (indexed, coded)))
        ivfpq.count()
        got = {
            (qid, tier): ids
            for qid, tier, ids in pool.map(
                topk_ids,
                [(qid, t) for qid in range(n_queries) for t in tiers],
            )
        }
    srp_hits = pq_hits = ivfpq_hits = 0
    for qid in range(n_queries):
        exact = got[(qid, "exact")]
        srp_hits += len(exact & got[(qid, "srp")])
        pq_hits += len(exact & got[(qid, "pq")])
        ivfpq_hits += len(exact & got[(qid, "ivfpq")])
    return spark.createDataFrame(
        [
            (
                n_queries,
                int(srp_hits / (10.0 * n_queries) >= 0.6),
                int(pq_hits / (10.0 * n_queries) >= 0.8),
                int(ivfpq_hits / (10.0 * n_queries) >= 0.8),
            )
        ],
        "n_queries int, srp_recall_ok int, pq_rerank_recall_ok int,"
        " ivfpq_recall_ok int",
    )


def _mmr_oracle_sql(k: int = 6, lam: float = 0.7) -> str:
    """DuckDB twin of vq_mmr_rerank: the greedy argmax loop UNROLLED
    into k sequential CTEs (s1..sk), each picking the next MMR winner
    over the candidates not yet selected. Verified margins on the
    driver corpus: every argmax step is decided by ≥6e-4, the pool
    20-cut by 6.9e-4, and rounded outputs sit ≥6.7e-9 from a 1e-6
    rounding boundary — far above the ~1e-15 cross-engine float
    drift. (1.0 - lam) is computed in SQL so the subtraction rounds
    identically to numpy's ``1.0 - lam``."""
    parts = [r"""
    WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
    pool AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v
        FROM embeddings
        ORDER BY LEAST(GREATEST(list_cosine_similarity(
            embedding::DOUBLE[], (SELECT v FROM q)), 0.0), 1.0) DESC, vec_id
        LIMIT 20
    ),
    rel AS MATERIALIZED (
        SELECT vec_id, list_dot_product(v, (SELECT v FROM q)) AS r FROM pool
    ),
    pd AS MATERIALIZED (
        SELECT a.vec_id AS ia, b.vec_id AS ib, list_dot_product(a.v, b.v) AS s
        FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
    ),
    s1 AS (SELECT vec_id, r AS mmr FROM rel ORDER BY mmr DESC, vec_id LIMIT 1)"""]
    for n in range(2, k + 1):
        prev = " UNION ALL ".join(f"SELECT vec_id FROM s{m}" for m in range(1, n))
        parts.append(f""",
    s{n} AS (
        SELECT rel.vec_id,
               {lam!r} * rel.r - (1.0 - {lam!r}) * (
                   SELECT MAX(pd.s) FROM pd
                   WHERE pd.ia = rel.vec_id AND pd.ib IN ({prev})
               ) AS mmr
        FROM rel WHERE rel.vec_id NOT IN ({prev})
        ORDER BY mmr DESC, vec_id LIMIT 1
    )""")
    sel = " UNION ALL ".join(
        f"SELECT vec_id, mmr, {n} AS mmr_rank FROM s{n}" for n in range(1, k + 1))
    parts.append(f"""
    SELECT sel.vec_id,
           ROUND(rel.r, 6) AS similarity_score,
           ROUND(sel.mmr, 6) AS mmr_score,
           CAST(sel.mmr_rank AS INT) AS mmr_rank
    FROM ({sel}) sel JOIN rel ON sel.vec_id = rel.vec_id
    ORDER BY mmr_rank""")
    return "".join(parts)


@register("vq_mmr_rerank", oracle=_mmr_oracle_sql())
def vq_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified re-rank (operators/search.py mmr_rerank,
    engine facade `search_diverse`): the distributed top-k scan
    shrinks the table to a 20-row pool, then the inherently
    sequential greedy λ·rel − (1−λ)·redundancy selection runs
    driver-side in numpy on that pool. The SQL twin unrolls the
    greedy loop into k sequential CTEs (see _mmr_oracle_sql);
    near-dup-demotion and λ-degeneracy are unit-tested in
    tests/test_search.py."""
    from vectordb_light_spark.operators.search import (
        SearchParams,
        mmr_rerank,
        topk_cosine,
    )

    q = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    pool = topk_cosine(
        emb, q, SearchParams(k=20, threshold=0.0),
        id_col="vec_id", vec_col="embedding",
    ).select("vec_id").join(emb.select("vec_id", "embedding"), "vec_id")
    out = mmr_rerank(pool, q, k=6, lam=0.7, id_col="vec_id", vec_col="embedding")
    return out.select(
        "vec_id",
        F.round("similarity_score", 6).alias("similarity_score"),
        F.round("mmr_score", 6).alias("mmr_score"),
        "mmr_rank",
    ).orderBy("mmr_rank")


@register(
    "rel_events_scd2",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(LEAD(ts) OVER w) AS BIGINT) AS valid_to_us,
           CAST(LEAD(ts) OVER w IS NULL AS INT) AS is_current
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from_us, event_id
    """,
)
def rel_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 effective ranges from an event log (the warehouse
    dimension-versioning pattern): each user's events become
    [valid_from, valid_to) intervals via LEAD over (user, time), the
    open row flagged current. One hash exchange on user_id feeds the
    whole window; epoch-microsecond longs keep the value hash
    timezone-proof across engines."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("valid_from_us"),
            F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
            F.lead("ts").over(w).isNull().cast("int").alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us", "event_id")
    )


@register(
    "rel_scd2_merge",
    oracle="""
    WITH log AS (
        SELECT user_id, event_id, event_type, ts FROM events
        WHERE (user_id < 20 AND ts < TIMESTAMP '2024-01-20')
           OR (user_id < 40 AND ts >= TIMESTAMP '2024-01-20')
    )
    SELECT user_id, event_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(LEAD(ts) OVER w) AS BIGINT) AS valid_to_us,
           CAST(LEAD(ts) OVER w IS NULL AS INT) AS is_current
    FROM log
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, valid_from_us, event_id
    """,
)
def rel_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE upsert into an SCD2 dimension
    (operators/timeseries.py scd2_merge): the pre-cutoff events build
    the dimension (rel_events_scd2's shape), the post-cutoff events —
    over a WIDER key range, so the batch both updates existing keys
    and inserts new ones — merge in as a change batch. The oracle is
    the strongest possible statement about MERGE semantics:
    incremental-merge output must equal a one-shot SCD2 REBUILD over
    the whole log (single LEAD window in DuckDB). Engine plan: the
    dimension is never shuffled — untouched keys pass an anti join
    against the tiny changed-key set, open rows close via a broadcast
    of per-key first-change timestamps, and only the batch pays a
    window exchange."""
    from vectordb_light_spark.operators.timeseries import scd2_merge

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")
    hist = ev.where((F.col("user_id") < 20) & (F.col("ts") < cutoff))
    batch = ev.where(
        (F.col("user_id") < 40) & (F.col("ts") >= cutoff)
    ).select("user_id", "event_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = hist.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().cast("int").alias("is_current"),
    )
    merged = scd2_merge(
        dim, batch, key_col="user_id", ts_col="ts", order_cols=("event_id",)
    )
    return merged.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    ).orderBy("user_id", "valid_from_us", "event_id")


@register(
    "ts_vocab_topk",
    oracle=r"""
    WITH tok AS (
        SELECT unnest(string_split_regex(lower(trim(text, ' ')), '[ \t\n\x0B\f\r]+')) AS token
        FROM documents
    ),
    c AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok WHERE token <> '' GROUP BY token HAVING COUNT(*) >= 2
    ),
    top AS (
        SELECT token, n FROM c ORDER BY n DESC, token LIMIT 50
    )
    SELECT token, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS INT) AS rank,
           CAST(SUM(n) OVER (ORDER BY n DESC, token
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
    FROM top ORDER BY rank
    """,
)
def ts_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head (operators/profiling.py vocab_topk): top-50
    tokens with rank and cumulative coverage — tokenizer-training
    prep. Map-side-combine count shuffled on the token, top-k via
    TakeOrderedAndProject, rank/cumsum windows over only the 50-row
    slice."""
    from vectordb_light_spark.operators.profiling import vocab_topk

    docs = load_docs(spark, sf_dir)
    return vocab_topk(docs, k=50, min_count=2)


@register(
    "pipe_stratified_take",
    oracle="""
    SELECT doc_id, lang, take_rank FROM (
        SELECT doc_id, lang,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(concat_ws(':', '7', CAST(doc_id AS VARCHAR))),
                            doc_id
               ) AS INT) AS take_rank
        FROM documents
    ) WHERE take_rank <= 25
    ORDER BY lang, take_rank
    """,
)
def pipe_stratified_take(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language quotas (operators/sampling.py
    stratified_take): 25 docs per lang, picked by seeded-md5 rank —
    the balanced-eval-set sampler. One stratum-keyed exchange; the
    md5 rank key is engine-neutral so DuckDB reproduces the exact
    pick."""
    from vectordb_light_spark.operators.sampling import stratified_take

    docs = load_docs(spark, sf_dir, "doc_id", "lang")
    return (
        stratified_take(docs, 25, strata_col="lang", seed=7)
        .select("doc_id", "lang", "take_rank")
        .orderBy("lang", "take_rank")
    )


@register(
    "vq_range_search",
    oracle="""
    SELECT vec_id, label,
           ROUND(LEAST(GREATEST(list_cosine_similarity(
               embedding::DOUBLE[],
               (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
           ), 0.0), 1.0), 6) AS similarity_score
    FROM embeddings
    WHERE LEAST(GREATEST(list_cosine_similarity(
               embedding::DOUBLE[],
               (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)
           ), 0.0), 1.0) >= 0.25
    ORDER BY similarity_score DESC, vec_id
    """,
)
def vq_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search (operators/search.py range_search — the FAISS
    range_search analogue): every vector within cosine 0.25 of the
    query, NO k. One scan + map-side filter, zero shuffle before the
    result-sized sort — at scale strictly cheaper than top-k (no
    per-partition heaps or ordered reduce). Verified margins on the
    driver corpus: nearest cosine is ≥6e-4 from the radius and ≥1.2e-8
    from any 1e-6 rounding boundary."""
    from vectordb_light_spark.operators.search import range_search

    q = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    out = range_search(
        emb, q, radius=0.25, id_col="vec_id", vec_col="embedding"
    )
    return out.select(
        "vec_id",
        "label",
        F.round("similarity_score", 6).alias("similarity_score"),
    ).orderBy(F.col("similarity_score").desc(), "vec_id")


@register(
    "rel_events_gapfill",
    oracle="""
    WITH per_day AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS INT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS BIGINT)
                   AS day_value_e4
        FROM events WHERE user_id < 12
        GROUP BY user_id, day
    ),
    bounds AS (
        SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
        FROM per_day GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM bounds
    )
    SELECT g.user_id,
           CAST(epoch_us(g.day) AS BIGINT) AS day_us,
           COALESCE(p.n_events, 0) AS n_events,
           CAST(p.user_id IS NULL AS INT) AS is_gap,
           p.day_value_e4,
           -- last NON-NULL day sum: mirrors Spark's
           -- last(ignorenulls=True) when a day's events all carry
           -- NULL values (its day_value_e4 is NULL and must be
           -- skipped, not carried)
           (SELECT p2.day_value_e4 FROM per_day p2
            WHERE p2.user_id = g.user_id AND p2.day <= g.day
              AND p2.day_value_e4 IS NOT NULL
            ORDER BY p2.day DESC LIMIT 1) AS carry_value_e4
    FROM grid g LEFT JOIN per_day p
      ON g.user_id = p.user_id AND g.day = p.day
    ORDER BY g.user_id, day_us
    """,
)
def rel_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + carry-forward
    (operators/timeseries.py resample_daily_gapfill): one row per
    (user, day) between each user's first and last event, empty days
    flagged and value carried forward. Grid rows = users × span-days,
    independent of event volume; every stage shuffles on the user key
    only. Day emitted as epoch-microseconds (timezone-proof hash)."""
    from vectordb_light_spark.operators.timeseries import resample_daily_gapfill

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 12)
    out = resample_daily_gapfill(ev)
    return out.select(
        "user_id",
        F.unix_micros("day").alias("day_us"),
        "n_events",
        "is_gap",
        "day_value_e4",
        "carry_value_e4",
    ).orderBy("user_id", "day_us")


@register(
    "sim_sparse_cosine_pairs",
    oracle=r"""
    WITH p AS (
        SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text, ' ')),
                                             '[ \t\n\x0B\f\r]+')) AS t
            FROM documents WHERE doc_id < 200
        ) WHERE t <> ''
        GROUP BY doc_id, t
    ),
    norms AS (
        SELECT doc_id, sqrt(CAST(SUM(tf * tf) AS BIGINT)) AS n
        FROM p GROUP BY doc_id
    ),
    dots AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
        FROM p a JOIN p b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, ROUND(sim, 6) AS cosine
    FROM (
        SELECT id_a, id_b, d.dot / (na.n * nb.n) AS sim
        FROM dots d
        JOIN norms na ON d.id_a = na.doc_id
        JOIN norms nb ON d.id_b = nb.doc_id
    )
    WHERE sim >= 0.95
    ORDER BY id_a, id_b
    """,
)
def sim_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse all-pairs cosine (similarity.py sparse_cosine_pairs):
    documents as term-frequency postings, inverted-index self-join,
    cosine ≥ 0.95 — the bag-of-words near-dup tier that needs no
    embedding at all. Integer tf weights make dot products exact and
    the cosine bit-identical across engines (same trick as
    emb_feature_hash_topk), so the whole posting pipeline is
    oracle-checked. The synthetic corpus has a 31-term vocabulary —
    every term is a stop term with ZERO selectivity, the worst case
    for a posting join — so the entry runs on a bounded slice
    (doc_id < 200); real corpora get their sparsity from the Zipf
    tail plus the max_df cap, measured in tests and SCALING.md."""
    from vectordb_light_spark.operators.similarity import sparse_cosine_pairs

    docs = load_docs(spark, sf_dir).where(F.col("doc_id") < 200)
    postings = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    out = sparse_cosine_pairs(
        postings, id_col="doc_id", term_col="term", weight_col="tf",
        threshold=0.95,
    )
    return out.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Extraction-source roundtrips (SURVEY §2.1 S3-S11 under the driver
# oracle — r6 verdict item 3). The testdata has no binary documents,
# so each row is serialized into REAL format bytes in-query
# (sources/synth_docs.py), pushed through the production
# ``extract_bytes`` dispatch, and the oracle reconstructs the expected
# text purely in SQL: one mis-parsed byte in any of ~1500 packages
# per entry flips the value hash.
# ---------------------------------------------------------------------------


def _src_roundtrip(spark: SparkSession, sf_dir: str, fmts: tuple) -> DataFrame:
    from collections.abc import Iterator as _Iter

    import pandas as _pd

    from vectordb_light_spark.sources.extract import extract_bytes
    from vectordb_light_spark.sources.synth_docs import BUILDERS

    docs = load_docs(spark, sf_dir, "doc_id", "text").where(
        F.col("text").isNotNull()
        & (F.trim("text") != "")
        & ~F.contains("text", F.lit("\n"))
    )

    def run(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for fmt in fmts:
                    data = BUILDERS[fmt](int(doc_id), text)
                    out, reason = extract_bytes(f"{doc_id}.{fmt}", data)
                    rows.append(
                        (
                            int(doc_id),
                            fmt,
                            out if reason is None else f"REJECT:{reason}",
                        )
                    )
            yield _pd.DataFrame(rows, columns=["doc_id", "fmt", "text"])

    # r12: ordered_once — the range sampling otherwise re-runs the
    # encode→extract Python roundtrip for every format.
    return ordered_once(
        docs.mapInPandas(run, schema="doc_id long, fmt string, text string"),
        "doc_id", "fmt",
    )


@register(
    "src_office_roundtrip",
    oracle="""
    WITH d AS (
        SELECT doc_id, text FROM documents
        WHERE text IS NOT NULL AND trim(text, ' ') <> ''
          AND NOT contains(text, chr(10))
    )
    SELECT doc_id, fmt, expected AS text FROM (
        SELECT doc_id, 'docx' AS fmt,
               'h' || doc_id || chr(10) || chr(10) || 'doc ' || doc_id
                   || chr(10) || chr(10) || text AS expected FROM d
        UNION ALL
        SELECT doc_id, 'rtf' AS fmt,
               'doc ' || doc_id || chr(10) || text AS expected FROM d
        UNION ALL
        SELECT doc_id, 'xlsx' AS fmt,
               'doc ' || doc_id || ' ' || text AS expected FROM d
    )
    ORDER BY doc_id, fmt
    """,
)
def src_office_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S10/S11 under the hard driver signal: every document is
    packed into a real OPC DOCX (header part + body paragraphs), a
    SpreadsheetML XLSX (shared-string + numeric + inline-string
    cells through the workbook→rels→sheet indirection), and an RTF
    token stream (fonttbl destination, \\par, escaped
    metacharacters), then extracted by the pure-stdlib parsers
    (sources/office_text.py; reference document_processor.py:
    167-239). The oracle recomputes the expected text from the same
    rows with SQL concatenation only — zip framing, XML namespaces,
    cell-type dispatch, and RTF group tracking all have to be exactly
    right for the hash to match. One Arrow pass, build+extract fused:
    at 100 TB this is the embarrassingly parallel extract stage with
    zero shuffle (the orderBy is presentation-only)."""
    return _src_roundtrip(spark, sf_dir, ("docx", "rtf", "xlsx"))


@register(
    "src_binary_roundtrip",
    oracle="""
    WITH d AS (
        SELECT doc_id, text FROM documents
        WHERE text IS NOT NULL AND trim(text, ' ') <> ''
          AND NOT contains(text, chr(10))
    )
    SELECT doc_id, fmt, expected AS text FROM (
        SELECT doc_id, 'msg' AS fmt,
               'Subject: doc ' || doc_id || chr(10) || text AS expected FROM d
        UNION ALL
        SELECT doc_id, 'pdf' AS fmt,
               '[[page1]]doc ' || doc_id || chr(10)
                   || '[[page2]]' || text || chr(10) AS expected FROM d
        UNION ALL
        SELECT doc_id, 'xls' AS fmt,
               -- xls numbers render as Python floats (xlrd parity):
               -- the RK integer cell surfaces as '<id>.0'
               'doc ' || doc_id || '.0 ' || text AS expected FROM d
    )
    ORDER BY doc_id, fmt
    """,
)
def src_binary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S8/S9 under the hard driver signal — the BINARY container
    formats: each document becomes a real two-page FlateDecode PDF
    (catalog→pages→content objects, escaped literal strings), an
    Outlook MSG (UTF-16 property streams inside a real [MS-CFB]
    compound file, mini-stream path), and a BIFF8 XLS (SST +
    shared-string + RK-integer cell records inside CFB), then runs
    through the production pure-Python parsers (sources/pdf_text.py,
    sources/cfb.py; reference document_processor.py:76-84,167-196).
    The oracle rebuilds the expected text in SQL — zlib framing, CFB
    sector/miniFAT chains, BIFF record parsing, RK decoding, and PDF
    string unescaping all have to be exactly right per document.
    With src_office/markup_roundtrip this puts ALL 12 supported
    extraction formats under the driver's value-hash gate."""
    return _src_roundtrip(spark, sf_dir, ("msg", "pdf", "xls"))


@register(
    "src_markup_roundtrip",
    oracle="""
    WITH d AS (
        SELECT doc_id, text FROM documents
        WHERE text IS NOT NULL AND trim(text, ' ') <> ''
          AND NOT contains(text, chr(10))
    )
    SELECT doc_id, fmt, expected AS text FROM (
        SELECT doc_id, 'csv' AS fmt,
               'doc ' || doc_id || chr(10) || text AS expected FROM d
        UNION ALL
        SELECT doc_id, 'eml' AS fmt,
               'Subject: doc ' || doc_id || chr(10) || text AS expected FROM d
        UNION ALL
        SELECT doc_id, 'html' AS fmt,
               'doc ' || doc_id || ' ' || text AS expected FROM d
    )
    ORDER BY doc_id, fmt
    """,
)
def src_markup_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6/S7 under the hard driver signal: each document becomes a
    quoted two-row CSV (commas in the text force real quoting), a
    single-line HTML page whose style/script blocks must be dropped,
    and an RFC-5322 text/plain message (Subject + body), extracted by
    the production csv/HTMLParser/email paths (sources/extract.py;
    reference document_processor.py:105-164). Same contract as
    src_office_roundtrip: the oracle rebuilds the expected text with
    SQL concatenation, so quoting, entity escaping, tag skipping, and
    MIME payload decoding are all hash-checked per document."""
    return _src_roundtrip(spark, sf_dir, ("csv", "eml", "html"))


def _bpe_oracle_sql(n_merges: int = 8) -> str:
    """DuckDB twin of pipe_bpe_merges: the N merge rounds UNROLLED as
    chained CTEs. Words are kept as sentinel-delimited strings — each
    symbol spelled ``' ' || sym || chr(1)`` — so applying a merge is
    ONE plain ``replace()``: the pattern ends at the first symbol's
    chr(1) and the second symbol's chr(1), leaving the NEXT symbol's
    leading space un-consumed, which makes replace-all reproduce
    exact left-to-right greedy non-overlapping BPE merging (the same
    semantics as the Spark array fold; a trailing-space-delimited
    form would skip the symbol after each match — [a,a,a,a,a] must
    give [aa,aa,a], not [aa,a,aa]). Tie-break mirrored: cnt DESC,
    a ASC, b ASC."""
    parts = [
        r"""
    WITH r0 AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
               ' ' || array_to_string(
                   list_append(
                       list_transform(generate_series(1, length(word)),
                                      i -> substr(word, i, 1)),
                       '</w>'),
                   chr(1) || ' ') || chr(1) AS w
        FROM (
            SELECT unnest(string_split_regex(
                       lower(trim(coalesce(text, ''), ' ')), '[ \t\n\x0B\f\r]+')) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY word
    )"""
    ]
    for r in range(1, n_merges + 1):
        prev = f"r{r - 1}"
        parts.append(f"""
    , s{r} AS MATERIALIZED (
        SELECT word, freq, w,
               list_filter(list_transform(string_split(w, chr(1)),
                                          x -> trim(x, ' ')),
                           x -> x <> '') AS syms
        FROM {prev}
    ),
    p{r} AS MATERIALIZED (
        SELECT syms[i] AS a, syms[i + 1] AS b,
               CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (
            SELECT freq, syms,
                   unnest(generate_series(1, len(syms) - 1)) AS i
            FROM s{r}
        )
        GROUP BY 1, 2
    ),
    b{r} AS MATERIALIZED (
        SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
    r{r} AS MATERIALIZED (
        SELECT word, freq,
               replace(w,
                   ' ' || (SELECT a FROM b{r}) || chr(1)
                       || ' ' || (SELECT b FROM b{r}) || chr(1),
                   ' ' || (SELECT a || b FROM b{r}) || chr(1)) AS w
        FROM s{r}
    )""")
    finals = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS merge_idx, a, b, cnt FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return "".join(parts) + f"\n    {finals}\n    ORDER BY merge_idx\n    "


@register("pipe_bpe_merges", oracle=_bpe_oracle_sql(8))
def pipe_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training: learn the corpus's first 8 BPE merges
    (operators/bpe.py — Sennrich et al. 2016, re-derived for Spark).
    The distinct-word vocab is built in ONE corpus aggregation; every
    merge round then argmaxes a maintained pair-count table and
    DELTA-recounts only the words containing the chosen pair, with
    localCheckpoint lineage cuts per round — the 100 TB cost is the
    single vocab groupBy. The oracle re-learns the same 8 merges with
    8 unrolled SQL rounds from scratch (full recount each round), so
    the delta maintenance is cross-checked against an independent
    full recomputation — a drifted count anywhere changes some
    round's argmax and fails the hash."""
    from vectordb_light_spark.operators.bpe import learn_bpe_merges

    docs = load_docs(spark, sf_dir, "text")
    merges = learn_bpe_merges(docs, 8)
    return spark.createDataFrame(
        [(m["merge_idx"], m["a"], m["b"], m["cnt"]) for m in merges],
        "merge_idx int, a string, b string, cnt long",
    ).orderBy("merge_idx")


#: Fixed BPE merge table for pipe_bpe_encode — tokenizers ship as
#: config, so the encode entry applies a LITERAL rank-ordered table
#: (this one is what pipe_bpe_merges learns at sf0.01) rather than
#: re-learning per run; both engines receive the same literals.
_BPE_MERGES = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
]


def _bpe_encode_oracle_sql() -> str:
    """DuckDB twin of pipe_bpe_encode: each word becomes the
    sentinel-delimited string form (' ' || sym || chr(1) per symbol),
    the 8 merge replaces apply in rank order (the same greedy-exact
    replace as the _bpe_oracle_sql rounds), and the surviving
    symbols re-join with single spaces."""
    spaced = (
        "' ' || array_to_string(list_append(list_transform("
        "generate_series(1, length(w)), i -> substr(w, i, 1)), '</w>'),"
        " chr(1) || ' ') || chr(1)"
    )
    expr = spaced
    for a, b in _BPE_MERGES:
        expr = (
            f"replace({expr}, ' ' || '{a}' || chr(1) || ' ' || '{b}' "
            f"|| chr(1), ' ' || '{a}{b}' || chr(1))"
        )
    # 2-arg ltrim: a word can BE a Unicode-space char (NBSP survives
    # the pinned split), and 1-arg ltrim would strip it as a leading
    # "space" after the sentinels drop — found by
    # tools/adversarial_oracle_check.py (the static audit's regex
    # cannot see through the nested replace chain).
    encoded_word = f"ltrim(replace({expr}, chr(1), ''), ' ')"
    return f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(
                   lower(trim(coalesce(text, ''), ' ')), '[ \\t\\n\\x0B\\f\\r]+'),
                   x -> x <> '') AS words
        FROM documents
    )
    SELECT doc_id,
           CAST(COALESCE(list_aggregate(list_transform(words,
                w -> len(string_split({encoded_word}, ' '))), 'sum'), 0)
               AS BIGINT) AS n_tok,
           array_to_string(list_transform(words, w -> {encoded_word}), ' ')
               AS encoded
    FROM t
    ORDER BY doc_id
    """


@register("pipe_bpe_encode", oracle=_bpe_encode_oracle_sql())
def pipe_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING — the apply side of pipe_bpe_merges: tokenize
    every document against a fixed rank-ordered merge table (the
    production shape: tokenizers ship as config). Each word's chars +
    </w> fold through the 8 merges IN RANK ORDER with the exact greedy
    left-to-right semantics the learner uses (r12: the fold runs in a
    memoized Arrow batch stage — operators/bpe.encode_words_udf, one
    fold per DISTINCT word per task, property-tested against the JVM
    apply_merge — 2.7× over evaluating the interpreted HOF fold per
    occurrence). Tokenization stays JVM-side; no explode, no shuffle
    except the output sort. At 100 TB the cost is the text scan times
    a constant (merge count over the task vocabulary). Output:
    per-document subword count and the encoded token stream, both
    hash-checked against an engine-independent SQL re-encode."""
    from vectordb_light_spark.operators.bpe import encode_words_udf

    from vectordb_light_spark.functions.text import PINNED_WS_RE

    docs = load_docs(spark, sf_dir, "doc_id", "text")
    words = F.filter(
        F.split(F.lower(F.trim(F.coalesce("text", F.lit("")))), PINNED_WS_RE),
        lambda x: x != "",
    )
    # r12 optimization round: the all-JVM nested-HOF fold evaluated
    # the 8 interpreted merge folds for EVERY word occurrence; the
    # memoized Arrow stage (operators/bpe.encode_words_udf) folds each
    # DISTINCT word once per task — 2.7× measured, identical rows,
    # tokenization still JVM-side, no shuffle. ordered_once: the
    # sort's range sampling otherwise ran the encode twice.
    enc = encode_words_udf(_BPE_MERGES)
    encoded = docs.select(
        "doc_id",
        enc(words).alias("__s"),
    ).select(
        "doc_id",
        F.col("__s.n_tok").alias("n_tok"),
        F.col("__s.encoded").alias("encoded"),
    )
    return ordered_once(encoded, "doc_id")


#: Configured language mixing weights for pipe_domain_mix — a config
#: lever (the mixing convention: weights are declared, not measured),
#: roughly the corpus's natural language distribution.
_DOMAIN_MIX_SHARES = {"de": 0.14, "en": 0.44, "es": 0.15, "fr": 0.12, "zh": 0.15}
_DOMAIN_MIX_SEED = 11


def _domain_mix_oracle_sql() -> str:
    """DuckDB twin of pipe_domain_mix: the SAME url chain CTEs as
    pipe_url_dedup (shared `_URL_CHAIN_CTES` — the twins cannot
    drift), then the α=0.5 temperature keep-decision as literal hex
    thresholds per language (the pipe_temperature_mix convention:
    rates computed once in python, injected verbatim into both
    engines — zero cross-engine float math)."""
    from vectordb_light_spark.operators.sampling import (
        bucket_sql,
        fraction_threshold,
        temperature_mix_fractions,
    )

    rates = temperature_mix_fractions(
        _DOMAIN_MIX_SHARES, alpha=0.5, target_frac=0.5
    )
    whens = " ".join(
        f"WHEN '{g}' THEN '{fraction_threshold(r)}'"
        for g, r in sorted(rates.items())
    )
    bucket = bucket_sql("d.doc_id", seed=_DOMAIN_MIX_SEED)
    return (
        "WITH " + _URL_CHAIN_CTES + f"""
    SELECT d.doc_id, doc.lang, d.domain, d.keep_url,
           COALESCE(c.keep_domain, FALSE) AS keep_domain,
           (d.keep_url AND COALESCE(c.keep_domain, FALSE)
                AND {bucket} < CASE doc.lang {whens} ELSE '00000000' END)
               AS kept
    FROM dedup d
    LEFT JOIN capped c ON d.doc_id = c.doc_id
    JOIN documents doc ON doc.doc_id = d.doc_id
    ORDER BY d.doc_id
    """
    )


@register("pipe_domain_mix", oracle=_domain_mix_oracle_sql())
def pipe_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation tier (r6 verdict item 8): URL normalize →
    URL-exact dedup → per-domain frequency cap → temperature (α=0.5)
    language mixing, in ONE Catalyst plan — proving the r6 curation
    tiers compose the way pipe_training_corpus proves the quality
    tiers. Shuffle profile of the composition: the url-dedup key
    exchange, the bounded domain window, and then the mix is a pure
    map-side hex-threshold filter — document text never moves at any
    stage. Output: every document with its per-stage survival flags
    (keep_url, keep_domain) and the final ``kept`` decision."""
    from vectordb_light_spark.operators.curation import (
        domain_frequency_cap,
        url_domain,
        url_exact_dedup,
    )
    from vectordb_light_spark.operators.sampling import (
        fraction_threshold,
        hash_bucket_column,
        temperature_mix_fractions,
    )

    rates = temperature_mix_fractions(
        _DOMAIN_MIX_SHARES, alpha=0.5, target_frac=0.5
    )
    docs = load_docs(spark, sf_dir, "doc_id", "lang")
    deduped = url_exact_dedup(_synth_urls(docs)).withColumnRenamed(
        "keep", "keep_url"
    )
    capped = domain_frequency_cap(
        deduped.where(F.col("keep_url")), 20
    ).select("doc_id", F.col("keep").alias("keep_domain"))

    bucket = hash_bucket_column("doc_id", seed=_DOMAIN_MIX_SEED)
    thr = None
    for g, r in sorted(rates.items()):
        t = F.lit(fraction_threshold(r))
        cond = F.col("lang") == g
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = thr.otherwise(F.lit("00000000"))

    return (
        deduped.withColumn("domain", url_domain("url_norm"))
        .join(capped, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "domain",
            "keep_url",
            F.coalesce("keep_domain", F.lit(False)).alias("keep_domain"),
            (
                F.col("keep_url")
                & F.coalesce("keep_domain", F.lit(False))
                & (bucket < thr)
            ).alias("kept"),
        )
        .orderBy("doc_id")
    )


# Applied at module end so EVERY registration (including those defined
# below the order list) participates in the fastest-first sort.
_apply_registry_order()
