"""Corpus / event profiling aggregates: exact quantiles, grouping-set
rollups, and sketch (approximate) variants.

Profiling a training corpus — cardinalities, value distributions,
per-stratum rollups — is a first-class pipeline stage at 100 TB
(task brief: training-data operations). Two tiers:

- **Exact tier** (``corpus_profile``, ``events_rollup``): Catalyst
  builtins with a DuckDB oracle. Exact ``percentile`` materializes
  each group's values for the sort, so it is the small-group /
  verification path.
- **Sketch tier** (``events_sketch_profile``): HyperLogLog++
  (``approx_count_distinct``) and Greenwald-Khanna
  (``percentile_approx``). Both are MERGEABLE partial aggregates:
  each task folds its partition into a constant-size sketch and the
  exchange carries one sketch per group per task — the 100 TB path,
  where exact distinct-count or a full sort per group would shuffle
  the whole table. Accuracy is bounded (HLL rsd, GK rank error), not
  exact, so these register rows-only; error bounds are unit-tested
  against the exact tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "corpus_profile",
    "events_rollup",
    "events_sketch_profile",
    "vocab_topk",
]


def vocab_topk(
    docs: DataFrame,
    *,
    text_col: str = "text",
    k: int = 100,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary head: top-``k`` whitespace tokens by frequency
    with rank and cumulative coverage — the first look any tokenizer
    training takes at a corpus (vocab head mass, coverage curve).

    Returns (token, n long, rank int, cum_n long), rank ordered by
    (count desc, token) so ties are deterministic.

    Scale shape: token counting is the canonical map-side-combine
    aggregate (partial counts per partition, one shuffle keyed on the
    token — no skew beyond natural Zipf, which AQE splits). The
    global top-k is TakeOrderedAndProject over the aggregated vocab
    (vocab ≪ corpus); the rank/cumulative window then runs over only
    the k-row slice, never the full vocabulary.
    """
    from pyspark.sql import Window

    tok = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("token")
    ).where(F.col("token") != "")
    counts = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )
    top = counts.orderBy(F.col("n").desc(), "token").limit(k)
    w = Window.orderBy(F.col("n").desc(), "token")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn("cum_n", F.sum("n").over(cum))
        .orderBy("rank")
    )


def corpus_profile(
    docs: DataFrame,
    *,
    group_col: str = "lang",
    size_col: str = "n_chars",
    distinct_col: str = "source",
) -> DataFrame:
    """Per-stratum exact profile: row count, exact distinct count,
    mean, and exact interpolated median/p90 of the size column.

    One keyed shuffle; ``count_distinct`` adds a partial distinct
    expand. Exact ``percentile`` (linear interpolation, same
    definition as DuckDB ``quantile_cont``) buffers each group's
    values — fine per-stratum, not for billions per group (use
    ``events_sketch_profile``'s GK sketch there).
    """
    pct = F.percentile(size_col, F.array(F.lit(0.5), F.lit(0.9)))
    return (
        docs.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(distinct_col).alias("n_sources"),
            F.round(F.avg(size_col), 4).alias("avg_size"),
            F.round(pct.getItem(0), 4).alias("median_size"),
            F.round(pct.getItem(1), 4).alias("p90_size"),
        )
        .orderBy(group_col)
    )


def events_rollup(events: DataFrame) -> DataFrame:
    """ROLLUP (event_type, day): per-type-per-day, per-type, and grand
    totals in ONE pass — partial aggregation computes all grouping
    sets map-side, so the exchange still carries only group cells.
    Rolled-up levels surface as sentinel labels (never-null input
    columns), keeping the output schema oracle-comparable.
    """
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    return (
        events.select(
            F.col("event_type"), day.alias("day"), F.col("value")
        )
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("day", F.lit("<all>")).alias("day"),
            "n_events",
            "total_value",
        )
        .orderBy("event_type", "day")
    )


def events_sketch_profile(
    events: DataFrame,
    *,
    rsd: float = 0.01,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-type sketch profile: HLL++ distinct users (relative std
    dev ``rsd``) and GK approximate p50/p95 of value (rank error ≤
    1/``accuracy``). Constant memory per group per task regardless of
    input size — the only safe shape for distinct/quantile profiling
    at 100 TB. No SQL oracle (estimates are implementation-defined);
    tests bound the error against the exact aggregates.
    """
    pct = F.percentile_approx(
        "value", F.array(F.lit(0.5), F.lit(0.95)), F.lit(accuracy)
    )
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
            F.round(pct.getItem(0), 4).alias("p50_value"),
            F.round(pct.getItem(1), 4).alias("p95_value"),
        )
        .orderBy("event_type")
    )


def bigram_lm_scores(
    docs,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple = (),
    add_k: float = 1.0,
):
    """Corpus-self-trained bigram LM quality score per document — the
    classic LM-based filter of training-data pipelines (à la
    CCNet/KenLM filtering, public method): documents whose word
    sequences are improbable under the corpus's own bigram statistics
    (boilerplate, gibberish, wrong-language residue) score low.

    score(d) = avg over d's bigrams of ln((c(w1,w2)+k) / (c(w1·)+k·V))
    — add-k smoothing over the observed continuation vocabulary V.

    Scale shape: ONE tokenize+bigram explode feeds both the model
    counts and the per-doc scoring (persisted — two consumers); the
    model tables aggregate to vocabulary size, so their joins back to
    the bigram stream broadcast at any corpus size. All JVM builtins.
    """
    from pyspark.sql import functions as F

    from vectordb_light_spark.session import persist_if_batch

    arr = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda x: x != ""
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("_t") - 1),
        lambda i: F.struct(
            F.element_at("_t", i.cast("int")).alias("w1"),
            F.element_at("_t", (i + 1).cast("int")).alias("w2"),
        ),
    )
    bg = persist_if_batch(
        docs.select(F.col(id_col), *extra_cols, arr.alias("_t"))
        .where(F.size("_t") >= 2)
        .select(F.col(id_col), *extra_cols, F.explode(pairs).alias("_p"))
        .select(F.col(id_col), *extra_cols, "_p.w1", "_p.w2")
    )
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c"))
    ws = bc.groupBy("w1").agg(F.sum("_c").alias("_cw1"))
    n_vocab = bg.select("w2").distinct().count()
    prob = (F.col("_c") + F.lit(add_k)) / (
        F.col("_cw1") + F.lit(add_k) * F.lit(float(n_vocab))
    )
    return (
        bg.join(bc, ["w1", "w2"])
        .join(ws, "w1")
        .groupBy(id_col, *extra_cols)
        .agg(F.round(F.avg(F.log(prob)), 4).alias("lm_score"))
    )
