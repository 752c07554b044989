"""Deterministic sampling, train/val/test splits, and corpus mixing.

Training-data pipelines need reproducible row-level routing: assign
every document to a split, downsample a corpus to a target rate, or
mix several corpora at chosen weights — and get the SAME answer on
every run, on any cluster size, in any engine. (The reference has no
split/sampling stage — its pipeline ingests whole directories,
vector_db_create.py:1 — so this module is part of the beyond-reference
training-data surface the task brief asks for.)

Design: hash-threshold routing. The routing key for a row is the
first 8 hex chars of ``md5(f"{id}:{seed}")`` — uniform over the 32-bit
keyspace — and a fraction ``f`` maps to the literal hex threshold
``format(round(f * 16**8), '08x')``; membership is a plain string
comparison against that literal (equal-length lowercase hex compares
lexicographically exactly like the number it encodes). This keeps the
whole operator a map-side Catalyst expression:

- **No shuffle, no RNG state, no UDF.** ``md5``/``substring``/``<``
  are whole-stage-codegen builtins; sampling 100 TB is a pure scan.
- **Partition- and order-invariant**, unlike ``DataFrame.sample``:
  assignment depends only on (id, seed), so repartitioning, AQE
  re-planning, or a different executor count cannot change it.
- **Cross-engine replayable**: any engine with md5 reproduces the
  assignment bit-for-bit — the DuckDB oracle SQL in queries.py is
  built from the same thresholds via :func:`bucket_sql` /
  :func:`split_case_sql`.

Fraction granularity is 1/2**32 — far below anything a corpus split
cares about. A fraction of exactly 1.0 uses the sentinel threshold
``'g'`` (every hex string sorts below it), so "keep everything"
needs no special casing in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


HEX_SPACE = 16**8  # 8 hex chars = 32 bits of the md5


# ---------------------------------------------------------------------------
# Routing-key primitives (shared by the Spark exprs and the oracle SQL)
# ---------------------------------------------------------------------------


def fraction_threshold(fraction: float) -> str:
    """Hex threshold literal for a keep-fraction in [0, 1].

    ``bucket < threshold`` keeps ~fraction of uniformly-hashed rows;
    1.0 returns the sentinel ``'g'`` which every 8-char hex string
    sorts below.
    """
    f = min(max(float(fraction), 0.0), 1.0)
    n = round(f * HEX_SPACE)
    return "g" if n >= HEX_SPACE else format(n, "08x")


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """(name, cumulative upper-bound hex) per split, in dict order.

    Weights are normalized; the last split's bound is forced to the
    ``'g'`` sentinel so the splits are exhaustive regardless of
    float rounding in the cumulative sum.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive number")
    out: list[tuple[str, str]] = []
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        out.append((name, fraction_threshold(cum)))
    out.append((names[-1], "g"))
    return out


def hash_bucket_column(id_col: Column | str, seed: int = 0) -> Column:
    """32-bit routing key as an 8-char lowercase hex string."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(
        F.md5(F.concat_ws(":", c.cast("string"), F.lit(str(int(seed))))), 1, 8
    )


def hex_prefix_mod(hex_col: Column, n: int) -> Column:
    """Uniform bucket id in [0, n) from the first 8 hex chars (32
    bits) of an md5-hex column — 2 chars would silently cap effective
    buckets at 256. Shared by the ring sampler and DSIR so the
    Spark-vs-oracle bucketing can never diverge between call sites."""
    return (
        F.conv(F.substring(hex_col, 1, 8), 16, 10).cast("long") % n
    ).cast("int")


def bucket_sql(id_expr: str, seed: int = 0) -> str:
    """ANSI-SQL twin of :func:`hash_bucket_column` (same bytes)."""
    return f"substr(md5(concat_ws(':', CAST({id_expr} AS VARCHAR), '{int(seed)}')), 1, 8)"


# ---------------------------------------------------------------------------
# Operators
# ---------------------------------------------------------------------------


def split_column(
    id_col: Column | str, weights: dict[str, float], *, seed: int = 0
) -> Column:
    """Split-name CASE expression over the routing key."""
    b = hash_bucket_column(id_col, seed=seed)
    expr = None
    for name, thr in split_thresholds(weights):
        cond = b < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def split_case_sql(id_expr: str, weights: dict[str, float], *, seed: int = 0) -> str:
    """ANSI-SQL twin of :func:`split_column`, for oracle queries."""
    b = bucket_sql(id_expr, seed=seed)
    whens = "".join(
        f" WHEN {b} < '{thr}' THEN '{name}'" for name, thr in split_thresholds(weights)
    )
    return f"CASE{whens} END"


def assign_split(
    df: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic split column (e.g. train/val/test).

    Weights need not sum to 1 (normalized). Every row gets exactly
    one split; assignment is a pure function of (id, seed).
    """
    return df.withColumn(out_col, split_column(id_col, weights, seed=seed))


def deterministic_sample(
    df: DataFrame, fraction: float, *, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep ~fraction of rows, chosen by id hash — reproducible
    across runs/partitionings, and disjoint samples come free:
    ``seed`` shifts to an independent hash, while the SAME seed at
    fractions f1 < f2 gives nested samples (f1 ⊂ f2), which is what
    corpus-ablation sweeps want.
    """
    b = hash_bucket_column(id_col, seed=seed)
    return df.where(b < F.lit(fraction_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum keep-rates (e.g. downweight one language): the
    threshold becomes a CASE over the stratum value; still a single
    map-side filter, no shuffle, no per-stratum passes.
    """
    b = hash_bucket_column(id_col, seed=seed)
    s = F.col(strata_col)
    thr = None
    for name, frac in fractions.items():
        t = F.lit(fraction_threshold(frac))
        thr = F.when(s == name, t) if thr is None else thr.when(s == name, t)
    default = F.lit(fraction_threshold(default_fraction))
    thr = default if thr is None else thr.otherwise(default)
    return df.where(b < thr)


def temperature_mix_fractions(
    shares: dict[str, float],
    *,
    alpha: float = 0.5,
    target_frac: float = 1.0,
) -> dict[str, float]:
    """Per-group keep-rates for TEMPERATURE-based corpus mixing (the
    multilingual/source balance lever of GPT-3 / mT5 / XLM-R:
    sampling probability ∝ size^α flattens the head and lifts the
    tail; α=1 is natural proportions, α=0 is uniform-by-group).

    Given each group's corpus SHARE (n_g / N — scale-free, so the
    rates are valid at any proportionally-grown SF) returns the rate
    r_g = target_frac · q_g / share_g with q_g ∝ share_g^α, clamped
    to 1.0 (filter-based sampling cannot upsample; a clamped tail
    group simply contributes all of itself — the standard
    without-replacement behavior). Feed the result STRAIGHT to
    :func:`stratified_sample`; for an oracle-exact pipeline convert
    each rate with :func:`fraction_threshold` ONCE and inject the
    same hex literal into both engines — zero cross-engine float
    arithmetic."""
    if not shares:
        raise ValueError("shares must be non-empty")
    bad = sorted(g for g, s in shares.items() if not s > 0)
    if bad:
        # r6 ADVICE: a zero share used to hit 0-division in the rate
        # (and 0**0 == 1.0 at alpha=0 made q positive for an empty
        # group) — reject up front with the offending groups named
        raise ValueError(
            f"every share must be > 0; got non-positive shares for {bad} "
            "(drop empty groups before mixing)"
        )
    total = sum(shares.values())
    q = {g: (s / total) ** alpha for g, s in shares.items()}
    qt = sum(q.values())
    return {
        g: min(1.0, target_frac * (q[g] / qt) / (shares[g] / total))
        for g in shares
    }


def stratified_take(
    df: DataFrame,
    n: int,
    *,
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """EXACT per-stratum quotas (balanced eval/calibration sets):
    rank rows inside each stratum by a seeded md5 of the id —
    reproducible across runs, partitionings, and engines — and keep
    the first ``n``. Adds ``take_rank`` (1..n within the stratum).

    Contrast with :func:`stratified_sample` (rate-based, shuffle-free,
    approximate counts): exact quotas need a per-stratum rank, so this
    costs one hash exchange on the stratum key plus a per-stratum
    sort. At extreme stratum cardinalities flip back to rate-based
    with a sampled-quantile threshold instead of a full rank.
    """
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    return df.withColumn(
        "take_rank", F.row_number().over(w).cast("int")
    ).where(F.col("take_rank") <= n)


def dsir_importance_scores(
    docs: DataFrame,
    target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style data selection (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023 — public
    method, re-implemented on hashed unigrams): score every document
    by how much more likely its tokens are under the TARGET
    distribution (rows where ``target`` is true) than under the raw
    corpus — the importance weight ``Σ_tokens log(p_target/p_raw)``
    over ``n_buckets`` hashed token buckets with Laplace smoothing.
    Returns (id, dsir_score double, n_tok long); select by ranking or
    feed the exponentiated score to :func:`weighted_sample`.

    Scale shape: the bucket LM is ≤ ``n_buckets`` aggregate rows — ONE
    token-bucket shuffle builds target and raw counts together, the
    driver turns them into a log-ratio literal array, and scoring is a
    map-side ``element_at`` sum + one groupBy(id). No UDFs anywhere;
    the md5 bucket hash makes the whole pipeline engine-replicable.
    """
    import math

    toks = F.explode(
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda x: x != "",
        )
    ).alias("__t")
    b = docs.select(F.col(id_col), target.alias("__tgt"), toks).select(
        id_col,
        "__tgt",
        hex_prefix_mod(F.md5(F.col("__t")), n_buckets).alias("__bucket"),
    )
    # NOT persisted: the bucket-LM collect below and the returned
    # per-doc aggregate each scan the exploded tokens once either way
    # (the cache could not be dropped before the caller materializes
    # the result), and pinning a token-count-sized explode
    # MEMORY_AND_DISK for the rest of the session would contradict
    # the operator's own scale shape. Two cheap map-side passes beat
    # one leaked cache.
    counts = (
        b.groupBy("__bucket")
        .agg(
            F.count(F.lit(1)).alias("cr"),
            # coalesce: a NULL target predicate (e.g. lang IS NULL
            # rows) must count as not-target, not poison the sum —
            # an all-NULL bucket would return ct=None and crash the
            # driver-side total
            F.sum(F.coalesce(F.col("__tgt").cast("long"), F.lit(0))).alias("ct"),
        )
        .collect()
    )
    T = sum(r["ct"] for r in counts)
    R = sum(r["cr"] for r in counts)
    by_bucket = {r["__bucket"]: (r["ct"], r["cr"]) for r in counts}
    lr = [0.0] * n_buckets
    for i in range(n_buckets):
        ct, cr = by_bucket.get(i, (0, 0))
        lr[i] = math.log((ct + alpha) / (T + alpha * n_buckets)) - math.log(
            (cr + alpha) / (R + alpha * n_buckets)
        )
    from vectordb_light_spark.session import literal_array

    # one parsed expression — 256 per-element F.lit calls cost ~0.8 s
    # of py4j plan-construction wall per build (literal_array docstring);
    # repr + Spark's correctly-rounded parse keep every double bit-exact
    arr = literal_array(lr, "double")
    return (
        b.withColumn("__lr", F.element_at(arr, F.col("__bucket") + 1))
        .groupBy(id_col)
        .agg(
            F.sum("__lr").alias("dsir_score"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )


def ring_negative_samples(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    group_col: str | None = None,
    k: int = 3,
    lookahead: int = 6,
    n_buckets: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor's negatives are the next rows along a seeded-md5 ring,
    optionally skipping candidates that share ``group_col`` (e.g. same
    source — a trivial positive masquerading as a negative). Returns
    (id, group?, negatives: comma-joined id string, n_negatives int).

    Scale shape: rows hash into ``n_buckets`` independent rings
    (bucket = md5 prefix), so the orderings are per-bucket windows —
    one hash exchange, NO global single-partition sort. Each bucket
    sorts within one task, so SIZE ``n_buckets`` to the data: target
    ~1M rows per bucket (e.g. 1e9 rows → n_buckets=1024). Negative
    quality is unaffected by the split — buckets are themselves a
    uniform random partition, so within-bucket successors are an
    unbiased sample. Ring ends yield up to ``k`` fewer negatives
    (documented, deterministic); raise ``lookahead`` when group
    collisions are common.
    """
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    bucket = hex_prefix_mod(key, n_buckets)
    staged = df.select(
        F.col(id_col),
        *( [F.col(group_col)] if group_col else [] ),
        key.alias("__key"),
        bucket.alias("__bucket"),
    )
    w = Window.partitionBy("__bucket").orderBy("__key", F.col(id_col))
    cand_structs = [
        F.struct(
            F.lead(F.col(id_col), i).over(w).alias("nid"),
            (
                F.lead(F.col(group_col), i).over(w)
                if group_col
                else F.lit(None).cast("string")
            ).alias("ng"),
        )
        for i in range(1, lookahead + 1)
    ]
    cands = F.array(*cand_structs)
    if group_col:
        # null-safe inequality: NULL groups are treated as one
        # "unknown" group (two NULL-source docs exclude each other,
        # and a NULL-group anchor still receives non-NULL-group
        # negatives) — plain != would NULL out and drop every
        # candidate for NULL-group anchors.
        keep = F.filter(
            cands,
            lambda c: c["nid"].isNotNull()
            & ~c["ng"].eqNullSafe(F.col(group_col)),
        )
    else:
        keep = F.filter(cands, lambda c: c["nid"].isNotNull())
    negs = F.slice(F.transform(keep, lambda c: c["nid"]), 1, k)
    return staged.select(
        id_col,
        *( [group_col] if group_col else [] ),
        F.array_join(F.transform(negs, lambda x: x.cast("string")), ",").alias(
            "negatives"
        ),
        F.size(negs).cast("int").alias("n_negatives"),
    )


def mix_corpora(
    corpora: dict[str, tuple[DataFrame, float]],
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    source_col: str = "corpus",
) -> DataFrame:
    """Weighted union of corpora: sample each at its rate, tag with
    its name. Union is plan-level (no shuffle); each branch keeps its
    own pushed-down scan.
    """
    if not corpora:
        raise ValueError("corpora must be non-empty")
    parts = [
        deterministic_sample(df, frac, id_col=id_col, seed=seed).withColumn(
            source_col, F.lit(name)
        )
        for name, (df, frac) in corpora.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def weighted_key_column(
    id_col: Column | str, weight_col: Column | str, *, seed: int = 0
) -> Column:
    """Efraimidis–Spirakis weighted-sampling key ``-ln(u)/w`` (the
    exponential-jump form of key u^(1/w); public method, "Weighted
    random sampling with a reservoir", IPL 2006): the n rows with the
    SMALLEST keys are a weighted sample without replacement.

    u derives from the same md5 routing key as the unweighted
    samplers — ``(hex32 + 0.5) / 2^32`` ∈ (0,1) — so the draw is a
    pure function of (id, seed): partition-invariant, replayable in
    any engine with md5 (see :func:`weighted_key_sql`).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = hash_bucket_column(id_col, seed=seed)
    u = (F.conv(h, 16, 10).cast("double") + F.lit(0.5)) / F.lit(float(HEX_SPACE))
    return -F.log(u) / w.cast("double")


def weighted_key_sql(id_expr: str, weight_expr: str, *, seed: int = 0) -> str:
    """ANSI-SQL twin of :func:`weighted_key_column` (same bytes in,
    same double out up to libm ulp)."""
    b = bucket_sql(id_expr, seed=seed)
    return (
        f"-ln((CAST(concat('0x', {b}) AS UBIGINT) + 0.5) / {float(HEX_SPACE)!r})"
        f" / CAST({weight_expr} AS DOUBLE)"
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    *,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``n``
    rows: inclusion probability tracks ``weight_col`` (quality
    scores, dedup-cluster sizes, domain boosts…).

    Scale shape: the key is a map-side expression and the selection
    is ``TakeOrderedAndProject`` (per-task n-heaps, no sort, no
    shuffle of the table) — sampling 100 TB costs one scan. Rows
    with non-positive weights are excluded (their key is undefined).
    """
    key = weighted_key_column(id_col, weight_col, seed=seed)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_wkey", key)
        .orderBy(F.col("_wkey").asc(), F.col(id_col).asc())
        .limit(n)
        .drop("_wkey")
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    weights: dict[str, float],
    *,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates
    across splits: route every document by its duplicate-CLUSTER id,
    not its own id, so all members of a near-dup cluster land in the
    same split (the classic eval-contamination guard — a test doc
    whose near-copy sits in train silently inflates scores).

    ``clusters`` is (id_col, cluster_col) — e.g. from
    components.duplicate_clusters over MinHash candidate pairs.
    Singleton docs (absent from ``clusters``) route by their own id,
    which equals their would-be cluster id. The routing itself stays
    the same md5-threshold CASE as :func:`assign_split` — map-side,
    shuffle-free after the one broadcast-able join (the cluster table
    only holds docs that HAVE duplicates, a small fraction of any
    deduped corpus).
    """
    routed = docs.join(
        clusters.select(
            F.col(id_col), F.col(cluster_col).alias("_route")
        ),
        id_col,
        "left",
    ).withColumn("_route", F.coalesce("_route", F.col(id_col)))
    return assign_split(
        routed, weights, id_col="_route", seed=seed, out_col=out_col
    ).drop("_route")


def deterministic_shuffle(
    df: DataFrame, *, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Reproducible pseudo-random GLOBAL ordering of a corpus — the
    shuffle a training run needs before sequential reads: random-
    looking, but a pure function of (id, seed), so every re-run, any
    cluster size, any engine produces the SAME order (and a new seed
    gives an independent permutation).

    The sort key is the md5 routing hex (same primitive as the
    split/sample family). Scale shape: a global sort = ONE range
    exchange + in-partition sort; written out, the files form the
    shuffled corpus and readers just concatenate them in order.
    """
    return df.orderBy(hash_bucket_column(id_col, seed=seed), F.col(id_col))


def curriculum_order(
    scores: DataFrame,
    *,
    id_col: str = "doc_id",
    score_col: str = "score",
    n_stages: int = 10,
    seed: int = 0,
) -> DataFrame:
    """Curriculum data ordering (Bengio et al. 2009 applied to corpus
    scheduling): bucket documents into ``n_stages`` equal-population
    stages by ascending score rank, then order the corpus stage-by-
    stage with a deterministic pseudo-random shuffle WITHIN each stage
    — easy/low-score data first, hard data last, reproducibly.

    Stage assignment deliberately avoids a global row window (an
    ``ntile`` over 100 TB is one task): it builds the exact rank CDF
    over the DISTINCT-score table — ``groupBy(score)`` then a window
    over score VALUES, whose cardinality is the score domain, not the
    corpus — and maps ``stage = below·n_stages DIV total + 1`` (ties
    share the stage of their first member). The map joins back
    broadcast-style on the score, the within-stage key is the md5
    routing hex (any engine replays the permutation), and the final
    order is ONE range exchange. All integer math; no floats anywhere.

    Returns ``(id, score, stage, curriculum_key)`` ordered by
    ``(stage, curriculum_key, id)``.
    """
    cnt = scores.groupBy(score_col).agg(F.count("*").alias("_c"))
    w_cdf = Window.orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cdf = cnt.withColumn(
        "_below", F.coalesce(F.sum("_c").over(w_cdf), F.lit(0)).cast("long")
    ).withColumn(
        "_total", F.sum("_c").over(Window.partitionBy()).cast("long")
    )
    stage_map = cdf.select(
        score_col,
        (
            (
                ((F.col("_below") * F.lit(int(n_stages)))
                 - (F.col("_below") * F.lit(int(n_stages))) % F.col("_total"))
                .cast("decimal(38,0)")
                / F.col("_total").cast("decimal(38,0)")
            ).cast("long")
            + F.lit(1)
        ).cast("int").alias("stage"),
    )
    key = hash_bucket_column(id_col, seed=seed)
    return (
        scores.join(F.broadcast(stage_map), score_col)
        .withColumn("curriculum_key", key)
        .select(id_col, score_col, "stage", "curriculum_key")
        .orderBy("stage", "curriculum_key", id_col)
    )
