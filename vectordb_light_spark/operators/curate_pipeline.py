"""Composable curation-pipeline runner: the CLI-facing chain over the
engine's corpus-curation operators (no reference analogue — the
reference is a retrieval GUI; this is the training-data side the
engine adds on top, per SURVEY §4).

A pipeline is an ordered list of STAGE NAMES from :data:`STAGES`;
each stage is a pure ``DataFrame -> DataFrame`` filter/transform over
``(doc_id, text, ...)`` built entirely from the already-tested
operators (exact/line dedup, learned quality gate, Gopher/C4 rules,
repetition, decontamination). :func:`run_curation` threads a corpus
through the chain and, when reporting, counts survivors per stage —
one action per stage on a persisted frame; with ``report=False`` the
whole chain stays ONE lazy plan (zero intermediate actions) so the
100 TB run costs exactly the final write.

Stage contracts:
- every stage preserves the input schema (extra columns pass through);
- filters only DROP rows, transforms may rewrite ``text``;
- survivors keep their original ``doc_id`` (deterministic — min-id or
  keep-first semantics throughout, never partition order).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stage_exact_dedup(df: DataFrame, ctx: dict) -> DataFrame:
    from vectordb_light_spark.operators.dedup import exact_dedup

    return exact_dedup(df)


def _stage_line_dedup(df: DataFrame, ctx: dict) -> DataFrame:
    """Keep-first segment dedup, then drop docs whose every segment
    was already seen (their rewrite is empty)."""
    from vectordb_light_spark.operators.dedup import dedup_lines_keep_first

    sep = ctx.get("line_sep", "\n")
    rewritten = dedup_lines_keep_first(
        df.select("doc_id", "text"), sep=sep
    ).withColumnRenamed("text", "__new_text")
    return (
        df.drop("text")
        .join(rewritten, "doc_id")
        .withColumnRenamed("__new_text", "text")
        .where(F.length(F.trim("text")) > 0)
    )


def _stage_quality(df: DataFrame, ctx: dict) -> DataFrame:
    """Learned quality gate (the distilled classifier, integer
    micro-logits): keep documents scoring above σ(0) = 0.5. Gated IN
    PLACE with the logit column expression — a join back against the
    scored frame would re-execute every upstream stage a second time
    (measured ~2× on the composed chain)."""
    from vectordb_light_spark.functions.quality_weights import (
        BIAS_Q,
        WEIGHTS_Q,
    )
    from vectordb_light_spark.operators.quality_model import (
        quality_logit_column,
    )

    return df.where(quality_logit_column(WEIGHTS_Q, BIAS_Q) > 0)


def _stage_gopher(df: DataFrame, ctx: dict) -> DataFrame:
    """Gopher rule gate. ``ctx['gopher_stopwords']`` swaps the
    required-stopword set — MANDATORY knowledge for non-English or
    synthetic corpora: with the default 8 English function words,
    a corpus containing none of them keeps structurally ZERO rows
    (the r6 finding on the driver testdata)."""
    from vectordb_light_spark.functions.text import (
        GOPHER_STOPWORDS,
        gopher_rules,
    )

    stopwords = tuple(ctx.get("gopher_stopwords") or GOPHER_STOPWORDS)
    return df.where(gopher_rules(F.col("text"), stopwords)["keep"])


def _stage_c4(df: DataFrame, ctx: dict) -> DataFrame:
    """C4 page gate + line cleaning: drops blocked pages and rewrites
    ``text`` to the kept lines."""
    from vectordb_light_spark.functions.text import c4_rules

    rules = c4_rules(F.col("text"))
    return (
        df.where(rules["keep"])
        .withColumn("text", c4_rules(F.col("text"))["cleaned_text"])
        .where(F.length(F.trim("text")) > 0)
    )


def _stage_repetition(df: DataFrame, ctx: dict) -> DataFrame:
    """Gopher duplicate-n-gram heuristic: drop documents whose token
    3-grams repeat above the bar (generated/spammy text)."""
    from vectordb_light_spark.operators.dedup import (
        ngram_tokens,
        token_ngrams_from_tokens,
    )

    bar = float(ctx.get("repetition_bar", 0.20))
    staged = df.withColumn("__toks", ngram_tokens(F.col("text"))).withColumn(
        "__grams", token_ngrams_from_tokens(F.col("__toks"), 3)
    )
    dup = 1.0 - F.size(F.array_distinct("__grams")).cast("double") / F.size(
        "__grams"
    )
    return staged.where(dup <= bar).drop("__toks", "__grams")


def _stage_decontaminate(df: DataFrame, ctx: dict) -> DataFrame:
    """Drop documents sharing any token n-gram with the benchmark
    corpus (requires ``ctx['bench']``)."""
    from vectordb_light_spark.operators.dedup import ngram_contamination

    bench = ctx.get("bench")
    if bench is None:
        raise ValueError(
            "the 'decontaminate' stage needs ctx['bench'] "
            "(a DataFrame with a text column; CLI: --bench PATH)"
        )
    n = int(ctx.get("decontaminate_n", 8))
    clean = ngram_contamination(
        df.select("doc_id", "text"), bench, n=n
    ).where(~F.col("contaminated"))
    return df.join(clean.select("doc_id"), "doc_id")


def _stage_bloom_decontaminate(df: DataFrame, ctx: dict) -> DataFrame:
    """Bloom-filter decontamination (requires ``ctx['bench']``): the
    constant-memory tier for benchmark sets too big to broadcast as
    exact keys — a 16 KiB word array rides into the probe projection
    as a literal, so the probe touches no second table at all.
    Deterministic false positives (never false negatives) are the
    priced trade; docs that emit no grams (empty text) probe clean.
    A prebuilt filter can be passed as ``ctx['bloom_words']`` to
    amortize the build across runs."""
    from vectordb_light_spark.operators.dedup import (
        bloom_build,
        bloom_decontaminate,
    )

    bench = ctx.get("bench")
    words = ctx.get("bloom_words")
    if bench is None and words is None:
        raise ValueError(
            "the 'bloom_decontaminate' stage needs ctx['bench'] (a "
            "DataFrame with a text column; CLI: --bench PATH) or a "
            "prebuilt ctx['bloom_words'] word array"
        )
    n = int(ctx.get("decontaminate_n", 8))
    if words is None:
        words = bloom_build(bench, n=n)
    flagged = bloom_decontaminate(df.select("doc_id", "text"), words, n=n)
    return df.join(
        flagged.where(F.col("contaminated") == 1).select("doc_id"),
        "doc_id",
        "left_anti",
    )


def _stage_readability(df: DataFrame, ctx: dict) -> DataFrame:
    """Flesch-Kincaid readability gate (the FineWeb-Edu-style
    difficulty signal, exact integer milligrade math): keep documents
    at or below ``ctx['readability_max_grade_milli']`` (default 30000
    = FK grade 30.0) and, when set, at or above
    ``ctx['readability_min_grade_milli']``. Gated IN PLACE — the
    grade is a pure column expression, so the gate rides the scan."""
    from vectordb_light_spark.functions.text import (
        flesch_kincaid_grade_milli,
        readability_counts,
    )

    c = readability_counts("text")
    grade = flesch_kincaid_grade_milli(
        c["n_words"], c["n_sentences"], c["n_syllables"]
    )
    cond = grade <= int(ctx.get("readability_max_grade_milli", 30000))
    min_g = ctx.get("readability_min_grade_milli")
    if min_g is not None:
        cond = cond & (grade >= int(min_g))
    return df.where(cond)


def _stage_curriculum(df: DataFrame, ctx: dict) -> DataFrame:
    """Terminal ORDERING stage (drops nothing): curriculum-order the
    survivors easy-first by the exact-integer FK milligrade (or any
    column named by ``ctx['curriculum_score_col']``), with the
    deterministic within-stage shuffle from sampling.curriculum_order.
    Schema passes through unchanged; only row order changes — put it
    LAST so the written corpus streams to the trainer in curriculum
    order."""
    from vectordb_light_spark.operators.sampling import curriculum_order

    # The stage consumes its input TWICE (the scoring projection and
    # the final order join-back) — checkpoint it so the upstream gate
    # chain runs once. EAGER (r12): concurrent AQE query-stage
    # materialization defeats a lazy checkpoint's run-once intent
    # (see _stage_split).
    df = df.localCheckpoint(eager=True)
    score_col = ctx.get("curriculum_score_col")
    if score_col is not None:
        scored = df.select("doc_id", F.col(score_col).alias("score"))
    else:
        from vectordb_light_spark.functions.text import (
            flesch_kincaid_grade_milli,
            readability_counts,
        )

        c = readability_counts("text")
        scored = df.select(
            "doc_id",
            flesch_kincaid_grade_milli(
                c["n_words"], c["n_sentences"], c["n_syllables"]
            ).alias("score"),
        )
    ranked = curriculum_order(
        scored,
        n_stages=int(ctx.get("curriculum_stages", 10)),
        seed=int(ctx.get("curriculum_seed", 0)),
    )
    return (
        df.join(
            ranked.select("doc_id", "stage", "curriculum_key"), "doc_id"
        )
        .orderBy("stage", "curriculum_key", "doc_id")
        .drop("stage", "curriculum_key")
    )


def _stage_split(df: DataFrame, ctx: dict) -> DataFrame:
    """Terminal ANNOTATION stage (drops nothing): add a leakage-safe
    ``split`` column — near-dup clusters from the MinHash->CC fixed
    point (pointer-jumping, O(log D) rounds) route every document by
    its CLUSTER label through the deterministic md5-threshold CASE,
    so a test document can never have a near-copy in train (the
    registered `pipe_leakage_safe_split` machinery; the store-level
    twin is VectorDB.train_val_test_split). Weights come from
    ``ctx['split_weights']`` ({name: frac}, default 0.8/0.1/0.1);
    ``ctx['split_jaccard']`` (default 0.75) sets the near-dup bar.
    Put it AFTER every gate but BEFORE `curriculum`: the annotation
    join reshuffles rows, so running it after an ORDERING stage would
    silently discard the curriculum order (curriculum's sort is the
    terminal contract; this stage only adds a column).

    IN-PLACE routing (r12, VERDICT r11 item 5): the r11 draft built a
    full-size (doc_id, split) routing table from ``df`` and
    inner-joined it back — a second full-data exchange right before
    the curriculum range sort (the chain+split probe's ~1.4x-above-
    linear x16 increment). The split column is now computed on ``df``
    directly: one LEFT join against the (small, dup-docs-only)
    cluster table, then the map-side md5-threshold CASE — so +split
    adds no full-data exchange of its own and the curriculum sort
    stays the chain's only range exchange."""
    from vectordb_light_spark.operators.components import (
        duplicate_clusters,
    )
    from vectordb_light_spark.operators.dedup import (
        canonical_text,
        minhash_lsh_candidates,
    )
    from vectordb_light_spark.operators.sampling import assign_split

    weights = ctx.get("split_weights") or {
        "train": 0.8, "val": 0.1, "test": 0.1,
    }
    # The stage consumes its input several times (candidate
    # generation, the routing join), and in a composed chain that
    # input is the whole gate pipeline. EAGER checkpoint (r12): with
    # eager=False, AQE materializes the consumers' independent query
    # stages CONCURRENTLY, and jobs racing before the first completes
    # each recompute the full gate chain (measured: four identical
    # ~5.3 s stages inside one run of pipe_curate_split_chain — at
    # scale that is four corpus passes the checkpoint was meant to
    # prevent). Eager materialization runs the gates exactly once;
    # every consumer then reads the checkpointed blocks.
    df = df.localCheckpoint(eager=True)
    base = df.where(F.length(canonical_text("text")) > 0)
    # ctx['split_lsh']: optional kwargs forwarded to the candidate
    # generator — the registered chain+split entry pins the oracle's
    # family/geometry (16 hashes / 4 bands / poly31, uncapped) here
    # min_est pushes the Jaccard threshold below the pair-dedup
    # exchange (r12): sub-threshold candidates never shuffle.
    pairs = minhash_lsh_candidates(
        base.select("doc_id", "text"),
        min_est=float(ctx.get("split_jaccard", 0.75)),
        **(ctx.get("split_lsh") or {}),
    )
    clusters = duplicate_clusters(
        pairs, left_id="id_a", right_id="id_b", pointer_jumping=True
    ).select("doc_id", F.col("cluster_id").alias("_split_route"))
    return assign_split(
        df.join(clusters, "doc_id", "left").withColumn(
            "_split_route", F.coalesce("_split_route", F.col("doc_id"))
        ),
        weights,
        id_col="_split_route",
        seed=int(ctx.get("split_seed", 0)),
    ).drop("_split_route")


#: name -> stage callable. Order in a pipeline is the caller's choice;
#: the conventional cheap-to-expensive chain is the `DEFAULT_STAGES`.
STAGES: dict[str, Callable[[DataFrame, dict], DataFrame]] = {
    "exact_dedup": _stage_exact_dedup,
    "line_dedup": _stage_line_dedup,
    "quality": _stage_quality,
    "gopher": _stage_gopher,
    "c4": _stage_c4,
    "repetition": _stage_repetition,
    "decontaminate": _stage_decontaminate,
    "bloom_decontaminate": _stage_bloom_decontaminate,
    "readability": _stage_readability,
    "curriculum": _stage_curriculum,
    "split": _stage_split,
}

DEFAULT_STAGES = ("exact_dedup", "repetition", "gopher", "quality")


def run_curation(
    docs: DataFrame,
    stages: list[str] | tuple[str, ...] = DEFAULT_STAGES,
    *,
    report: bool = True,
    **ctx,
) -> tuple[DataFrame, list[dict]]:
    """Thread a corpus through the named stages.

    Returns ``(survivors, stage_reports)``. With ``report=True`` each
    stage's frame persists and one count action runs per stage (the
    numbers a curation run wants to log); with ``report=False`` the
    reports carry no counts and the chain composes into ONE lazy plan
    — at 100 TB the pipeline then costs exactly the final action."""
    unknown = [s for s in stages if s not in STAGES]
    if unknown:
        raise ValueError(f"unknown curation stages {unknown}; have {sorted(STAGES)}")
    from vectordb_light_spark.session import persist_if_batch

    reports: list[dict] = []
    cur = docs
    prev_persisted: DataFrame | None = None
    n_in = cur.count() if report else None
    for name in stages:
        cur = STAGES[name](cur, ctx)
        if report:
            cur = persist_if_batch(cur)
            n_out = cur.count()
            # The count above materialized THIS stage's cache, so the
            # previous stage's frame is no longer read by anything —
            # release it now instead of pinning every intermediate
            # frame in executor memory for the session (long chains
            # would otherwise hold O(stages) copies of the corpus).
            if prev_persisted is not None:
                prev_persisted.unpersist()
            prev_persisted = cur
            reports.append(
                {"stage": name, "rows_in": n_in, "rows_out": n_out,
                 "dropped": n_in - n_out}
            )
            n_in = n_out
        else:
            reports.append({"stage": name})
    return cur, reports
