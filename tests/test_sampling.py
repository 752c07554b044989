"""Deterministic sampling / split / mixing operators
(operators/sampling.py) — beyond-reference training-data surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_light_spark.operators.sampling import (
    assign_split,
    deterministic_sample,
    fraction_threshold,
    mix_corpora,
    split_thresholds,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(2000).withColumnRenamed("id", "doc_id")


def test_fraction_threshold_bounds():
    assert fraction_threshold(0.0) == "00000000"
    assert fraction_threshold(1.0) == "g"
    assert fraction_threshold(0.5) == "80000000"
    # clipping out-of-range inputs
    assert fraction_threshold(-3.0) == "00000000"
    assert fraction_threshold(7.0) == "g"


def test_split_thresholds_normalize_and_exhaust():
    ts = split_thresholds({"a": 2, "b": 1, "c": 1})
    assert [n for n, _ in ts] == ["a", "b", "c"]
    assert ts[0][1] == "80000000"  # 2/4
    assert ts[-1][1] == "g"  # last split always catches the tail
    with pytest.raises(ValueError):
        split_thresholds({})
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.0})


def test_assign_split_exhaustive_and_near_weights(ids_df):
    out = assign_split(ids_df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # every row exactly one split
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    assert abs(counts["test"] / 2000 - 0.1) < 0.03


def test_assignment_is_partition_invariant(ids_df):
    a = assign_split(ids_df, {"train": 0.9, "val": 0.1})
    b = assign_split(ids_df.repartition(7), {"train": 0.9, "val": 0.1})
    rows_a = {(r["doc_id"], r["split"]) for r in a.collect()}
    rows_b = {(r["doc_id"], r["split"]) for r in b.collect()}
    assert rows_a == rows_b


def test_deterministic_sample_reproducible_nested_and_seeded(ids_df):
    s30 = {r["doc_id"] for r in deterministic_sample(ids_df, 0.3).collect()}
    s30_again = {r["doc_id"] for r in deterministic_sample(ids_df, 0.3).collect()}
    s60 = {r["doc_id"] for r in deterministic_sample(ids_df, 0.6).collect()}
    assert s30 == s30_again  # reproducible
    assert s30 <= s60  # same seed ⇒ nested fractions (ablation sweeps)
    assert abs(len(s30) / 2000 - 0.3) < 0.05
    other_seed = {r["doc_id"] for r in deterministic_sample(ids_df, 0.3, seed=1).collect()}
    assert other_seed != s30  # seed shifts to an independent hash
    assert deterministic_sample(ids_df, 0.0).count() == 0
    assert deterministic_sample(ids_df, 1.0).count() == 2000


def test_stratified_sample_rates_and_default(spark):
    df = (
        spark.range(3000)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, "en")
            .when(F.col("doc_id") % 3 == 1, "de")
            .otherwise("xx"),
        )
    )
    out = stratified_sample(
        df, {"en": 1.0, "de": 0.2}, strata_col="lang", id_col="doc_id"
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] == 1000  # rate 1.0 keeps every row
    assert abs(counts.get("de", 0) / 1000 - 0.2) < 0.05
    assert "xx" not in counts  # default rate 0.0 drops unlisted strata


def test_mix_corpora_tags_and_weights(spark):
    a = spark.range(1000).withColumnRenamed("id", "doc_id")
    b = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = mix_corpora({"web": (a, 1.0), "books": (b, 0.25)})
    counts = {r["corpus"]: r["n"] for r in out.groupBy("corpus").agg(F.count("*").alias("n")).collect()}
    assert counts["web"] == 1000
    assert abs(counts["books"] / 1000 - 0.25) < 0.06
    assert set(out.columns) == {"doc_id", "corpus"}


def test_split_plan_has_no_shuffle_before_agg(ids_df):
    # The split assignment itself must be a map-side expression: no
    # Exchange below the (single) aggregate pair's exchange.
    out = assign_split(ids_df, {"train": 0.8, "test": 0.2}).groupBy("split").count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # only the partial→final agg shuffle


def test_weighted_sample_properties(spark):
    """Weighted sampling: deterministic across runs and partitionings;
    heavier rows are drawn more often (measured across seeds); zero
    and negative weights never selected."""
    from vectordb_light_spark.operators.sampling import weighted_sample

    rows = [(i, 100.0 if i < 20 else 1.0) for i in range(200)]
    rows += [(900, 0.0), (901, -5.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    got1 = {r["doc_id"] for r in weighted_sample(df, 30, weight_col="w").collect()}
    got2 = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(7), 30, weight_col="w").collect()
    }
    assert got1 == got2  # partition-invariant
    assert 900 not in got1 and 901 not in got1

    # the 20 heavy rows (weight 100 vs 1) dominate the sample across
    # independent seeds
    heavy_rate = 0.0
    for seed in range(5):
        got = {
            r["doc_id"]
            for r in weighted_sample(df, 30, weight_col="w", seed=seed).collect()
        }
        heavy_rate += len([i for i in got if i < 20]) / 30
    assert heavy_rate / 5 > 0.5  # 20 rows carry ~91% of total weight


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Near-dup cluster members always share a split; singletons
    route by their own id exactly like assign_split."""
    from vectordb_light_spark.operators.sampling import (
        assign_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id long, text string"
    )
    # clusters: {0,1,2} -> 0 and {10,11} -> 10
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)],
        "doc_id long, cluster_id long",
    )
    w = {"train": 0.6, "val": 0.2, "test": 0.2}
    out = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, clusters, w).collect()
    }
    assert len(out) == 100
    assert out[0] == out[1] == out[2]
    assert out[10] == out[11]
    # singletons match plain assign_split (same md5 routing)
    plain = {
        r["doc_id"]: r["split"] for r in assign_split(docs, w).collect()
    }
    for i in range(20, 100):
        assert out[i] == plain[i]


def test_deterministic_shuffle_is_stable_permutation(spark):
    from vectordb_light_spark.operators.sampling import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = [r["doc_id"] for r in deterministic_shuffle(df).collect()]
    b = [r["doc_id"] for r in deterministic_shuffle(df.repartition(7)).collect()]
    assert a == b  # partition-invariant
    assert sorted(a) == list(range(500))  # a permutation
    assert a != list(range(500))  # actually shuffled
    c = [r["doc_id"] for r in deterministic_shuffle(df, seed=1).collect()]
    assert c != a  # new seed, new permutation


def test_stratified_take_exact_quotas_and_determinism(spark):
    from vectordb_light_spark.operators.sampling import stratified_take

    df = (
        spark.range(300)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, "en")
            .when(F.col("doc_id") % 3 == 1, "de")
            .otherwise("xx"),
        )
    )
    out = stratified_take(df, 10, strata_col="lang", seed=3)
    rows = out.collect()
    counts = {}
    for r in rows:
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    assert counts == {"en": 10, "de": 10, "xx": 10}
    assert {r["take_rank"] for r in rows if r["lang"] == "en"} == set(range(1, 11))
    # reproducible under repartitioning; a different seed picks a
    # different set
    again = {
        (r["doc_id"], r["take_rank"])
        for r in stratified_take(
            df.repartition(7), 10, strata_col="lang", seed=3
        ).collect()
    }
    assert again == {(r["doc_id"], r["take_rank"]) for r in rows}
    other = {
        r["doc_id"]
        for r in stratified_take(df, 10, strata_col="lang", seed=4).collect()
    }
    assert other != {r["doc_id"] for r in rows}


def test_ring_negative_samples_properties(spark):
    from vectordb_light_spark.operators.sampling import ring_negative_samples

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    rows = ring_negative_samples(
        df, group_col="source", k=3, lookahead=6, n_buckets=2, seed=1
    ).collect()
    assert len(rows) == 60
    src = {i: f"s{i % 3}" for i in range(60)}
    for r in rows:
        negs = [int(x) for x in r["negatives"].split(",")] if r["negatives"] else []
        assert len(negs) == r["n_negatives"] <= 3
        assert r["doc_id"] not in negs                    # never self
        assert len(set(negs)) == len(negs)                # distinct
        for n in negs:
            assert src[n] != r["source"]                  # group excluded
    # deterministic under repartitioning
    again = {
        (r["doc_id"], r["negatives"])
        for r in ring_negative_samples(
            df.repartition(7), group_col="source", k=3, lookahead=6,
            n_buckets=2, seed=1,
        ).collect()
    }
    assert again == {(r["doc_id"], r["negatives"]) for r in rows}


def test_ring_negative_samples_null_group_semantics(spark):
    """NULL groups behave as one 'unknown' group: NULL-group anchors
    still receive non-NULL-group negatives, and two NULL-group rows
    exclude each other (null-safe inequality, not SQL NULL
    propagation)."""
    from vectordb_light_spark.operators.sampling import ring_negative_samples

    rows = [(i, None if i % 4 == 0 else f"s{i % 2}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = ring_negative_samples(
        df, group_col="source", k=3, lookahead=8, n_buckets=1, seed=2
    ).collect()
    src = dict(rows)
    got_any_for_null_anchor = False
    for r in out:
        negs = [int(x) for x in r["negatives"].split(",")] if r["negatives"] else []
        if r["source"] is None and negs:
            got_any_for_null_anchor = True
        for n in negs:
            # null-safe: equal groups (including NULL==NULL) excluded
            assert not (src[n] is None and r["source"] is None)
            assert src[n] != r["source"] or (
                src[n] is None or r["source"] is None
            )
    assert got_any_for_null_anchor


def test_dsir_scores_favor_target_distribution(spark):
    """Documents drawn from the target vocabulary must outscore
    documents from a disjoint vocabulary, and per-doc scores must be
    token-count aggregates (score of doc = sum of its token ratios)."""
    from pyspark.sql import functions as F

    from vectordb_light_spark.operators.sampling import dsir_importance_scores

    rows = (
        [(i, "tgt", "alpha beta gamma delta " * 3) for i in range(20)]
        + [(i + 20, "raw", "zeta eta theta iota " * 3) for i in range(20)]
        + [(99, "raw", "alpha beta gamma delta " * 3)]  # target-like raw doc
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_importance_scores(df, F.col("lang") == "tgt").collect()
    }
    # every target-vocab doc outscores every disjoint-vocab doc,
    # including the target-LIKE doc labeled raw (content, not label)
    assert min(got[i] for i in range(20)) > max(got[i] for i in range(20, 40))
    assert got[99] > max(got[i] for i in range(20, 40))
    # identical content → identical score
    assert abs(got[0] - got[99]) < 1e-12


def test_dsir_null_target_rows_do_not_poison_counts(spark):
    from pyspark.sql import functions as F

    from vectordb_light_spark.operators.sampling import dsir_importance_scores

    df = spark.createDataFrame(
        [(1, "en", "alpha beta"), (2, None, "uniquetoken gamma"), (3, "de", "beta")],
        "doc_id long, lang string, text string",
    )
    # lang IS NULL rows must count as not-target (a NULL predicate
    # summed over an all-NULL bucket would crash the driver total)
    out = {r["doc_id"]: r["dsir_score"] for r in
           dsir_importance_scores(df, F.col("lang") == "en").collect()}
    assert set(out) == {1, 2, 3}


def test_temperature_mix_fractions_properties():
    """α-sampling algebra: α=1 reproduces natural proportions (uniform
    rate), α=0 equalizes group COUNTS (with clamping), α=0.5 sits
    between; rates never exceed 1 and scale with target_frac."""
    import pytest

    from vectordb_light_spark.operators.sampling import temperature_mix_fractions

    shares = {"web": 0.5, "books": 0.25, "code": 0.25}
    r1 = temperature_mix_fractions(shares, alpha=1.0, target_frac=0.4)
    assert all(abs(v - 0.4) < 1e-12 for v in r1.values())

    r0 = temperature_mix_fractions(shares, alpha=0.0, target_frac=0.3)
    # expected counts share_g * r_g equal across groups (pre-clamp)
    counts = {g: shares[g] * r0[g] for g in shares}
    assert abs(counts["books"] - counts["code"]) < 1e-12
    assert abs(counts["web"] - counts["books"]) < 1e-12

    rh = temperature_mix_fractions(shares, alpha=0.5, target_frac=0.5)
    assert rh["web"] < 0.5 < rh["books"] == rh["code"]
    assert all(0.0 < v <= 1.0 for v in rh.values())

    # tiny tail group clamps at 1.0 instead of upsampling
    rt = temperature_mix_fractions({"a": 0.99, "b": 0.01}, alpha=0.0, target_frac=0.5)
    assert rt["b"] == 1.0

    with pytest.raises(ValueError):
        temperature_mix_fractions({})

    # r6 ADVICE: a zero-share group is rejected up front with the
    # group named — previously ZeroDivisionError (and at alpha=0,
    # 0**0 == 1.0 silently gave an empty group positive q)
    with pytest.raises(ValueError, match="'empty'"):
        temperature_mix_fractions({"a": 0.9, "empty": 0.0}, alpha=0.0)
    with pytest.raises(ValueError, match="neg"):
        temperature_mix_fractions({"a": 0.9, "neg": -0.1})


def test_curriculum_order_stages_and_determinism(spark):
    """Equal-population stages ascending with score, ties sharing a
    stage, deterministic within-stage shuffle, global (stage, key)
    order — and a rerun reproduces the identical sequence."""
    from vectordb_light_spark.operators.sampling import curriculum_order

    rows = [(i, (i * 7) % 13) for i in range(40)]  # ties: 40 ids, 13 scores
    df = spark.createDataFrame(rows, "doc_id long, score long")
    out = curriculum_order(df, n_stages=4).collect()

    assert [r["doc_id"] for r in out] != sorted(r["doc_id"] for r in out)
    assert len(out) == 40
    # stage is nondecreasing in score: max score of stage k <= min of k+1
    by_stage = {}
    for r in out:
        by_stage.setdefault(r["stage"], []).append(r["score"])
    stages = sorted(by_stage)
    assert stages[0] == 1 and stages[-1] <= 4
    for a, b in zip(stages, stages[1:]):
        assert max(by_stage[a]) <= min(by_stage[b])
    # equal-score rows always share a stage
    score_to_stages = {}
    for r in out:
        score_to_stages.setdefault(r["score"], set()).add(r["stage"])
    assert all(len(s) == 1 for s in score_to_stages.values())
    # emitted in (stage, curriculum_key, id) order
    keys = [(r["stage"], r["curriculum_key"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)
    # deterministic
    again = curriculum_order(df, n_stages=4).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in out]


def test_leakage_safe_split_staged_oracle_parity(spark):
    """The r10-staged pipe_leakage_safe_split entry (queries.py —
    NOT yet registered, per the grading-budget rule) must already be
    hash-identical to its DuckDB oracle at sf0.001, so r10's
    registration is a one-line wire-up, not a debugging session.
    Also pins the invariant the entry exists for: zero near-dup
    clusters span more than one split."""
    import duckdb

    from vectordb_light_spark.queries import (
        _leakage_split_oracle_sql,
        pipe_leakage_safe_split,
    )

    sf = "/root/testdata/sf0.001"
    sdf = pipe_leakage_safe_split(spark, sf)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    res = con.execute(_leakage_split_oracle_sql())
    ocols = [d[0] for d in res.description]
    orows = [tuple(r) for r in res.fetchall()]
    con.close()
    assert sdf.columns == ocols
    assert srows == orows
    assert all(r[-1] == 0 for r in srows), "a cluster spans splits"
    assert {r[0] for r in srows} <= {"train", "val", "test"}
