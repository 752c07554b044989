"""Profiling aggregates (operators/profiling.py): exact tier vs
sketch tier, and sketch error bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_light_spark.operators.profiling import (
    corpus_profile,
    events_rollup,
    events_sketch_profile,
)
from vectordb_light_spark.session import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events")


def test_corpus_profile_median_interpolates(spark):
    docs = spark.createDataFrame(
        [(i, "en", "s", n) for i, n in enumerate([10, 20, 30, 40])],
        "doc_id long, lang string, source string, n_chars long",
    )
    row = corpus_profile(docs).collect()[0]
    assert row.median_size == 25.0  # (20+30)/2 — linear interpolation
    assert row.p90_size == pytest.approx(37.0)  # 10+0.9*3 rank → 30+0.7*10
    assert row.n_sources == 1 and row.n_docs == 4


def test_rollup_levels_are_consistent(events):
    out = events_rollup(events).collect()
    cells = {(r.event_type, r.day): (r.n_events, r.total_value) for r in out}
    grand = cells[("<all>", "<all>")]
    types = [k for k in cells if k[1] == "<all>" and k[0] != "<all>"]
    assert sum(cells[k][0] for k in types) == grand[0]
    per_day_n = sum(v[0] for k, v in cells.items() if "<all>" not in k)
    assert per_day_n == grand[0]
    # per-type total_value is the sum of its day cells (same rounding tier)
    for t, _ in types:
        day_sum = sum(
            v[1] for k, v in cells.items() if k[0] == t and k[1] != "<all>"
        )
        assert cells[(t, "<all>")][1] == pytest.approx(day_sum, abs=1e-2)


def test_sketch_bounds_vs_exact(events):
    sk = {r.event_type: r for r in events_sketch_profile(events).collect()}
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.percentile("value", F.array(F.lit(0.5), F.lit(0.95)))
            .alias("pct"),
        )
        .collect()
    }
    assert set(sk) == set(exact)
    for t, e in exact.items():
        # HLL++ rsd=0.01; allow 5 sigma + small-cardinality slack
        assert sk[t].approx_users == pytest.approx(e.users, rel=0.05)
        # GK rank error ≤ 1/accuracy → value within neighborhood of the
        # exact quantile; generous band in value space
        assert sk[t].p50_value == pytest.approx(e.pct[0], rel=0.02, abs=0.5)
        assert sk[t].p95_value == pytest.approx(e.pct[1], rel=0.02, abs=0.5)


def test_sketch_is_jvm_only_plan(events):
    plan = (
        events_sketch_profile(events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # partial + final HashAggregate pair around one exchange
    assert plan.count("HashAggregate") >= 2


def test_check_constraints_counts_and_order(spark):
    from vectordb_light_spark.operators.quality import check_constraints

    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, -1.0, None), (3, None, "c"), (4, 0.0, "d")],
        "id long, v double, s string",
    )
    out = check_constraints(
        df,
        {
            "v_non_negative": F.col("v") >= 0,
            "s_not_null": F.col("s").isNotNull(),
            "id_small": F.col("id") < 100,
        },
    ).collect()
    assert [r.rule for r in out] == ["v_non_negative", "s_not_null", "id_small"]
    by = {r.rule: r for r in out}
    # null predicate result (v = NULL) counts as a violation
    assert by["v_non_negative"].n_violations == 2
    assert by["s_not_null"].n_violations == 1
    assert by["id_small"].n_violations == 0 and by["id_small"].passed
    assert all(r.n_rows == 4 for r in out)


def test_check_constraints_single_scan_plan(spark):
    from vectordb_light_spark.operators.quality import check_constraints

    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("m"))
    out = check_constraints(
        df, {"a": F.col("id") >= 0, "b": F.col("m") < 7, "c": F.col("id") < 50}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range") == 1  # N rules, ONE pass over the source
    with pytest.raises(ValueError):
        check_constraints(df, {})


def test_bigram_lm_scores_rank_repetitive_above_unique(spark):
    """Docs made of the corpus's common bigrams score higher than a
    doc whose bigrams appear nowhere else."""
    from vectordb_light_spark.operators.profiling import bigram_lm_scores

    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common) for i in range(10)]
    rows.append((99, "zyx wvu tsr qpo nml kji"))  # unique bigrams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {r["doc_id"]: r["lm_score"] for r in bigram_lm_scores(df).collect()}
    assert scores[0] == scores[5]  # identical docs, identical score
    assert scores[99] < scores[0]  # improbable text scores lower
    assert all(v < 0 for v in scores.values())  # log-probs


def test_vocab_topk_counts_rank_and_coverage(spark):
    from vectordb_light_spark.operators.profiling import vocab_topk

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "A b  d"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = vocab_topk(docs, k=3, min_count=2).collect()
    # a:4 (lowercased), b:3, c/d:1 dropped by min_count
    assert [(r["token"], r["n"], r["rank"], r["cum_n"]) for r in out] == [
        ("a", 4, 1, 4),
        ("b", 3, 2, 7),
    ]


def test_vocab_topk_tie_break_and_k_cut(spark):
    from vectordb_light_spark.operators.profiling import vocab_topk

    docs = spark.createDataFrame(
        [(1, "z y z y x x w")], "doc_id long, text string"
    )
    out = vocab_topk(docs, k=2, min_count=1).collect()
    assert [r["token"] for r in out] == ["x", "y"]  # count ties → lexicographic


def test_sketch_contract_margins_at_graded_sfs(spark):
    """prof_events_sketch's bounded-contract oracle pins literal
    within-bound flags — so the actual estimate error must sit at
    ≥2x margin inside each published bound at BOTH graded SFs, or a
    routine estimate wobble could flip a flag and the driver hash
    (memory: contract oracles need measured 2x+ margins)."""
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = load_table(spark, sf_dir, "events")
        sk = {r.event_type: r for r in events_sketch_profile(ev).collect()}
        exact = {
            r.event_type: r
            for r in ev.groupBy("event_type")
            .agg(
                F.count_distinct("user_id").alias("users"),
                F.percentile(
                    "value",
                    F.array(*[F.lit(q) for q in (0.45, 0.55, 0.90, 0.99)]),
                ).alias("bands"),
            )
            .collect()
        }
        for t, e in exact.items():
            # HLL flag bound is 5% — require actual error ≤ 2.5%
            err = abs(sk[t].approx_users - e.users) / e.users
            assert err <= 0.025, (sf_dir, t, err)
        # GK's guarantee is in RANK space (value bands are skewed, so
        # a value-space margin would misread the heavy right tail):
        # flags bound p50 in ranks [0.45, 0.55] and p95 in [0.90,
        # 0.99]; require the estimate's actual rank at 2x margin
        # inside — p50 in [0.475, 0.525], p95 in [0.925, 0.97].
        ranks = (
            ev.join(
                spark.createDataFrame(
                    [(t, float(sk[t].p50_value), float(sk[t].p95_value))
                     for t in sk],
                    "event_type string, q50 double, q95 double",
                ),
                "event_type",
            )
            .groupBy("event_type")
            .agg(
                F.avg((F.col("value") <= F.col("q50")).cast("double"))
                .alias("r50"),
                F.avg((F.col("value") <= F.col("q95")).cast("double"))
                .alias("r95"),
            )
            .collect()
        )
        for r in ranks:
            assert 0.475 <= r.r50 <= 0.525, (sf_dir, r.event_type, r.r50)
            assert 0.925 <= r.r95 <= 0.970, (sf_dir, r.event_type, r.r95)
