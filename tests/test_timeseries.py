"""resample_daily_gapfill: grid bounds, gap flags, carry-forward."""

from __future__ import annotations

import datetime

from vectordb_light_spark.operators.timeseries import resample_daily_gapfill


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour)


def test_gapfill_grid_flags_and_carry(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(1), 1.0),
            (1, _ts(1, 5), 2.0),
            # gap on the 2nd and 3rd
            (1, _ts(4), 10.0),
            (2, _ts(2), 7.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    rows = {
        (r["user_id"], r["day"].day): r
        for r in resample_daily_gapfill(ev).collect()
    }
    # user 1: 4-day grid from first to last event day
    assert {(u, d) for (u, d) in rows if u == 1} == {(1, 1), (1, 2), (1, 3), (1, 4)}
    d1 = rows[(1, 1)]
    assert (d1["n_events"], d1["is_gap"], d1["day_value_e4"]) == (2, 0, 30000)
    gap = rows[(1, 2)]
    assert (gap["n_events"], gap["is_gap"], gap["day_value_e4"]) == (0, 1, None)
    assert gap["carry_value_e4"] == 30000  # carried from day 1
    assert rows[(1, 3)]["carry_value_e4"] == 30000
    assert rows[(1, 4)]["carry_value_e4"] == 100000  # fresh observation
    # user 2: single-day span, no gaps
    assert {(u, d) for (u, d) in rows if u == 2} == {(2, 2)}
    assert rows[(2, 2)]["is_gap"] == 0


def test_gapfill_rows_scale_with_span_not_events(spark):
    # 100 events on two days → grid stays 2 rows
    data = [(5, _ts(10, h % 24), float(h)) for h in range(50)] + [
        (5, _ts(11, h % 24), float(h)) for h in range(50)
    ]
    ev = spark.createDataFrame(data, "user_id long, ts timestamp, value double")
    out = resample_daily_gapfill(ev).collect()
    assert len(out) == 2
    assert all(r["n_events"] == 50 for r in out)


def _ts(d, h=0):
    return datetime.datetime(2024, 1, d, h)


def _scd2_of(spark, rows):
    """One-shot SCD2 rebuild of a (key, eid, attr, ts) log — the
    ground truth scd2_merge must reproduce incrementally."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    log = spark.createDataFrame(
        rows, "k long, eid long, attr string, ts timestamp"
    )
    w = Window.partitionBy("k").orderBy("ts", "eid")
    return log.select(
        "k", "eid", "attr",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().cast("int").alias("is_current"),
    )


def test_scd2_merge_equals_rebuild(spark):
    """Incremental merge == one-shot rebuild: chains multiple batch
    changes per key, closes open rows at the batch's first change,
    inserts brand-new keys, passes untouched keys through."""
    from pyspark.sql import functions as F

    from vectordb_light_spark.operators.timeseries import scd2_merge

    hist = [
        (1, 10, "a", _ts(1)), (1, 11, "b", _ts(3)),   # key updated by batch
        (2, 20, "x", _ts(2)),                          # key untouched
    ]
    batch = [
        (1, 12, "c", _ts(5)), (1, 13, "d", _ts(7)),   # two chained changes
        (3, 30, "n", _ts(6)), (3, 31, "m", _ts(8)),   # new key, chained
    ]
    dim = _scd2_of(spark, hist)
    changes = spark.createDataFrame(
        batch, "k long, eid long, attr string, ts timestamp"
    )
    got = scd2_merge(
        dim, changes, key_col="k", ts_col="ts", order_cols=("eid",)
    )
    want = _scd2_of(spark, hist + batch)
    key = lambda r: (r["k"], r["eid"])
    assert sorted(map(tuple, got.collect()), key=lambda t: t[:2]) == sorted(
        map(tuple, want.collect()), key=lambda t: t[:2]
    )
    # untouched key 2 still open; key 1's old open row closed at _ts(5)
    rows = {(r["k"], r["eid"]): r for r in got.collect()}
    assert rows[(2, 20)]["is_current"] == 1
    assert rows[(1, 11)]["valid_to"] == _ts(5)
    assert rows[(1, 13)]["is_current"] == 1 and rows[(3, 31)]["is_current"] == 1


def test_scd2_merge_dim_is_not_shuffled(spark):
    """The dimension side must reach the output through anti/broadcast
    joins only — no exchange keyed on the dim (cost ∝ batch, the 100 TB
    MERGE contract). The only hash exchanges in the plan belong to the
    batch aggregate/window."""
    from vectordb_light_spark.operators.timeseries import scd2_merge

    dim = _scd2_of(spark, [(i, i, "a", _ts(1 + i % 5)) for i in range(200)])
    changes = spark.createDataFrame(
        [(1, 900, "z", _ts(20))], "k long, eid long, attr string, ts timestamp"
    )
    plan = scd2_merge(
        dim, changes, key_col="k", ts_col="ts", order_cols=("eid",)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
