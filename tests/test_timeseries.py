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
