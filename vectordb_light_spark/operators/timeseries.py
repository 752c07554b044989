"""Time-series resampling: regular-grid densification (gap fill) and
carry-forward over an irregular event log.

Beyond-reference operator (the reference has no time-series surface):
the standard feature-store prep step before windowed training data —
align events to a fixed calendar grid so downstream windows see every
(key, bucket) cell, including empty ones.

Scale shape: one hash exchange on the key feeds the per-day aggregate,
the bounds aggregate, and the carry-forward window alike; the grid
explode is bounded by key-count × span-days, never by event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_daily_gapfill(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Densify an event log to one row per (key, calendar day) between
    each key's first and last event, with per-day aggregates, a gap
    flag, and last-observation-carried-forward.

    Returns (key, day [timestamp], n_events int, is_gap int,
    day_value_e4 long nullable, carry_value_e4 long nullable). Values
    are integer 1e-4 units, rounded per event BEFORE summing, so
    aggregates are exact under any partition order.

    Plan: groupBy (key, day) with map-side combine → per-key min/max
    bounds → ``sequence()``/``explode`` calendar grid (rows = keys ×
    span-days, independent of event volume) → left join back →
    carry-forward via ``last(ignorenulls)`` over the per-key day
    order. Every stage shuffles on the key only.
    """
    day = F.date_trunc("DAY", F.col(ts_col))
    per_day = events.groupBy(F.col(key_col), day.alias("day")).agg(
        F.count(F.lit(1)).cast("int").alias("n_events"),
        F.sum(F.round(F.col(value_col) * 10000).cast("long")).alias("day_value_e4"),
    )
    bounds = per_day.groupBy(key_col).agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    j = grid.join(per_day, [key_col, "day"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        key_col,
        "day",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.col("n_events").isNull().cast("int").alias("is_gap"),
        "day_value_e4",
        F.last("day_value_e4", ignorenulls=True).over(w).alias("carry_value_e4"),
    )
