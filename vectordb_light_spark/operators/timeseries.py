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


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    *,
    key_col: str,
    ts_col: str = "valid_from",
    order_cols: tuple[str, ...] = (),
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """CDC MERGE into an SCD-type-2 dimension (the warehouse
    ``MERGE INTO dim USING batch`` upsert, expressed as pure
    DataFrame ops — no table format required): each change row closes
    the key's open version and appends a new one.

    ``dim``: (key, attrs..., valid_from, valid_to, is_current) — the
    current SCD2 table. ``changes``: (key, attrs..., ts_col [+
    order_cols tie-breakers]) — the change batch; every change ts
    must be ≥ the key's open valid_from (standard CDC forward-append;
    out-of-order feeds need a repair pass first, as in any warehouse).

    Semantics = incremental equals rebuild: merging batch B into the
    SCD2 of history H yields exactly the SCD2 of H ∪ B — multiple
    changes per key chain in (ts, order_cols) order inside the batch,
    the key's previously-open row closes at the batch's first change,
    and new keys insert their chains from scratch.

    Scale shape: ``dim`` is never shuffled or rewritten — untouched
    keys pass through an anti join against the (tiny) changed-key
    set, and the close-the-open-row update is a broadcast join of the
    per-key first-change ts; only the batch itself takes a window
    exchange (on its own size, not the dimension's). That is the
    whole point of MERGE at 100 TB: cost ∝ |batch| + one dim scan,
    never ∝ |dim| shuffles.
    """
    # order_cols are tie-breakers AND carried attributes (e.g. the
    # change's event id) — only the key and the version ts are not
    # attribute columns
    attr_cols = [
        c for c in changes.columns if c not in {key_col, ts_col}
    ]
    out_cols = [key_col, *attr_cols, valid_from, valid_to, current_col]

    first_change = changes.groupBy(key_col).agg(
        F.min(ts_col).alias("__first_ts")
    )
    untouched = dim.join(
        F.broadcast(first_change.select(key_col)), key_col, "left_anti"
    )
    joined = dim.join(F.broadcast(first_change), key_col, "inner")
    closed = joined.select(
        key_col,
        *attr_cols,
        F.col(valid_from),
        F.when(
            F.col(current_col).cast("boolean"), F.col("__first_ts")
        ).otherwise(F.col(valid_to)).alias(valid_to),
        F.lit(0).cast(dim.schema[current_col].dataType).alias(current_col),
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    nxt = F.lead(ts_col).over(w)
    fresh = changes.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias(valid_from),
        nxt.alias(valid_to),
        nxt.isNull().cast(dim.schema[current_col].dataType).alias(current_col),
    )
    return (
        untouched.select(*out_cols)
        .unionByName(closed.select(*out_cols))
        .unionByName(fresh.select(*out_cols))
    )
