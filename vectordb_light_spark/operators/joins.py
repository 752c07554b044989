"""As-of (nearest-predecessor) joins — a time-series primitive Spark
lacks natively.

The task brief names as-of joins as a canonical custom operator; the
reference engine has no join at all (single-table scans only,
vector_db_query.py), so this is beyond-reference surface for the
event/time-series tables.

Spark-first design — the union+window technique, NOT a pair join:

1. Tag left rows side=1 and right rows side=0, union them with a
   shared (keys, ts) spine; each side's payload columns are null on
   the other side's rows.
2. One window per key ordered by (ts, side, right-id):
   ``last(right_payload, ignorenulls=True)`` fills every left row
   with the payload of the most recent right row at-or-before it.
3. Keep side=1 rows.

Cost: ONE shuffle of |left| + |right| rows on the equi-keys, then a
linear per-partition sweep. The naive alternative — equi-join on key
with ts-range predicate, then pick max — materializes every
(left, right-predecessor-candidate) pair before pruning: quadratic
per key in the worst case and always ≥2 shuffles. At 100 TB the
union+window form is the only shape that survives; key skew is
handled by AQE like any other window.

Direction and tie semantics are controlled by the in-window sort:
backward-inclusive sorts right rows BEFORE left rows at equal ts
(so an equal-ts right row is visible), strict sorts them after;
forward mirrors this over descending ts. Ties among right rows at
the same (key, ts) are broken deterministically by ``right_id_col``
when given. Semantics match DuckDB's ``ASOF LEFT JOIN`` (the oracle
for ``rel_events_asof``) and pandas ``merge_asof``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    strict: bool = False,
    tolerance_us: int | None = None,
    right_prefix: str = "r_",
    right_id_col: str | None = None,
) -> DataFrame:
    """Left as-of join: each left row picks the nearest right row
    at-or-before (``backward``) / at-or-after (``forward``) its
    timestamp within the same equi-key group; unmatched left rows keep
    nulls (LEFT semantics).

    ``strict`` excludes equal timestamps. ``tolerance_us`` drops
    matches farther than the given microseconds. Right payload
    columns are prefixed with ``right_prefix``; the matched right
    timestamp is exposed as ``{right_prefix}{right_ts}``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)

    lpay = [c for c in left.columns if c not in keys and c != left_ts]
    rpay = [c for c in right.columns if c not in keys and c != right_ts]

    clash = set(lpay) & {right_prefix + c for c in rpay + [right_ts]}
    if clash:
        raise ValueError(f"prefixed right columns clash with left: {sorted(clash)}")

    # Shared spine: (keys, _ts, _side, _rtie, left payload, right payload).
    # _rtie orders right rows within an equal (key, ts) deterministically.
    rtie = F.col(right_id_col) if right_id_col else F.lit(0)
    lhs = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rtie"),
        *[F.col(c) for c in lpay],
        *[F.lit(None).cast(right.schema[c].dataType).alias(right_prefix + c) for c in rpay],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(right_prefix + right_ts),
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        rtie.cast("long").alias("_rtie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        *[F.col(c).alias(right_prefix + c) for c in rpay],
        F.col(right_ts).alias(right_prefix + right_ts),
    )
    spine = lhs.unionByName(rhs)

    # In-window order: ts ascending (descending for forward). At equal
    # ts a right row sorts before the left row iff it should be
    # visible (inclusive), after iff not (strict). Among right rows,
    # later _rtie wins the `last()`.
    ts_ord = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    side_ord = F.col("_side").desc() if strict else F.col("_side").asc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_ord, side_ord, F.col("_rtie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = [right_prefix + c for c in rpay] + [right_prefix + right_ts]
    out = spine.select(
        *keys,
        "_ts",
        "_side",
        *lpay,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in filled],
    ).where(F.col("_side") == 1)

    if tolerance_us is not None:
        lag = F.unix_micros(F.col("_ts")) - F.unix_micros(F.col(right_prefix + right_ts))
        if direction == "forward":
            lag = -lag
        within = lag <= F.lit(int(tolerance_us))
        out = out.select(
            *keys,
            "_ts",
            *lpay,
            *[F.when(within, F.col(c)).alias(c) for c in filled],
        )
    else:
        out = out.drop("_side")

    return out.withColumnRenamed("_ts", left_ts)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    on: str | list[str] | None = None,
    bucket_s: int = 3600,
) -> DataFrame:
    """Range (interval-containment) join: each point row pairs with
    every interval row whose ``[start_col, end_col]`` contains its
    timestamp (inclusive both ends), optionally also matching equi
    ``on`` keys.

    Spark-first shape: a raw ``p.ts BETWEEN i.start AND i.end``
    predicate gives Catalyst no equi-key, so it plans a broadcast
    nested-loop / cartesian — O(|points| * |intervals|) compares. We
    bucketize instead: a point lands in ONE bucket of width
    ``bucket_s``; an interval explodes into the buckets it covers;
    the join becomes a plain hash equi-join on (keys, bucket) with
    the exact BETWEEN as a post-filter. A point meets a given
    interval in at most one bucket, so no dedup step is needed.

    Pick ``bucket_s`` near the typical interval length: the
    explosion factor is ~len(interval)/bucket_s per interval row,
    while false candidates per point shrink as buckets narrow.
    Same technique DuckDB/Trino docs call a "binned range join".
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap)}")
    bucket_us = int(bucket_s) * 1_000_000
    if bucket_us <= 0:
        raise ValueError("bucket_s must be positive")

    p = points.withColumn("_bucket", F.expr(f"unix_micros({point_ts}) div {bucket_us}"))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_col}) div {bucket_us}"),
                F.expr(f"unix_micros({end_col}) div {bucket_us}"),
            )
        ),
    )
    return (
        p.join(iv, on=[*keys, "_bucket"], how="inner")
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("_bucket")
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str = "l_start",
    left_end: str = "l_end",
    right_start: str = "r_start",
    right_end: str = "r_end",
    on: str | list[str] | None = None,
    bucket_s: int = 3600,
) -> DataFrame:
    """Interval-overlap join: each left interval pairs with every
    right interval it overlaps (closed intervals:
    ``l_start <= r_end AND r_start <= l_end``), optionally also
    matching equi ``on`` keys.

    Same bucketization as :func:`interval_join` — both sides explode
    into the time buckets they cover, the join is a hash equi-join on
    (keys, bucket) with the exact overlap predicate as post-filter.
    Overlapping intervals co-occupy EVERY shared bucket, so the pair
    would duplicate once per shared bucket; instead of a distinct
    (an extra full shuffle of the output), each pair is kept only in
    its OWNERSHIP bucket — the first bucket both intervals cover,
    ``greatest(bucket(l_start), bucket(r_start))`` — which exists iff
    they overlap. Dedup is a map-side filter; no added shuffle.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap)}")
    bucket_us = int(bucket_s) * 1_000_000
    if bucket_us <= 0:
        raise ValueError("bucket_s must be positive")

    def buckets(start: str, end: str):
        return F.explode(
            F.sequence(
                F.expr(f"unix_micros({start}) div {bucket_us}"),
                F.expr(f"unix_micros({end}) div {bucket_us}"),
            )
        )

    l = left.withColumn("_bucket", buckets(left_start, left_end))
    r = right.withColumn("_bucket", buckets(right_start, right_end))
    own = F.greatest(
        F.expr(f"unix_micros({left_start}) div {bucket_us}"),
        F.expr(f"unix_micros({right_start}) div {bucket_us}"),
    )
    return (
        l.join(r, on=[*keys, "_bucket"], how="inner")
        .where(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (F.col("_bucket") == own)
        )
        .drop("_bucket")
    )
