"""Storage layout for scan pruning: date-partitioned and range-sorted
parquet.

At 100 TB the fastest scan is the one that never happens. Two
complementary layouts:

- **Hive-style date partitioning** (``write_date_partitioned``): the
  partition column becomes a directory key; a filter on it prunes at
  PLANNING time — the plan's ``PartitionFilters`` line shows the
  pruned scan and unmatched directories are never listed. This is
  the coarse knife: day/hour granularity, bounded cardinality (a
  partition per key — never partition by a high-cardinality column:
  1M tiny directories is its own failure mode).
- **Range-sorted files** (``write_range_sorted``): within whatever
  partitioning, ``repartitionByRange + sortWithinPartitions`` makes
  each file cover a narrow key range, so parquet row-group min/max
  stats skip at READ time (the fine knife, works for any pushable
  predicate column, no directory explosion).

Both are write-once / prune-forever: the cost is one shuffle at write
time, amortized over every subsequent query. tests/test_layout.py
asserts the pruning is visible in the plan (PartitionFilters) and
that the range layout yields non-overlapping per-file min/max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_date_partitioned",
    "read_pruned_plan",
    "write_range_sorted",
    "write_zordered",
]


def write_date_partitioned(
    df: DataFrame,
    path: str,
    *,
    ts_col: str = "ts",
    granularity: str = "day",
    mode: str = "errorifexists",
) -> None:
    """Write ``df`` partitioned by a derived date key (``p_day`` or
    ``p_month``) of ``ts_col``. The original timestamp column is kept
    — the derived key exists only for directory pruning.

    Rows are repartitioned by the key first so each partition
    directory is written by few tasks (dense files, not
    tasks×partitions fragments).
    """
    if granularity == "day":
        key = F.date_format(F.date_trunc("day", ts_col), "yyyy-MM-dd")
    elif granularity == "month":
        key = F.date_format(F.date_trunc("month", ts_col), "yyyy-MM")
    else:
        raise ValueError("granularity must be 'day' or 'month'")
    part = f"p_{granularity}"
    (
        df.withColumn(part, key)
        .repartition(F.col(part))
        .write.mode(mode)
        .partitionBy(part)
        .parquet(path)
    )


def read_pruned_plan(
    spark: SparkSession, path: str, part_col: str, value: str
) -> tuple[DataFrame, str]:
    """Read a partitioned dataset filtered to one partition value and
    return (DataFrame, physical plan string). The caller can assert
    ``PartitionFilters`` carries the predicate — i.e. pruning happened
    at planning time, not as a post-scan filter."""
    df = spark.read.parquet(path).where(F.col(part_col) == value)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return df, plan


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    *,
    n_files: int = 32,
    mode: str = "errorifexists",
) -> None:
    """Range-partition ``df`` into ``n_files`` buckets of ``sort_col``
    and sort within each, so every output file covers a disjoint key
    range and parquet min/max row-group stats skip files for any
    range predicate on that column."""
    (
        df.repartitionByRange(n_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 8,
    n_files: int = 32,
    mode: str = "errorifexists",
) -> None:
    """Z-order (Morton-curve) layout over ≥2 numeric columns: every
    file covers a small HYPER-RECTANGLE of the key space, so parquet
    min/max stats skip files for a selective predicate on ANY of the
    columns — where ``write_range_sorted`` only skips on its one sort
    column and a query on the other column must read every file.

    Each column is linearly bucketed into ``2^bits`` cells between its
    global min/max (one tiny agg to fetch the bounds), then the cell
    numbers' bits are interleaved into one Morton key that drives
    ``repartitionByRange`` + in-file sort. Everything is JVM bit
    arithmetic (shiftleft/shiftright/AND/OR) — no UDF — and the only
    data-sized cost is the one range shuffle any sorted write pays.

    Linear bucketing assumes roughly uniform value spread; heavily
    skewed columns should be rank-transformed first (or use the
    date-partition + range-sort combination instead).
    """
    if len(cols) < 2:
        raise ValueError("z-ordering needs ≥2 columns; use write_range_sorted")
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).first()
    n_cells = 1 << bits
    buckets = []
    for c in cols:
        lo = float(bounds[f"_lo_{c}"])
        span = max(float(bounds[f"_hi_{c}"]) - lo, 1e-300)
        cell = F.floor(
            (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * n_cells
        )
        buckets.append(
            F.least(F.lit(n_cells - 1), F.greatest(F.lit(0), cell)).cast("bigint")
        )
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
