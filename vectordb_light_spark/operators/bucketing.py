"""Bucketed (co-located) storage: pre-shuffle once at write time so
repeated joins/aggregations on the same key never shuffle again.

At 100 TB the dominant cost of a key-equi join is the exchange of both
sides. Spark's bucketed tables (`bucketBy` + `saveAsTable`) persist
the hash-partitioning in the catalog: a SortMergeJoin of two tables
bucketed on the join key with the same bucket count reads each bucket
pair co-located — ZERO Exchange in the plan (asserted in
tests/test_bucketing.py). This is the Spark-native equivalent of the
reference's single-file locality (TileDB fragments live on one node;
SURVEY §2.2 K1/K3) re-expressed for a cluster.

Bucket-count sizing: buckets are the unit of both write parallelism
and join-task parallelism; pick ``n_buckets`` ≈ cluster cores ×
small-multiple, and so each bucket is < a few hundred MB at the
target scale. Too few buckets → giant sort-merge tasks; too many →
tiny files (each writer task emits one file per bucket it sees —
repartition by the bucket key first to keep files dense, which
``write_bucketed`` does by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    *,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "errorifexists",
    compact: bool = True,
) -> None:
    """Persist ``df`` bucketed by ``keys`` into catalog table
    ``table`` (external at ``path`` if given).

    ``compact=True`` repartitions by the bucket keys first so each
    bucket's rows land in one task → one file per bucket instead of
    ``tasks × buckets`` fragments. ``sort_cols`` adds in-bucket
    ordering (lets the join skip its sort and range-skip within
    buckets).
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    out = df.repartition(n_buckets, *keys) if compact else df
    w = out.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata only survives via the
    catalog; a plain ``spark.read.parquet(path)`` of the same files
    would NOT carry the output partitioning and would re-shuffle."""
    return spark.table(table)
