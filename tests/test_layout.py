"""Pruning-oriented storage layouts (operators/layout.py)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pathlib import Path

from pyspark.sql import functions as F

from vectordb_light_spark.operators.layout import (
    read_pruned_plan,
    write_date_partitioned,
    write_range_sorted,
)
from vectordb_light_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_date_partition_prunes_at_planning_time(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    out = str(tmp_path / "ev_by_day")
    write_date_partitioned(ev, out, ts_col="ts", granularity="day")

    some_day = ev.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("d")
    ).first()["d"]
    df, plan = read_pruned_plan(spark, out, "p_day", some_day)

    assert "PartitionFilters" in plan and "p_day" in plan
    # pruned scan reads only that day's rows
    want = ev.where(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd") == some_day
    ).count()
    assert df.count() == want > 0
    # and the partition key never duplicates the data volume
    assert (
        spark.read.parquet(out).count() == ev.count()
    )


def test_date_partition_rejects_bad_granularity(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    with pytest.raises(ValueError):
        write_date_partitioned(ev, str(tmp_path / "x"), granularity="week")


def test_range_sorted_files_are_disjoint(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    out = str(tmp_path / "ev_ranged")
    write_range_sorted(ev, out, "event_id", n_files=8)

    ranges = []
    for f in Path(out).glob("*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # event_id is first
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo  # disjoint → min/max stats skip whole files

    got = spark.read.parquet(out).count()
    assert got == ev.count()


def _files_overlapping(path, col_name, lo, hi):
    """Count parquet files whose [min,max] stats for col_name overlap
    [lo,hi] — the files a stats-aware reader must open."""
    n_total, n_overlap = 0, 0
    for f in Path(path).glob("*.parquet"):
        md = pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = schema_names.index(col_name)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            mins.append(st.min)
            maxs.append(st.max)
        n_total += 1
        if min(mins) <= hi and lo <= max(maxs):
            n_overlap += 1
    return n_total, n_overlap


def test_zorder_skips_on_both_columns(spark, tmp_path):
    """Z-order vs single-column range sort: a selective predicate on
    the NON-sort column must open every range-sorted file but only a
    fraction of z-ordered files; the sort column still skips on both."""
    from vectordb_light_spark.operators.layout import write_zordered

    df = (
        spark.range(60_000)
        .withColumn("x", F.col("id"))
        .withColumn("y", F.pmod(F.xxhash64("id"), F.lit(60_000)))
        .select("x", "y")
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zordered(df, zpath, ["x", "y"], bits=8, n_files=16)
    write_range_sorted(df, rpath, "x", n_files=16)

    assert spark.read.parquet(zpath).count() == 60_000

    # y-only predicate, 1/16 of the domain
    y_lo, y_hi = 10_000, 13_750
    r_total, r_hit = _files_overlapping(rpath, "y", y_lo, y_hi)
    z_total, z_hit = _files_overlapping(zpath, "y", y_lo, y_hi)
    assert r_hit == r_total  # range-on-x layout: y skips nothing
    assert 0 < z_hit <= z_total // 2  # z-order: y skips most files

    # x predicate still skips on the z-ordered layout too
    _, zx_hit = _files_overlapping(zpath, "x", 0, 3_750)
    assert zx_hit <= z_total // 2


def test_zorder_rejects_single_column(spark, tmp_path):
    from vectordb_light_spark.operators.layout import write_zordered

    with pytest.raises(ValueError):
        write_zordered(
            spark.range(10).withColumn("x", F.col("id")),
            str(tmp_path / "zz"),
            ["x"],
        )


def test_tune_session_restores_utc_timezone(spark):
    """_tune_session must force session-UTC even on sessions handed to
    us with another timezone (the driver hands queries a vanilla
    session; epoch-micros hashes depend on this)."""
    from vectordb_light_spark import session as S

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        S._TUNED.discard(id(spark))
        S._tune_session(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
        S._TUNED.add(id(spark))


def test_event_ts_nanos_normalization_matches_duckdb_at_boundaries(
    spark, tmp_path
):
    """load_table's ns→µs normalization (`ts div 1000` on the legacy
    nanosAsLong long) must agree with DuckDB's CAST(ns AS TIMESTAMP)
    at the sub-µs rounding boundaries, INCLUDING pre-epoch values —
    both truncate toward zero, which is not the floor() a naive
    reading assumes (r9 probe: .9999995 s and negative-ns cases all
    agree). A driver corpus with pre-1970 or ns-precision events
    stays oracle-green because of exactly this."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from vectordb_light_spark.session import load_table

    vals = [
        0,
        1_000_000_000_000_000_500,
        1_000_000_000_000_000_999,
        1_000_000_000_999_999_500,
        1_000_000_000_999_999_999,
        -5_000_000_000_000_000_500,
        -1,
    ]
    t = pa.table(
        {
            "event_id": list(range(len(vals))),
            "ts": pa.array(vals, type=pa.timestamp("ns")),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    ev = load_table(spark, str(tmp_path), "events")
    srows = dict(
        (r["event_id"], r["us"])
        for r in ev.select(
            "event_id", F.unix_micros("ts").alias("us")
        ).collect()
    )
    con = duckdb.connect()
    drows = dict(
        con.execute(
            "SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) "
            f"FROM '{tmp_path}/events.parquet'"
        ).fetchall()
    )
    con.close()
    assert srows == drows
