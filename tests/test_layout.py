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
