"""Bucketed co-located joins (zero-Exchange plan) and salted skew
joins (operators/bucketing.py, operators/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_light_spark.operators.bucketing import read_bucketed, write_bucketed
from vectordb_light_spark.operators.skew import salted_join


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    left = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(0, 500).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("rv")
    )
    try:
        write_bucketed(left, "t_bkt_l", ["k"], 8, path=str(tmp_path / "l"),
                       sort_cols=["k"])
        write_bucketed(right, "t_bkt_r", ["k"], 8, path=str(tmp_path / "r"),
                       sort_cols=["k"])
        joined = read_bucketed(spark, "t_bkt_l").join(
            read_bucketed(spark, "t_bkt_r"), "k"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan  # co-located: bucketing IS the shuffle
        assert joined.count() == 1000 * 10  # 20 lv × 10 rv per key... see below
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_l")
        spark.sql("DROP TABLE IF EXISTS t_bkt_r")


def test_plain_parquet_reread_does_shuffle(spark, tmp_path, no_broadcast):
    # Control: identical files read WITHOUT catalog bucketing metadata
    # must re-shuffle — documents why read_bucketed goes via the catalog.
    left = spark.range(0, 100).select((F.col("id") % 5).alias("k"))
    right = spark.range(0, 100).select((F.col("id") % 5).alias("k"))
    left.write.parquet(str(tmp_path / "pl"))
    right.write.parquet(str(tmp_path / "pr"))
    joined = spark.read.parquet(str(tmp_path / "pl")).join(
        spark.read.parquet(str(tmp_path / "pr")), "k"
    )
    assert "Exchange" in _plan(joined)


def test_salted_join_matches_plain_join(spark):
    ev = spark.createDataFrame(
        [(i, 0 if i % 10 else 1, float(i)) for i in range(400)],
        "event_id long, user_id long, value double",
    )  # user 0 is hot (360 rows)
    dim = spark.createDataFrame(
        [(0, "hot"), (1, "cold"), (2, "absent-side")],
        "user_id long, tag string",
    )
    plain = ev.join(dim, "user_id").orderBy("event_id")
    salted = salted_join(ev, dim, "user_id", salt=8).orderBy("event_id")
    assert [r.asDict() for r in plain.collect()] == [
        r.asDict() for r in salted.collect()
    ]


def test_salted_left_join_keeps_unmatched_probe_rows(spark):
    ev = spark.createDataFrame([(1, 7, 1.0), (2, 99, 2.0)],
                               "event_id long, user_id long, value double")
    dim = spark.createDataFrame([(7, "t")], "user_id long, tag string")
    out = salted_join(ev, dim, "user_id", salt=4, how="left").collect()
    tags = {r.event_id: r.tag for r in out}
    assert tags == {1: "t", 2: None}


def test_salted_join_spreads_hot_key(spark, no_broadcast):
    ev = spark.createDataFrame(
        [(i, 0, float(i)) for i in range(64)],
        "event_id long, user_id long, value double",
    )
    dim = spark.createDataFrame([(0, "hot")], "user_id long, tag string")
    probe = salted_join(ev, dim, "user_id", salt=8).groupBy("user_id").count()
    # correctness under salting
    assert probe.collect()[0]["count"] == 64
    # determinism: same salt assignment on recompute
    a = salted_join(ev, dim, "user_id", salt=8).collect()
    b = salted_join(ev, dim, "user_id", salt=8).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_salted_join_rejects_bad_args(spark):
    ev = spark.createDataFrame([(1, 1.0)], "user_id long, value double")
    dim = spark.createDataFrame([(1, "t")], "user_id long, tag string")
    with pytest.raises(ValueError):
        salted_join(ev, dim, "user_id", salt=0)
    with pytest.raises(ValueError):
        salted_join(ev, dim, "user_id", how="full")
    with pytest.raises(ValueError):
        salted_join(ev.select("user_id"), dim, "user_id")
