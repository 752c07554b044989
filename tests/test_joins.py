"""As-of join operator (operators/joins.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vectordb_light_spark.operators.joins import asof_join, interval_join


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, _ts(10), 100.0),
            (1, _ts(20), 101.0),
            (1, _ts(5), 99.0),
            (2, _ts(10), 50.0),
        ],
        "user_id long, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts(8), 1001),
            (1, _ts(10), 1002),
            (1, _ts(15), 1003),
            (2, _ts(30), 2001),
        ],
        "user_id long, ts timestamp, quote_id long",
    )
    return trades, quotes


def _pairs(df):
    return {
        (r["user_id"], r["ts"].second, r["r_quote_id"]) for r in df.collect()
    }


def test_backward_inclusive(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="user_id", right_id_col="quote_id")
    assert _pairs(out) == {
        (1, 5, None),  # no quote at-or-before 5 → LEFT semantics keep it
        (1, 10, 1002),  # equal ts visible when inclusive
        (1, 20, 1003),
        (2, 10, None),  # user 2's only quote is later
    }


def test_backward_strict_excludes_equal_ts(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="user_id", strict=True, right_id_col="quote_id")
    assert _pairs(out) == {
        (1, 5, None),
        (1, 10, 1001),  # equal-ts quote hidden → falls back to t=8
        (1, 20, 1003),
        (2, 10, None),
    }


def test_forward_direction(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="user_id", direction="forward", right_id_col="quote_id")
    assert _pairs(out) == {
        (1, 5, 1001),  # nearest at-or-after
        (1, 10, 1002),
        (1, 20, None),  # nothing after 20 for user 1
        (2, 10, 2001),
    }


def test_tolerance_nulls_far_matches(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="user_id", tolerance_us=2_000_000, right_id_col="quote_id"
    )
    # t=20's nearest quote is t=15 → 5s lag > 2s tolerance → nulled.
    assert _pairs(out) == {
        (1, 5, None),
        (1, 10, 1002),
        (1, 20, None),
        (2, 10, None),
    }


def test_left_rows_and_payload_preserved(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="user_id", right_id_col="quote_id")
    assert out.count() == trades.count()
    assert {r["price"] for r in out.collect()} == {99.0, 100.0, 101.0, 50.0}
    assert set(out.columns) == {"user_id", "ts", "price", "r_quote_id", "r_ts"}


def test_matches_bruteforce_on_events(spark):
    """Union+window result ≡ brute-force (equi-join + max-predecessor)
    on real testdata: every click joined to its latest prior-or-equal
    purchase per user."""
    from vectordb_light_spark.session import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), "user_id", "ts"
    )

    got = asof_join(clicks, buys, on="user_id", right_id_col="buy_id").select(
        "event_id", "r_buy_id"
    )

    from pyspark.sql.window import Window

    cand = clicks.join(
        buys.withColumnRenamed("ts", "bts"), on="user_id", how="left"
    ).where(F.col("bts").isNull() | (F.col("bts") <= F.col("ts")))
    w = Window.partitionBy("event_id").orderBy(
        F.col("bts").desc_nulls_last(), F.col("buy_id").desc_nulls_last()
    )
    want = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", F.col("buy_id").alias("r_buy_id"))
    )
    # left rows whose every candidate was filtered out disappear from
    # cand — reinstate them as null matches
    want = clicks.select("event_id").join(want, "event_id", "left")

    grows = {(r["event_id"], r["r_buy_id"]) for r in got.collect()}
    wrows = {(r["event_id"], r["r_buy_id"]) for r in want.collect()}
    assert grows == wrows


def test_single_shuffle_plan(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="user_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # one shuffle on the equi-key
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def points_intervals(spark):
    points = spark.createDataFrame(
        [(i, 1 + (i % 2), _ts(i * 13 % 300)) for i in range(60)],
        "pt_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, 1, _ts(0), _ts(50)),
            (101, 1, _ts(40), _ts(200)),  # overlaps 100 → points match both
            (102, 2, _ts(10), _ts(11)),  # sub-bucket interval
            (103, 2, _ts(250), _ts(600)),  # spans many buckets
        ],
        "w_id long, user_id long, w_start timestamp, w_end timestamp",
    )
    return points, intervals


def _brute(points, intervals, keys):
    cond = (F.col("p.ts") >= F.col("i.w_start")) & (F.col("p.ts") <= F.col("i.w_end"))
    for k in keys:
        cond = cond & (F.col(f"p.{k}") == F.col(f"i.{k}"))
    return {
        (r["pt_id"], r["w_id"])
        for r in points.alias("p").join(intervals.alias("i"), cond).select("p.pt_id", "i.w_id").collect()
    }


@pytest.mark.parametrize("bucket_s", [7, 60, 3600])
def test_interval_join_matches_bruteforce(points_intervals, bucket_s):
    points, intervals = points_intervals
    got = interval_join(
        points, intervals, on="user_id", bucket_s=bucket_s
    ).select("pt_id", "w_id")
    pairs = [(r["pt_id"], r["w_id"]) for r in got.collect()]
    assert len(pairs) == len(set(pairs))  # no dup rows from multi-bucket spans
    assert set(pairs) == _brute(points, intervals, ["user_id"])


def test_interval_join_without_equi_keys(points_intervals):
    points, intervals = points_intervals
    got = interval_join(
        points.drop("user_id"), intervals.drop("user_id"), bucket_s=30
    ).select("pt_id", "w_id")
    pairs = {(r["pt_id"], r["w_id"]) for r in got.collect()}
    assert pairs == _brute(
        points.drop("user_id"), intervals.drop("user_id"), []
    )


def test_interval_join_boundary_inclusive(spark):
    p = spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(20)), (3, _ts(21))], "pt_id long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(9, _ts(10), _ts(20))], "w_id long, w_start timestamp, w_end timestamp"
    )
    got = {r["pt_id"] for r in interval_join(p, iv, bucket_s=5).collect()}
    assert got == {1, 2}  # both endpoints inclusive, outside excluded


def test_interval_join_rejects_ambiguous_and_bad_bucket(points_intervals):
    points, intervals = points_intervals
    with pytest.raises(ValueError):
        interval_join(points, intervals.withColumnRenamed("w_id", "pt_id"), on="user_id")
    with pytest.raises(ValueError):
        interval_join(points, intervals, on="user_id", bucket_s=0)


def test_interval_join_plans_equi_join(points_intervals):
    points, intervals = points_intervals
    out = interval_join(points, intervals, on="user_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# overlap_join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def two_interval_sets(spark):
    left = spark.createDataFrame(
        [
            (0, 1, _ts(0), _ts(100)),
            (1, 1, _ts(90), _ts(110)),   # overlaps 0 at the tail
            (2, 2, _ts(0), _ts(10)),
            (3, 2, _ts(5000), _ts(9000)),  # many buckets
        ],
        "l_id long, user_id long, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, 1, _ts(100), _ts(200)),   # touches 0 at exactly t=100
            (11, 1, _ts(101), _ts(200)),   # misses 0, overlaps 1
            (12, 2, _ts(11), _ts(12)),     # just misses 2
            (13, 2, _ts(0), _ts(10000)),   # spans everything of user 2
        ],
        "r_id long, user_id long, r_start timestamp, r_end timestamp",
    )
    return left, right


def _brute_pairs(left, right, keyed=True):
    out = set()
    for a in left.collect():
        for b in right.collect():
            if keyed and a.user_id != b.user_id:
                continue
            if a.l_start <= b.r_end and b.r_start <= a.l_end:
                out.add((a.l_id, b.r_id))
    return out


@pytest.mark.parametrize("bucket_s", [7, 60, 3600])
def test_overlap_join_matches_brute_force(spark, two_interval_sets, bucket_s):
    from vectordb_light_spark.operators.joins import overlap_join

    left, right = two_interval_sets
    got = overlap_join(left, right, on="user_id", bucket_s=bucket_s)
    pairs = [(r.l_id, r.r_id) for r in got.collect()]
    assert len(pairs) == len(set(pairs))  # ownership-bucket dedup: no dupes
    assert set(pairs) == _brute_pairs(left, right)


def test_overlap_join_closed_boundary(spark, two_interval_sets):
    from vectordb_light_spark.operators.joins import overlap_join

    left, right = two_interval_sets
    pairs = {
        (r.l_id, r.r_id)
        for r in overlap_join(left, right, on="user_id", bucket_s=60).collect()
    }
    assert (0, 10) in pairs   # l_end == r_start → closed-interval hit
    assert (0, 11) not in pairs
    assert (2, 12) not in pairs  # 1s gap → miss


def test_overlap_join_no_equi_key(spark, two_interval_sets):
    from vectordb_light_spark.operators.joins import overlap_join

    left, right = two_interval_sets
    got = overlap_join(left.drop("user_id"), right.drop("user_id"), bucket_s=60)
    pairs = {(r.l_id, r.r_id) for r in got.collect()}
    assert pairs == _brute_pairs(left, right, keyed=False)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
