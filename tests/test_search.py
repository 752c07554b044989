"""Search-path operator tests (SURVEY §2.5 Q2/Q4/Q5/Q8/Q9)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vectordb_light_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)
from vectordb_light_spark.operators.search import (
    SearchParams,
    topk_cosine,
    topk_cosine_batch,
)


def _vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], "alpha doc", "document"),
        (2, [0.0, 1.0, 0.0], "beta doc", "image"),
        (3, [1.0, 1.0, 0.0], "gamma DOC text", "document"),
        (4, [-1.0, 0.0, 0.0], "delta", "document"),
        (5, [0.6, 0.8, 0.0], "epsilon doc", "audio"),
    ]
    return spark.createDataFrame(
        rows, "id long, vector array<double>, text string, document_type string"
    )


def test_dot_and_norm(spark):
    df = spark.range(1).select(
        dot_product(F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(3.0), F.lit(4.0))).alias("d"),
        l2_norm(F.array(F.lit(3.0), F.lit(4.0))).alias("n"),
    )
    row = df.first()
    assert row["d"] == 11.0
    assert row["n"] == 5.0


def test_l2_normalize_unit_norm(spark):
    df = spark.range(1).select(
        l2_norm(l2_normalize(F.array(F.lit(3.0), F.lit(4.0)))).alias("n"),
        l2_norm(l2_normalize(F.array(F.lit(0.0), F.lit(0.0)))).alias("zero"),
    )
    row = df.first()
    assert math.isclose(row["n"], 1.0, rel_tol=1e-9)
    assert row["zero"] == 0.0  # zero vector stays zero, no NaN


def test_cosine_similarity_known_values(spark):
    df = spark.range(1).select(
        cosine_similarity(
            F.array(F.lit(1.0), F.lit(0.0)), F.array(F.lit(1.0), F.lit(1.0))
        ).alias("c")
    )
    assert math.isclose(df.first()["c"], 1 / math.sqrt(2), rel_tol=1e-9)


def test_topk_orders_by_similarity_with_tiebreak(spark):
    out = topk_cosine(
        _vecs(spark), [1.0, 0.0, 0.0], SearchParams(k=3, threshold=0.0)
    ).collect()
    # sims: id1=1.0, id3=.707, id5=.6, id2=0, id4=-1→clip 0
    assert [r["id"] for r in out] == [1, 3, 5]
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["similarity_score"] == 1.0


def test_threshold_applied_after_topk_shrinks_result(spark):
    # k=4 admits id2 (sim clipped to 0); threshold 0.5 then removes it
    # AND id5 (0.6 >= .5 stays) — result < k rows, ranks preserved.
    out = topk_cosine(
        _vecs(spark), [1.0, 0.0, 0.0], SearchParams(k=4, threshold=0.5)
    ).collect()
    assert [r["id"] for r in out] == [1, 3, 5]
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_search_term_filter_case_insensitive(spark):
    out = topk_cosine(
        _vecs(spark),
        [1.0, 0.0, 0.0],
        SearchParams(k=5, threshold=0.0, search_term="DoC"),
    ).collect()
    # id4 ("delta") is the only text without "doc"; id2/id4 tie at
    # sim 0 → id asc tiebreak puts id2 at rank 4.
    assert [r["id"] for r in out] == [1, 3, 5, 2]


def test_document_type_filter(spark):
    out = topk_cosine(
        _vecs(spark),
        [1.0, 0.0, 0.0],
        SearchParams(k=5, threshold=0.0, document_type="audio"),
    ).collect()
    assert [r["id"] for r in out] == [5]
    assert out[0]["rank"] == 3  # rank from the pre-filter top-k order


def test_clip_to_unit_interval(spark):
    out = topk_cosine(
        _vecs(spark), [-1.0, 0.0, 0.0], SearchParams(k=5, threshold=0.0)
    ).collect()
    by_id = {r["id"]: r["similarity_score"] for r in out}
    assert by_id[4] == 1.0
    assert by_id[1] == 0.0  # cos=-1 clipped to 0


def test_topk_batch_matches_single(spark):
    vecs = _vecs(spark)
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0])],
        "query_id long, query_vec array<double>",
    )
    out = topk_cosine_batch(vecs, queries, k=2)
    got = {
        (r["query_id"], r["rank"]): r["id"] for r in out.collect()
    }
    assert got[(10, 1)] == 1 and got[(10, 2)] == 3
    assert got[(11, 1)] == 2 and got[(11, 2)] == 5  # id5 [.6,.8,0] → sim .8


def test_topk_prefix_monotonicity(spark):
    """k' ≤ k ⇒ top-k' is a prefix of top-k (SURVEY §5 property)."""
    vecs = _vecs(spark)
    q = [0.3, 0.7, 0.1]
    big = [r["id"] for r in topk_cosine(vecs, q, SearchParams(k=5, threshold=0.0)).collect()]
    small = [r["id"] for r in topk_cosine(vecs, q, SearchParams(k=2, threshold=0.0)).collect()]
    assert big[:2] == small
