"""Citation aggregation tests (reference utilities.py:24-77)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_light_spark.operators.citations import (
    compress_page_ranges,
    format_citations,
)


def test_compress_page_ranges(spark):
    cases = [
        ([3, 4, 5, 7], "3-5, 7"),
        ([1], "1"),
        ([2, 1], "1-2"),
        ([1, 3, 5], "1, 3, 5"),
        ([10, 11, 12, 13], "10-13"),
        ([], ""),
    ]
    df = spark.createDataFrame([(i, p) for i, (p, _) in enumerate(cases)], "i int, pages array<int>")
    got = {r["i"]: r["r"] for r in df.select("i", compress_page_ranges(F.col("pages")).alias("r")).collect()}
    for i, (_, expected) in enumerate(cases):
        assert got[i] == expected, (cases[i], got[i])


def test_format_citations_grouping_and_order(spark):
    hits = spark.createDataFrame(
        [
            ("a.pdf", "a", 0.9, 3),
            ("a.pdf", "a", 0.7, 4),
            ("a.pdf", "a", 0.8, 7),
            ("b.pdf", "b", 0.95, 1),
        ],
        "file_path string, file_name string, similarity_score double, page_number int",
    )
    out = format_citations(hits).collect()
    # ordered by min_score asc: a.pdf (0.7) before b.pdf (0.95)
    assert [r["file_path"] for r in out] == ["a.pdf", "b.pdf"]
    a = out[0]
    assert a["min_score"] == 0.7 and a["max_score"] == 0.9 and a["n_chunks"] == 3
    assert a["pages"] == [3, 4, 7]
    assert a["page_ranges"] == "3-4, 7"


def test_format_citations_without_pages(spark):
    hits = spark.createDataFrame(
        [("x", 0.5), ("x", 0.6), ("y", 0.4)],
        "file_path string, similarity_score double",
    )
    out = format_citations(hits, name_col="file_path").collect()
    assert [r["file_path"] for r in out] == ["y", "x"]
    assert "pages" not in out[0].asDict()
