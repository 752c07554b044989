"""Citation aggregation — the reference's only true hash aggregation
(Q14, reference utilities.py:24-77).

Semantics: group search hits by source file; per group take min/max
similarity, the distinct set of PDF pages, and a representative file
type; compress the sorted page list into ranges ("3-5, 7"); order
groups by min score ascending (reference utilities.py:74 sorts the
rendered list by score)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compress_page_ranges(pages: Column) -> Column:
    """Render a sorted distinct int array as run-length ranges, e.g.
    [3,4,5,7] → "3-5, 7" (reference utilities.py:42-56).

    Pure higher-order functions: mark run starts (no predecessor in
    the set), run ends (no successor), zip them into range strings.
    """
    sorted_pages = F.array_sort(pages)
    starts = F.filter(
        sorted_pages, lambda p: ~F.array_contains(sorted_pages, p - 1)
    )
    ends = F.filter(
        sorted_pages, lambda p: ~F.array_contains(sorted_pages, p + 1)
    )
    parts = F.zip_with(
        starts,
        ends,
        lambda s, e: F.when(s == e, s.cast("string")).otherwise(
            F.concat(s.cast("string"), F.lit("-"), e.cast("string"))
        ),
    )
    return F.array_join(parts, ", ")


def format_citations(
    hits: DataFrame,
    *,
    group_col: str = "file_path",
    name_col: str = "file_name",
    score_col: str = "similarity_score",
    page_col: str = "page_number",
) -> DataFrame:
    """Aggregate hits into per-source citations.

    One hash-partitioned shuffle on the group key; page-set collect is
    bounded by pages-per-document (small). Output ordered by min_score
    asc per the reference."""
    has_page = page_col in hits.columns
    aggs = [
        F.min(score_col).alias("min_score"),
        F.max(score_col).alias("max_score"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.first(name_col).alias(name_col) if name_col in hits.columns and name_col != group_col else None,
        F.sort_array(F.collect_set(page_col)).alias("pages") if has_page else None,
    ]
    out = hits.groupBy(group_col).agg(*[a for a in aggs if a is not None])
    if has_page:
        out = out.withColumn("page_ranges", compress_page_ranges(F.col("pages")))
    return out.orderBy("min_score")
