"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``vectordb_light_spark.queries`` — the registry of
(spark implementation, DuckDB oracle SQL) pairs, one per operator from
SURVEY.md §2 plus the beyond-reference pipeline operators.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from vectordb_light_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: exact top-k cosine
    search over the embeddings table with post-top-k filters — the
    reference's read path (SURVEY §2.5)."""
    return QUERIES["vq_topk_cosine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return dict(ORACLES)
