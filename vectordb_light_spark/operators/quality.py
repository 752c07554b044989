"""Data-quality constraint checking: N rules, ONE pass.

Training pipelines gate every ingest batch on constraints (nulls,
ranges, referential sanity, parseability). The naive form — one
``df.filter(rule).count()`` per rule — scans the table N times. Here
every rule is a boolean Column compiled into ``sum(cast(violated as
long))`` aggregates of a SINGLE scan: map-side partial sums, one
scalar row out, then unpivoted to a (rule, n_violations) table. At
100 TB the cost is one pass regardless of rule count.

This is the engine-side analogue of the reference's scattered
defensive checks (empty-text drop, db-name validation, JSON
parse-skip — SURVEY §2.3 T7/T8, §2.5 Q7) promoted to a declarative,
composable operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_constraints"]


def check_constraints(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate ``rules`` (name → predicate that HOLDS for good rows)
    in one scan.

    Returns one row per rule: ``rule``, ``n_rows``, ``n_violations``
    (rows where the predicate is false or null — a null check result
    is a violation, not a pass), ``passed``. Row order follows the
    dict, so reports are stable.
    """
    if not rules:
        raise ValueError("need at least one rule")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, pred) in enumerate(rules.items()):
        aggs.append(
            F.sum(
                F.when(pred.isNull() | ~pred, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"_v{i}")
        )
    row = df.agg(*aggs)
    # unpivot the 1-row aggregate via a literal-array explode (no
    # driver collect: stays a DataFrame for composition/sinks)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_v{i}").cast("long").alias("n_violations"),
                F.lit(i).alias("_ord"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return (
        row.select(F.col("_n").alias("n_rows"), F.explode(pairs).alias("p"))
        .select(
            F.col("p.rule").alias("rule"),
            F.col("n_rows"),
            F.col("p.n_violations").alias("n_violations"),
            (F.col("p.n_violations") == 0).alias("passed"),
            F.col("p._ord").alias("_ord"),
        )
        .orderBy("_ord")
        .drop("_ord")
    )
