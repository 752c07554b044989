"""Global running sums and training-sequence packing at scale.

A training-data loader packs documents into fixed token-budget
sequences ("concatenate and cut"): lay all docs end-to-end in a
deterministic order, cut every ``budget`` tokens, and a doc belongs to
the sequence its first token lands in. The core primitive is a GLOBAL
exclusive running sum of token counts in a total order — which naive
Spark expresses as ``sum().over(Window.orderBy(...))``: an
ALL-TO-ONE-PARTITION sort that caps out at one executor's memory and
serializes the whole job. (The reference engine has no packing stage;
this is beyond-reference training-data surface.)

Scalable shape (classic two-phase parallel prefix sum):

1. ``repartitionByRange(order_col)`` + ``sortWithinPartitions`` —
   one range shuffle gives a globally-ordered partitioning.
2. Per-partition token totals (a map-side agg of N rows, N =
   #partitions) → exclusive prefix offsets, computed at the driver
   over that tiny list.
3. One ``mapInPandas`` sweep over the SAME materialized partitioning
   adds ``offset[pid] + local exclusive cumsum`` — numpy cumsum per
   Arrow batch, carry maintained across batches.

Total cost: ONE shuffle of the data + an N-integer collect,
vs. the global window's one-partition sort. The input partitioning is
persisted between phase 2 and 3 so both phases see the identical
row→partition assignment (range boundaries come from sampling;
recomputation must not re-draw them).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField

from vectordb_light_spark.session import persist_if_batch


def global_running_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    *,
    out_col: str = "running_sum",
    exclusive: bool = True,
    n_parts: int | None = None,
) -> DataFrame:
    """Running sum of ``value_col`` in the global ``order_col`` order
    without a single-partition window. ``exclusive`` gives the sum of
    STRICTLY-preceding rows (0 for the first row); inclusive adds the
    row's own value. Output keeps all input columns + ``out_col``
    (long). Rows come back range-partitioned and ordered by
    ``order_col`` within partitions.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    # Pin the row→partition assignment: phase 2's totals and phase 3's
    # sweep must see the same sampled range boundaries.
    part = persist_if_batch(part)

    totals = {
        r["_pid"]: r["t"]
        for r in part.groupBy("_pid").agg(F.sum(value_col).alias("t")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid])

    out_fields = [f for f in part.schema.fields if f.name != "_pid"]
    out_schema = type(part.schema)(out_fields + [StructField(out_col, LongType(), False)])
    inclusive = not exclusive

    def sweep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        carry = None  # exclusive running total at the batch's first row
        for pdf in batches:
            out = pdf.drop(columns=["_pid"])
            if not len(pdf):
                out[out_col] = pd.Series([], dtype="int64")
                yield out
                continue
            if carry is None:
                carry = offsets[int(pdf["_pid"].iloc[0])]
            vals = pdf[value_col].to_numpy(dtype="int64", na_value=0)
            cum = np.cumsum(vals)
            run = cum if inclusive else cum - vals
            out[out_col] = carry + run
            carry += int(cum[-1])
            yield out

    return part.mapInPandas(sweep, schema=out_schema)


def pack_sequences(
    df: DataFrame,
    *,
    token_col: str,
    order_col: str,
    budget: int,
    n_parts: int | None = None,
    seq_col: str = "seq_id",
    start_col: str = "tok_start",
) -> DataFrame:
    """Assign each document to a fixed-budget training sequence:
    ``seq_id = tok_start div budget`` where ``tok_start`` is the
    global exclusive running sum of ``token_col`` in ``order_col``
    order. Deterministic for a given order column; a doc straddling a
    cut belongs to the sequence its first token lands in.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    out = global_running_sum(
        df, token_col, order_col, out_col=start_col, exclusive=True, n_parts=n_parts
    )
    return out.withColumn(seq_col, F.expr(f"{start_col} div {int(budget)}"))
