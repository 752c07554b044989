"""Scalable global running sum + sequence packing
(operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from vectordb_light_spark.operators.packing import global_running_sum, pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    # shuffled insert order, non-contiguous ids, varied sizes
    rows = [(i * 7 % 1000, (i * 37) % 500 + 1) for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, tokens long").repartition(13)


def _expected(docs, exclusive):
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inc = docs.withColumn("run", F.sum("tokens").over(w))
    if exclusive:
        inc = inc.withColumn("run", F.col("run") - F.col("tokens"))
    return {r["doc_id"]: r["run"] for r in inc.collect()}


@pytest.mark.parametrize("exclusive", [True, False])
def test_running_sum_matches_global_window(docs, exclusive):
    got = global_running_sum(
        docs, "tokens", "doc_id", exclusive=exclusive, n_parts=8
    )
    gmap = {r["doc_id"]: r["running_sum"] for r in got.collect()}
    assert gmap == _expected(docs, exclusive)


def test_running_sum_carries_across_arrow_batches(spark, docs):
    # Tiny Arrow batches force many batches per partition — the
    # cross-batch carry must hold.
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        got = global_running_sum(docs, "tokens", "doc_id", n_parts=5)
        gmap = {r["doc_id"]: r["running_sum"] for r in got.collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert gmap == _expected(docs, True)


def test_pack_sequences_semantics(docs):
    budget = 4096
    packed = pack_sequences(
        docs, token_col="tokens", order_col="doc_id", budget=budget, n_parts=8
    )
    rows = sorted(
        ((r["doc_id"], r["tokens"], r["tok_start"], r["seq_id"]) for r in packed.collect())
    )
    # contiguity: tok_start is the exclusive prefix sum in doc_id order
    run = 0
    for _doc, tok, start, seq in rows:
        assert start == run
        assert seq == start // budget
        run += tok
    # every budget boundary starts a new sequence exactly once
    seqs = sorted({seq for *_, seq in rows})
    assert seqs == list(range(seqs[-1] + 1))


def test_pack_rejects_bad_budget(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, token_col="tokens", order_col="doc_id", budget=0)


def test_no_single_partition_exchange(docs):
    got = global_running_sum(docs, "tokens", "doc_id", n_parts=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the scalable form must not sort everything into one partition
    assert "rangepartitioning(doc_id" in plan.replace(" ", "").lower() or "RangePartitioning" in plan
    assert "SinglePartition" not in plan
