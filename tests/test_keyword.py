"""BM25 keyword scoring + reciprocal-rank fusion (operators/keyword.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectordb_light_spark.operators.keyword import (
    bm25_score,
    bm25_topk,
    rrf_fuse,
    tokenize,
)

CORPUS = [
    (0, "spark spark vector join the table"),
    (1, "the quick stream  stream stream spark"),
    (2, "nothing relevant here at all"),
    (3, "  vector   "),
    (4, "SPARK Vector STREAM mixed case query"),
]
TERMS = ["spark", "vector", "stream"]
K1, B = 1.2, 0.75


def _py_bm25(corpus, terms, k1=K1, b=B):
    """Independent loop implementation (Robertson/Lucene idf)."""
    toks = {i: t.lower().split() for i, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            out[i] = s
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_tokenize_drops_blanks_and_lowercases(spark):
    df = spark.createDataFrame([("  A  b\tC ",), ("",)], "t string")
    rows = df.select(tokenize("t").alias("x")).collect()
    assert rows[0].x == ["a", "b", "c"]
    assert rows[1].x == []


def test_bm25_matches_loop_reference(docs):
    got = {r.doc_id: r.bm25 for r in bm25_score(docs, TERMS).collect()}
    want = _py_bm25(CORPUS, TERMS)
    assert set(got) == set(want)  # doc 2 (no term) absent
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_bm25_dedups_and_lowercases_query_terms(docs):
    a = {r.doc_id: r.bm25 for r in bm25_score(docs, TERMS).collect()}
    noisy = ["Spark", "spark", " VECTOR ", "stream", "stream"]
    b_ = {r.doc_id: r.bm25 for r in bm25_score(docs, noisy).collect()}
    assert a == b_
    with pytest.raises(ValueError):
        bm25_score(docs, ["  ", ""])


def test_bm25_unknown_term_contributes_nothing(docs):
    base = {r.doc_id: r.bm25 for r in bm25_score(docs, TERMS).collect()}
    plus = {
        r.doc_id: r.bm25
        for r in bm25_score(docs, TERMS + ["zzzznotaword"]).collect()
    }
    assert plus == pytest.approx(base)


def test_bm25_topk_rank_and_cutoff(docs):
    out = bm25_topk(docs, TERMS, k=2).collect()
    want = sorted(
        _py_bm25(CORPUS, TERMS).items(), key=lambda kv: (-round(kv[1], 6), kv[0])
    )
    assert [(r.doc_id, r.rank) for r in out] == [
        (want[0][0], 1),
        (want[1][0], 2),
    ]


def test_bm25_no_python_udf_in_plan(docs):
    plan = bm25_topk(docs, TERMS, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_rrf_exact_scores(spark):
    lex = spark.createDataFrame([(10, 1), (11, 2)], "doc_id long, rank int")
    dense = spark.createDataFrame([(11, 1), (12, 2)], "doc_id long, rank int")
    got = {
        r.doc_id: (r.rrf_score, r.n_systems)
        for r in rrf_fuse([lex, dense], c=60.0).collect()
    }
    assert got[10] == (pytest.approx(1 / 61), 1)
    assert got[11] == (pytest.approx(1 / 62 + 1 / 61), 2)
    assert got[12] == (pytest.approx(1 / 62), 1)


def test_rrf_single_system_and_empty_list(spark):
    lex = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    assert rrf_fuse([lex]).collect()[0].rrf_score == pytest.approx(1 / 61)
    with pytest.raises(ValueError):
        rrf_fuse([])
