"""Model-based quality classifier (operators/quality_model.py)."""

import numpy as np
import pytest

from vectordb_light_spark.operators.quality_model import (
    hashed_count_features,
    quality_classifier_scores,
    quantize_logreg,
    train_quality_logreg,
)


def _good_bad_corpus(n_each=40, seed=3):
    """Constructed good/bad split: good docs are prose-like (stopword
    rich, word tokens), bad docs are symbol/spam soup."""
    rng = np.random.default_rng(seed)
    good_vocab = ["the", "quick", "fox", "jumps", "over", "a", "lazy",
                  "dog", "and", "runs", "to", "in", "of", "is", "it"]
    bad_vocab = ["$$$", "!!!", "xxx", "@@@@", "#1", "%%", "|||", "~~~",
                 "win", "free", "$$$$", "0000"]
    docs = []
    for i in range(n_each):
        docs.append((i, " ".join(rng.choice(good_vocab, size=30)), 1.0))
    for i in range(n_each):
        docs.append((n_each + i, " ".join(rng.choice(bad_vocab, size=30)), 0.0))
    return docs


def test_logreg_separates_constructed_split():
    docs = _good_bad_corpus()
    X = hashed_count_features([t for _, t, _ in docs], 128)
    y = np.array([lab for _, _, lab in docs])
    w, b = train_quality_logreg(X, y, steps=500)
    p = 1 / (1 + np.exp(-np.clip(X @ w + b, -30, 30)))
    assert float(np.mean((p > 0.5) == y)) >= 0.95
    # determinism: same inputs, same model
    w2, b2 = train_quality_logreg(X, y, steps=500)
    assert np.array_equal(w, w2) and b == b2


def test_spark_scores_match_numpy_exactly(spark):
    """The quantized Spark logit must equal the numpy quantized logit
    EXACTLY — integer arithmetic end to end (this is what makes the
    DuckDB oracle bit-exact too)."""
    docs = _good_bad_corpus(n_each=15)
    X = hashed_count_features([t for _, t, _ in docs], 128)
    y = np.array([lab for _, _, lab in docs])
    w, b = train_quality_logreg(X, y, steps=300)
    wq, bq = quantize_logreg(w, b)
    want = {
        did: int(bq + int(X[i] @ np.array(wq)))
        for i, (did, _, _) in enumerate(docs)
    }
    df = spark.createDataFrame(
        [(d, t) for d, t, _ in docs], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["logit_q"]
        for r in quality_classifier_scores(df, wq, bq).collect()
    }
    assert got == want


def test_exotic_whitespace_tokenizes_identically(spark):
    """r6 ADVICE: \\x0B (in Java \\s, not RE2 \\s) and NBSP (Unicode
    whitespace for str.split(), token char for both regex engines)
    used to split differently across the trainer / Spark / oracle.
    With the pinned [ \\t\\n\\x0b\\f\\r]+ class, trainer features and
    Spark scores must agree exactly on such text."""
    texts = [
        "alpha\x0bbeta gamma",       # \x0B now splits in BOTH engines
        "alpha\xa0beta gamma",       # NBSP is a token char in BOTH
        "tab\tsplit\fand\rmore\nws",
        "plain ascii words",
    ]
    X = hashed_count_features(texts, 128)
    rng = np.random.default_rng(0)
    wq = [int(x) for x in rng.integers(-50, 50, size=128)]
    bq = 7
    want = {i: int(bq + int(X[i] @ np.array(wq))) for i in range(len(texts))}
    n_tok_want = {i: int(X[i].sum()) for i in range(len(texts))}
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in quality_classifier_scores(df, wq, bq).collect()
    }
    assert {i: r["logit_q"] for i, r in rows.items()} == want
    assert {i: r["n_tok"] for i, r in rows.items()} == n_tok_want
    assert rows[0]["n_tok"] == 3  # \x0B split
    assert rows[1]["n_tok"] == 2  # NBSP not split


def test_null_and_empty_text_scored_not_dropped(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "the fox")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            quality_classifier_scores(df, [5] * 64, -3).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for did in (1, 2, 3):
        assert rows[did]["n_tok"] == 0
        assert rows[did]["logit_q"] == -3
        assert rows[did]["keep"] is False
    assert rows[4]["n_tok"] == 2
    assert rows[4]["logit_q"] == -3 + 10
    assert rows[4]["keep"] is True


def test_scoring_plan_is_shuffle_free(spark):
    """The 100 TB claim: scoring is one projection over the scan —
    no Exchange anywhere in the plan."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        quality_classifier_scores(df, [1] * 32, 0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_checked_in_weights_provenance():
    """The shipped weights file carries real signal: nonzero weights,
    held-out metrics recorded, and dimensions consistent."""
    from vectordb_light_spark.functions import quality_weights as qw

    assert len(qw.WEIGHTS_Q) == qw.N_BUCKETS
    assert sum(1 for x in qw.WEIGHTS_Q if x != 0) >= 20
    assert "test_acc" in (qw.__doc__ or "")
