"""Hypothesis property tests (SURVEY §5.4): normalizer invariants,
chunker ≡ reference loop on arbitrary inputs, top-k/threshold
monotonicity, embedder invariants.

Spark-backed properties batch all generated inputs into ONE job per
example and cap example counts — a Spark action per hypothesis example
would dominate the suite.
"""

from __future__ import annotations

import math
import unicodedata

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vectordb_light_spark.functions.text import normalize_text_py

# Reuse the reference splitter loop the unit tests compare against.
from test_chunker import _ref_fixed_split


# ---------------------------------------------------------------------------
# Normalizer (T5) — pure python, cheap: many examples
# ---------------------------------------------------------------------------


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_text_py(s)
    assert normalize_text_py(once) == once


@given(st.text(max_size=300))
@settings(max_examples=300, deadline=None)
def test_normalize_output_charclasses(s):
    out = normalize_text_py(s)
    if out is None:
        return
    assert out == out.strip()
    assert out != ""
    for ch in out:
        code = ord(ch)
        assert code <= 0xFFFF  # astral dropped
        assert not (0xE000 <= code <= 0xF8FF)  # private use dropped
        assert code != 0xFFFD
        # Cc controls: only \n and \t survive (reference drops C0/C1/
        # DEL; \r → space). Other C* categories (Cn unassigned, Cf
        # format) pass through unless in the explicit invisible list —
        # the reference strips by explicit class, not by category.
        if unicodedata.category(ch) == "Cc":
            assert ch in ("\n", "\t")
        assert ch not in "​‌‍‎‏⁠⁡⁢⁣⁤﻿"
    # whitespace-mode: no runs of SPACES, no space padding around
    # newlines, ≤2 newlines. Tab runs legitimately SURVIVE: the
    # reference's own collapse regex is [^\S\n\t]+ (utilities_core
    # normalize_text), which exempts \t exactly like \n — the r12
    # hypothesis run found '0\t\t0' → '0\t\t0' and the engine is
    # right; the old assertion ("\t\t" not in out) over-claimed.
    assert "  " not in out and " \n" not in out
    assert "\n\n\n" not in out


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_query_normalize_flattens(s):
    from vectordb_light_spark.functions.text import normalize_query_text_py

    out = normalize_query_text_py(s)
    assert out == " " or ("\n" not in out and "\t" not in out and "  " not in out)


# ---------------------------------------------------------------------------
# Chunker (T3) — Spark; one job per example, few examples
# ---------------------------------------------------------------------------

_texts = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Zs")),
        max_size=120,
    ),
    min_size=1,
    max_size=12,
)


@given(texts=_texts, size=st.integers(2, 40), overlap=st.integers(0, 39))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunker_matches_reference_loop(spark, texts, size, overlap):
    from vectordb_light_spark.operators.chunker import split_fixed_size

    overlap = min(overlap, size - 1)  # config validator: overlap < size
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = split_fixed_size(df, chunk_size=size, chunk_overlap=overlap)
    got: dict = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], {})[r["chunk_index"]] = r["chunk"]
    for doc_id, text in enumerate(texts):
        expected = _ref_fixed_split(text, size, overlap)
        chunks = got.get(doc_id, {})
        actual = [chunks[i] for i in sorted(chunks)]
        assert actual == expected, (doc_id, size, overlap)
        for c in actual:  # length bound + non-emptiness
            assert 1 <= len(c) <= size


# ---------------------------------------------------------------------------
# Top-k monotonicity (Q2/Q5) — deterministic, single Spark jobs
# ---------------------------------------------------------------------------


def test_topk_prefix_and_threshold_monotonicity(spark):
    from pyspark.sql import functions as F

    from vectordb_light_spark.operators.search import SearchParams, topk_cosine
    from vectordb_light_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").cache()
    q = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]

    def ids(k, threshold):
        out = topk_cosine(
            emb, q, SearchParams(k=k, threshold=threshold, assume_normalized=True),
            id_col="vec_id", vec_col="embedding",
        )
        return [r["vec_id"] for r in out.select("vec_id").collect()]

    full = ids(20, 0.0)
    for k in (1, 5, 10):
        assert ids(k, 0.0) == full[:k]  # k' ≤ k ⇒ prefix
    lo, hi = ids(10, 0.2), ids(10, 0.6)
    assert set(hi) <= set(lo)  # higher threshold ⇒ subset
    # threshold applies AFTER top-k: never more than k rows, possibly fewer
    assert len(ids(10, 0.99)) <= 10


# ---------------------------------------------------------------------------
# Hashing embedder invariants (E5 test double)
# ---------------------------------------------------------------------------


@given(st.lists(st.text(max_size=60), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_hashing_embedder_unit_norm_and_deterministic(texts):
    from vectordb_light_spark.functions.embedding import HashingEmbedder

    a = HashingEmbedder(dim=32, seed=3).encode(texts)
    b = HashingEmbedder(dim=32, seed=3).encode(texts)
    np.testing.assert_array_equal(a, b)
    norms = np.linalg.norm(a, axis=1)
    for i, t in enumerate(texts):
        if (t or "").split():
            # unit norm — or exactly zero when the ±1 token votes
            # cancel bucket-by-bucket (legal for token multisets)
            assert abs(norms[i] - 1.0) < 1e-5 or norms[i] == 0.0
        else:
            assert norms[i] == 0.0  # empty text → zero vector


_words = st.sampled_from(
    ["spark", "vector", "stream", "table", "row", "the", "fast", "x"]
)
_docs_texts = st.lists(
    st.lists(_words, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=10,
)


@given(texts=_docs_texts, terms=st.lists(_words, min_size=1, max_size=3))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_bm25_matches_loop_on_random_corpora(spark, texts, terms):
    """BM25 distributed == single-threaded loop on arbitrary corpora,
    including empty docs, absent terms, and duplicate query terms."""
    import math

    import pytest

    from vectordb_light_spark.operators.keyword import bm25_score

    corpus = list(enumerate(texts))
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in bm25_score(df, terms).collect()}

    toks = {i: t.split() for i, t in corpus}
    n = len(toks)
    avgdl = sum(map(len, toks.values())) / n
    uniq = sorted(set(terms))
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in uniq}
    want = {}
    for i, v in toks.items():
        s = 0.0
        for t in uniq:
            tf = v.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl))
        if s > 0:
            want[i] = s
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


_word = st.text(alphabet="abcdef", min_size=1, max_size=3)
_doc = st.lists(_word, min_size=0, max_size=25).map(" ".join)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_doc, min_size=2, max_size=6))
def test_containment_matches_bruteforce(spark, docs):
    """containment_pairs over random small-alphabet docs equals the
    Python brute-force shingle computation (no df cap ⇒ exact)."""
    from vectordb_light_spark.operators.dedup import containment_pairs

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(
            df, threshold=0.0, max_df=10**9, shingle=2
        ).collect()
    }

    def sh(t):
        w = [x for x in t.split() if x]
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    want = {}
    shs = {i: sh(t) for i, t in rows}
    for a, sa in shs.items():
        for b, sb in shs.items():
            if a != b and sa and sa & sb:
                want[(a, b)] = round(len(sa & sb) / len(sa), 6)
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.tuples(
            st.integers(0, 2),
            st.lists(
                st.floats(-5, 5, allow_nan=False, width=32),
                min_size=4,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_mean_pool_matches_numpy(spark, data):
    import numpy as np

    from vectordb_light_spark.functions.vector import mean_pool_vectors

    df = spark.createDataFrame(
        [(g, [float(x) for x in v]) for g, v in data],
        "g long, vector array<float>",
    )
    got = {
        r["g"]: np.array(r["vec"])
        for r in mean_pool_vectors(
            df, "g", "vector", out_col="vec", normalize=False
        ).collect()
    }
    by_g = {}
    for g, v in data:
        by_g.setdefault(g, []).append(np.array(v, dtype=np.float32).astype(np.float64))
    for g, vs in by_g.items():
        want = np.stack(vs).mean(axis=0)
        assert np.allclose(got[g], want, atol=1e-7), (g, got[g], want)


# ---------------------------------------------------------------------------
# Calendar gap-fill — one Spark job checks a brute-force python twin
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),          # user
            st.integers(min_value=1, max_value=20),         # day of month
            st.floats(min_value=-50, max_value=50, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gapfill_matches_bruteforce(spark, events):
    import datetime

    from vectordb_light_spark.operators.timeseries import resample_daily_gapfill

    rows = [
        (u, datetime.datetime(2024, 3, d, 12), float(v)) for u, d, v in events
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["day"].day): (
            r["n_events"], r["is_gap"], r["day_value_e4"], r["carry_value_e4"]
        )
        for r in resample_daily_gapfill(ev).collect()
    }

    # brute force
    per_day: dict[tuple[int, int], list[float]] = {}
    for u, d, v in events:
        per_day.setdefault((u, d), []).append(float(v))
    expect = {}
    for u in {u for u, _, _ in events}:
        days = [d for (uu, d) in per_day if uu == u]
        carry = None
        for d in range(min(days), max(days) + 1):
            vals = per_day.get((u, d))
            if vals is None:
                expect[(u, d)] = (0, 1, None, carry)
            else:
                # HALF_UP like Spark F.round, not Python's banker's
                s = sum(
                    int(math.floor(v * 10000 + 0.5))
                    if v >= 0
                    else int(math.ceil(v * 10000 - 0.5))
                    for v in vals
                )
                carry = s
                expect[(u, d)] = (len(vals), 0, s, s)
    assert got == expect


# ---------------------------------------------------------------------------
# Stratified exact quotas — quota, determinism, nested-rank properties
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60, unique=True),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_stratified_take_quota_properties(spark, ids, n):
    from pyspark.sql import functions as F

    from vectordb_light_spark.operators.sampling import stratified_take

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long").withColumn(
        "lang", (F.col("doc_id") % 3).cast("string")
    )
    out = stratified_take(df, n, strata_col="lang").collect()
    by_stratum: dict[str, list] = {}
    for r in out:
        by_stratum.setdefault(r["lang"], []).append(r)
    for lang, rows in by_stratum.items():
        avail = sum(1 for i in ids if str(i % 3) == lang)
        assert len(rows) == min(n, avail)          # exact quota (or all)
        assert sorted(r["take_rank"] for r in rows) == list(range(1, len(rows) + 1))
    # smaller n is a prefix of larger n (ranks are stable)
    sub = {
        (r["doc_id"], r["take_rank"])
        for r in stratified_take(df, max(1, n - 1), strata_col="lang").collect()
    }
    sup = {(r["doc_id"], r["take_rank"]) for r in out}
    assert sub <= sup


# ---------------------------------------------------------------------------
# Content-defined chunking (r7) — roundtrip on arbitrary unicode,
# keep-first line dedup vs a Python reference
# ---------------------------------------------------------------------------


@given(
    texts=st.lists(st.text(max_size=400), min_size=1, max_size=10),
    divisor=st.sampled_from([16, 64, 256]),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_cdc_roundtrip_on_arbitrary_unicode(spark, texts, divisor):
    """CDC's structural invariants hold for ANY input, not just the
    ASCII corpus: chunks concatenate back to the exact document, every
    doc returns >= 1 chunk, and indices are 1-based and contiguous.
    (Boundary PLACEMENT on non-ASCII is engine-defined via ascii();
    the roundtrip is position-sliced so it never depends on that.)"""
    from vectordb_light_spark.operators.chunker import split_content_defined

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = split_content_defined(df, divisor=divisor).collect()
    by: dict = {}
    for r in rows:
        by.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk"]
    for doc_id, text in enumerate(texts):
        chunks = by.get(doc_id, {})
        assert chunks, (doc_id, text)
        assert sorted(chunks) == list(range(1, len(chunks) + 1))
        assert "".join(chunks[i] for i in sorted(chunks)) == text


def _ref_line_dedup(docs: list[tuple[int, str]], sep: str) -> dict[int, str]:
    seen: set = set()
    out: dict[int, str] = {}
    for doc_id, text in sorted(docs):
        kept = []
        for seg in text.split(sep):
            key = seg.strip(" ")
            if key == "":
                kept.append(seg)
            elif key not in seen:
                seen.add(key)
                kept.append(seg)
        out[doc_id] = sep.join(kept)
    return out


@given(
    docs=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab \n")), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_line_dedup_matches_reference_loop(spark, docs):
    """dedup_lines_keep_first ≡ the sequential keep-first loop on
    adversarial inputs: tiny alphabet forces heavy cross-doc and
    within-doc collisions, blank and whitespace-only segments
    included. The kept text must match the loop EXACTLY — including
    the trim-normalized survivor identity."""
    from vectordb_light_spark.operators.dedup import dedup_lines_keep_first

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_lines_keep_first(df, sep="\n").collect()
    }
    assert got == _ref_line_dedup(rows, "\n")


# ---------------------------------------------------------------------------
# r8: the pinned cross-engine whitespace class, property-tested
# ---------------------------------------------------------------------------

#: Texts salted with the exact divergence characters: \x0B (Java \s
#: has it, RE2 \s lacks it), NBSP and \x1c (Python str.split() splits
#: on them, the pinned class must not), plus ordinary whitespace.
_ws_tricky_text = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ09.,!") + [" ", "\t", "\n", "\x0b", "\f", "\r",
                              "\xa0", "\x1c", " "]
    ),
    max_size=120,
)


@given(texts=st.lists(_ws_tricky_text, min_size=1, max_size=8))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_pinned_ws_tokenization_identical_three_engines(spark, texts):
    """For ANY text, ngram_tokens (Spark/Java regex), the DuckDB twin
    spelling, and Python re.split on PINNED_WS_RE must produce the
    identical token stream — the cross-engine contract every
    ngram/BPE oracle rests on."""
    import re as _re

    import duckdb

    from vectordb_light_spark.functions.text import PINNED_WS_RE
    from vectordb_light_spark.operators.dedup import ngram_tokens

    # Spark trim strips only ASCII spaces; mirror that (not .strip())
    def py_tokens(t):
        trimmed = t.strip(" ")
        return _re.split(PINNED_WS_RE, trimmed.lower())

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id", ngram_tokens("text").alias("toks")
        ).collect()
    }
    con = duckdb.connect()
    for i, t in rows:
        want = py_tokens(t)
        assert got[i] == want, (t, got[i], want)
        # trim(s, ' '): DuckDB's 1-arg trim strips the Unicode SPACE
        # class (NBSP, thin space) where Spark's strips only ASCII
        # space — the oracle twins pin the explicit char set.
        duck = con.execute(
            "SELECT string_split_regex(lower(trim(?, ' ')), "
            f"'{PINNED_WS_RE}')",
            [t],
        ).fetchone()[0]
        assert duck == want, (t, duck, want)


@given(texts=st.lists(_ws_tricky_text, min_size=1, max_size=8))
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_pinned_canonical_text_identical_three_engines(spark, texts):
    """r8 migration batch 2: the exact-dedup/minhash canonical form —
    collapse whitespace runs to one space, trim, lowercase — must be
    byte-identical across Spark (dedup.canonical_text, Java \\s+), the
    pinned DuckDB oracle spelling (explicit class + 2-arg trim), and
    a Python reference. This is the contract dd_exact_dedup,
    dd_minhash_candidates, dd_cross_corpus_candidates and the
    curate-chain keyed CTE now rest on."""
    import re as _re

    import duckdb

    from vectordb_light_spark.operators.dedup import canonical_text

    def py_canon(t):
        # Java \s == the pinned class; collapse-then-trim, then lower
        return _re.sub(r"[ \t\n\x0b\f\r]+", " ", t).strip(" ").lower()

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id", canonical_text("text").alias("t")
        ).collect()
    }
    con = duckdb.connect()
    for i, t in rows:
        want = py_canon(t)
        assert got[i] == want, (t, got[i], want)
        duck = con.execute(
            "SELECT lower(trim(regexp_replace(?, "
            "'[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'), ' '))",
            [t],
        ).fetchone()[0]
        assert duck == want, (t, duck, want)
