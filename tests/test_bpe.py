"""operators/bpe.py — distributed BPE merge learning vs an
independent pure-Python reference implementation (standard Sennrich
dict-of-words algorithm, same deterministic tie-break)."""

import pytest

from vectordb_light_spark.operators.bpe import (
    END_OF_WORD,
    apply_merge,
    learn_bpe_merges,
    pair_counts,
    word_symbols,
    word_vocab,
)


def ref_bpe(word_freqs: dict[str, int], n_merges: int) -> list[tuple]:
    """Reference BPE: dict-of-words, full recount per round, greedy
    left-to-right merge application, (cnt desc, a, b) tie-break."""
    vocab = {
        tuple(word) + (END_OF_WORD,): f for word, f in word_freqs.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple, int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[syms[i], syms[i + 1]] = pairs.get(
                    (syms[i], syms[i + 1]), 0
                ) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _corpus_df(spark, word_freqs):
    rows = []
    for w, f in word_freqs.items():
        rows.extend([(w,)] * f)
    return spark.createDataFrame(rows, "text string")


def test_learned_merges_match_reference(spark):
    got = learn_bpe_merges(_corpus_df(spark, SENNRICH), 8)
    want = ref_bpe(SENNRICH, 8)
    assert [(m["a"], m["b"], m["cnt"]) for m in got] == want
    assert [m["merge_idx"] for m in got] == list(range(1, len(want) + 1))
    # the classic first merges on this corpus: es (9), est (9), ...
    assert (got[0]["a"], got[0]["b"], got[0]["cnt"]) == ("e", "s", 9)
    assert (got[1]["a"], got[1]["b"], got[1]["cnt"]) == ("es", "t", 9)


def test_repeated_symbol_words_match_reference(spark):
    """[a,a,a]-style repetition: the delta recount and the greedy
    fold must both handle overlapping candidate pairs."""
    freqs = {"aaa": 4, "aaaa": 3, "ab": 2}
    got = learn_bpe_merges(_corpus_df(spark, freqs), 6)
    assert [(m["a"], m["b"], m["cnt"]) for m in got] == ref_bpe(freqs, 6)


def test_greedy_fold_merges_left_to_right(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a", "a", "a"],), (["a", "b", "a", "b"],)],
        "syms array<string>",
    )
    out = [r["m"] for r in df.select(apply_merge("syms", "a", "a").alias("m")).collect()]
    assert out[0] == ["aa", "aa", "a"]
    assert out[1] == ["a", "b", "a", "b"]
    out2 = df.select(apply_merge("syms", "a", "b").alias("m")).collect()
    assert out2[1]["m"] == ["ab", "ab"]


def test_early_stop_when_no_pairs_reach_min_count(spark):
    got = learn_bpe_merges(_corpus_df(spark, {"ab": 1}), 10, min_pair_count=5)
    assert got == []


def test_pair_counts_weighted_by_freq(spark):
    vocab = word_vocab(_corpus_df(spark, {"ab": 3, "ba": 2}))
    syms = vocab.select("word", "freq", word_symbols().alias("syms"))
    got = {
        (r["a"], r["b"]): r["cnt"] for r in pair_counts(syms).collect()
    }
    assert got[("a", "b")] == 3
    assert got[("b", "a")] == 2
    assert got[("b", END_OF_WORD)] == 3
    assert got[("a", END_OF_WORD)] == 2


@pytest.mark.parametrize("n", [1, 3])
def test_merge_count_respected(spark, n):
    got = learn_bpe_merges(_corpus_df(spark, SENNRICH), n)
    assert len(got) == n


def ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + [END_OF_WORD]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_encode_entry_matches_reference_encoder(spark):
    """pipe_bpe_encode's nested fold must tokenize exactly like the
    reference per-word greedy encoder over the same merge table."""
    from vectordb_light_spark.queries import _BPE_MERGES, pipe_bpe_encode

    rows = pipe_bpe_encode(spark, "/root/testdata/sf0.001").collect()
    import duckdb

    texts = dict(
        duckdb.sql(
            "SELECT doc_id, text FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
    )
    assert len(rows) == len(texts)
    for r in rows[:50]:
        words = [w for w in (texts[r["doc_id"]] or "").lower().strip().split() if w]
        want = [t for w in words for t in ref_encode(w, _BPE_MERGES)]
        assert r["encoded"].split(" ") == want if want else r["encoded"] == ""
        assert r["n_tok"] == len(want)


# ---------------------------------------------------------------------------
# r8: the pinned cross-engine whitespace class (VERDICT r7 item 3)
# ---------------------------------------------------------------------------

#: Java \s splits on \x0B, RE2 \s does not, Python str.split() adds
#: Unicode whitespace (NBSP, \x1c...). This text trips every one of
#: those divergences: the pinned class must split on \x0B but keep
#: NBSP and \x1c INSIDE tokens, identically on all three engines.
TRICKY = "Alpha\x0bbeta GAMMA\xa0delta\tfive\x0csix\rseven\nEIGHT nine\x1cten"
TRICKY_TOKENS = [
    "alpha", "beta", "gamma\xa0delta", "five", "six",
    "seven", "eight", "nine\x1cten",
]


def test_pinned_ws_class_identical_across_engines(spark):
    import re

    import duckdb

    from vectordb_light_spark.functions.text import PINNED_WS_RE
    from vectordb_light_spark.operators.dedup import ngram_tokens

    # the quality-model trainer pins the same class (spelled lowercase)
    assert PINNED_WS_RE.lower() == "[ \\t\\n\\x0b\\f\\r]+"

    # Python (trainer convention: quality_model.hashed_count_features)
    py = [t for t in re.split(PINNED_WS_RE, TRICKY.lower()) if t]
    assert py == TRICKY_TOKENS

    # Spark/Java: ngram_tokens is the ordered token stream
    df = spark.createDataFrame([(TRICKY,)], "text string")
    spark_toks = df.select(ngram_tokens("text").alias("t")).head()["t"]
    assert spark_toks == TRICKY_TOKENS

    # DuckDB/RE2: the oracle-twin spelling, injected verbatim
    # trim(t, ' '): DuckDB 1-arg trim strips Unicode spaces (NBSP),
    # Spark's only ASCII space — twins spell the char set explicitly
    duck = duckdb.sql(
        "SELECT list_filter(string_split_regex(lower(trim(t, ' ')), "
        f"'{PINNED_WS_RE}'), x -> x <> '') AS toks FROM "
        "(SELECT ? AS t)",
        params=[TRICKY],
    ).fetchone()[0]
    assert duck == TRICKY_TOKENS


def test_word_vocab_uses_pinned_class(spark):
    r"""word_vocab must count \x0B-separated words separately (Java
    ``\s`` did this implicitly; the pin makes DuckDB twins agree)."""
    df = spark.createDataFrame([("aa\x0bbb aa",), ("bb\xa0cc",)], "text string")
    got = {r["word"]: r["freq"] for r in word_vocab(df).collect()}
    assert got == {"aa": 2, "bb": 1, "bb\xa0cc": 1}


# ---------------------------------------------------------------------------
# r12: the memoized Arrow encode stage (optimization round)
# ---------------------------------------------------------------------------


def test_apply_merges_py_matches_jvm_fold(spark):
    """apply_merges_py (the encode UDF's inner fold) must agree with
    chaining the JVM apply_merge fold over the same merge table —
    including the overlapping-run greedy case ([a,a,a] with merge
    (a,a) → [aa, a]) and merges whose result feeds later merges."""
    import random

    from pyspark.sql import functions as F

    from vectordb_light_spark.operators.bpe import (
        END_OF_WORD,
        apply_merge,
        apply_merges_py,
    )

    merges = [("a", "a"), ("e", "r"), ("er", END_OF_WORD), ("aa", "a")]
    rng = random.Random(12)
    words = ["aaa", "aaaa", "error", "er", ""] + [
        "".join(rng.choice("aber") for _ in range(rng.randint(1, 9)))
        for _ in range(40)
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    syms = F.concat(F.split("w", ""), F.array(F.lit(END_OF_WORD)))
    for a, b in merges:
        syms = apply_merge(syms, a, b)
    got = [r["s"] for r in df.select(syms.alias("s")).collect()]
    want = [apply_merges_py(w, merges) for w in words]
    # F.split('', '') yields [''] for the empty string; the entry
    # never feeds empty words (filtered), so compare non-empty only
    for w, g, x in zip(words, got, want):
        if w:
            assert g == x, (w, g, x)


def test_encode_words_udf_matches_reference(spark):
    """The memoized Arrow encode (one fold per DISTINCT word per
    task) must produce the same token stream and count as per-word
    reference encoding — duplicates exercising the memo path."""
    from pyspark.sql import functions as F

    from vectordb_light_spark.operators.bpe import encode_words_udf

    merges = [("e", "r"), ("er", "</w>"), ("o", "w")]
    rows = [
        (1, ["error", "tower", "error", "ow"]),
        (2, []),
        (3, ["er", "er", "er"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, words array<string>")
    enc = encode_words_udf(merges)
    got = {
        r["doc_id"]: (r["s"]["n_tok"], r["s"]["encoded"])
        for r in df.select("doc_id", enc("words").alias("s")).collect()
    }
    want = {}
    for doc_id, words in rows:
        toks = [t for w in words for t in ref_encode(w, merges)]
        want[doc_id] = (len(toks), " ".join(toks))
    assert got == want
