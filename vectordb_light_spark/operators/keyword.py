"""Keyword (lexical) retrieval: BM25 scoring, top-k, and rank fusion.

The reference engine is vector-only (vector_db_query.py has no lexical
path); production RAG stacks pair dense retrieval with BM25 and fuse
the two rankings, so this module adds that hybrid surface as a
beyond-reference operator family (task brief: training-data /
retrieval pipeline ops).

Everything is Catalyst builtins — no Python UDFs anywhere:

- tokenization is ``split`` + ``filter`` (whole-stage codegen);
- the query-term match is applied to the EXPLODED token stream before
  any shuffle, so only tokens equal to a query term ever leave the
  scan stage — at 100 TB the tf aggregation shuffles a few query
  terms' worth of postings, not the corpus;
- corpus stats (N, avgdl) are a scalar aggregate re-entering via a
  1-row broadcast; document frequency is a window over the already-
  tiny tf set (a groupBy+join-back would scan the corpus twice);
- the final top-k is orderBy+limit → TakeOrderedAndProject (per-
  partition k-heaps), same shape as operators/search.py:topk_cosine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["tokenize", "bm25_score", "bm25_topk", "rrf_fuse"]


def tokenize(col: Column | str) -> Column:
    """Lowercased whitespace tokens as ``array<string>`` (empty
    strings from leading/trailing/duplicate whitespace dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))


def bm25_score(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every matching document for a bag of query
    terms (terms are lowercased; duplicates contribute once).

    Returns ``(id_col, bm25)`` for documents containing at least one
    query term. Uses the Robertson/Lucene idf
    ``ln(1 + (N - df + .5)/(df + .5))`` (always positive).

    Plan shape: one pass over (id, text) computes doc length map-side
    and explodes tokens; a pushed ``isin(query_terms)`` filter keeps
    only matching tokens, so the tf groupBy — the only data-sized
    shuffle — carries O(matches) rows. A second column-pruned pass
    aggregates N/avgdl to one broadcast row; df-per-term is a window
    over the tf rows (stays in one lineage → exactly two corpus
    scans total, verified in PLANS.md).
    """
    terms = sorted({t.strip().lower() for t in query_terms if t and t.strip()})
    if not terms:
        raise ValueError("query_terms must contain at least one non-blank term")

    toks = docs.select(F.col(id_col), tokenize(text_col).alias("_toks"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.avg(F.size("_toks")).alias("_avgdl"),
    )
    # explode_OUTER, deliberately: plain explode triggers Catalyst's
    # InferFiltersFromGenerate, which synthesizes a
    # size(tokenize(text)) > 0 filter and pushes it below the
    # round-robin rebalance exchange — re-tokenizing the whole corpus
    # at raw SCAN parallelism (a single task for a one-file local
    # table) before the spread-out pass runs. Outer explode infers no
    # filter; the null row an empty document produces dies in the
    # isin() term filter anyway.
    matched = toks.select(
        id_col,
        F.size("_toks").alias("_dl"),
        F.explode_outer("_toks").alias("_term"),
    ).where(F.col("_term").isin(terms))
    tf = matched.groupBy(id_col, "_dl", "_term").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    # df-per-term as a window over tf, NOT a groupBy+join back: a join
    # would put tf's lineage in the plan twice (Spark recomputes the
    # shared subtree → a second full corpus scan). The window re-
    # shuffles only the ≤|terms|-per-doc tf rows.
    dfreq_w = Window.partitionBy("_term")

    scored = (
        tf.withColumn("_df", F.count(F.lit(1)).over(dfreq_w))
        .join(F.broadcast(stats))  # 1-row stats: broadcast NL join is O(n)
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
            ),
        )
        .withColumn(
            "_w",
            F.col("_idf")
            * (F.col("_tf") * (k1 + 1.0))
            / (
                F.col("_tf")
                + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("_w").alias("bm25"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 documents with a 1-based ``rank`` column.

    Ordering is by score ROUNDED to 6 decimals, ties broken on
    ``id_col`` ascending — deterministic across engines/summation
    orders (same convention as topk_cosine; SURVEY §2.8). The window
    rank runs over the ≤k materialized rows only.
    """
    scored = bm25_score(
        docs, query_terms, id_col=id_col, text_col=text_col, k1=k1, b=b
    )
    key = F.round(F.col("bm25"), 6)
    topk = scored.orderBy(key.desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(key.desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    ranked: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    c: float = 60.0,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of any number
    of ranked lists: ``rrf_score = Σ_systems 1/(c + rank)``.

    Implemented as union + one groupBy rather than a chain of outer
    joins — one shuffle regardless of the number of systems, and no
    null-handling ladder. Items absent from a system simply contribute
    nothing. Returns ``(id_col, rrf_score, n_systems)``.
    """
    if not ranked:
        raise ValueError("need at least one ranked list")
    parts = [
        df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(c)) + F.col(rank_col))).alias("_contrib"),
        )
        for df in ranked
    ]
    u = reduce(DataFrame.unionByName, parts)
    return u.groupBy(id_col).agg(
        F.sum("_contrib").alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_systems"),
    )
