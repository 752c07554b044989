"""The read path: exact top-k cosine search with the reference's
post-top-k filter semantics.

Reference pipeline (vector_db_query.py:140-263) in order:
  Q1 embed query → Q2 FLAT top-k cosine → Q4 dist→sim clip →
  Q5 similarity threshold (AFTER top-k — results may shrink below k) →
  Q8 case-insensitive search-term substring filter →
  Q9 document-type equality filter → Q10 rank-ordered projection.

Order is semantics, not optimization: the threshold and post-filters
are applied to the top-k result, so pushing them below the limit would
be WRONG (they can only shrink the k rows, never admit replacements).
We encode that by materializing the top-k with a row_number rank
before filtering — the limit is a hard barrier Catalyst cannot (and
must not) push filters through.

Scale notes (100 TB): the top-k itself is a TakeOrderedAndProject —
each task keeps a k-sized heap, the driver merges per-partition heaps;
no shuffle of the full table, no sort. The scan prunes to
(id, vector[, filter cols]) via Parquet column pruning. For repeated
queries, batch them via :func:`topk_cosine_batch` (one scan for Q
queries) rather than Q scans.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectordb_light_spark.functions.vector import cosine_similarity, dot_product


@dataclass(frozen=True)
class SearchParams:
    """Query-time knobs, mirroring the reference's config
    (reference config.py:28-32): k ('contexts') default 6, similarity
    threshold default 0.4, optional substring search term and
    document-type equality filter."""

    k: int = 6
    threshold: float = 0.4
    search_term: str | None = None
    document_type: str | None = None
    assume_normalized: bool = False  # write-path vectors are L2-normalized


def similarity_column(vec_col: Column | str, query: list[float], *, assume_normalized: bool) -> Column:
    """Cosine similarity of a vector column against one literal query
    vector, clipped to [0,1] like the reference's
    sim = clip(1 - distance, 0, 1) (vector_db_query.py:186-192).
    Pure Catalyst expression form — fine for oracle queries and
    derived columns; the hot scan path uses :func:`make_query_sim_udf`
    (one BLAS matvec per Arrow batch instead of an interpreted lambda
    fold per row)."""
    from vectordb_light_spark.session import literal_array

    q = literal_array(query, "double")
    sim = dot_product(vec_col, q) if assume_normalized else cosine_similarity(vec_col, q)
    return F.least(F.greatest(sim, F.lit(0.0)), F.lit(1.0))


def make_query_sim_udf(query: list[float], *, assume_normalized: bool):
    """Arrow-batched twin of :func:`similarity_column`: [n,d] batch @
    query with BLAS, clip to [0,1]. Same doubles up to summation
    order."""
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query, dtype=np.float64)
    if not assume_normalized:
        q = q / max(float(np.linalg.norm(q)), 1e-12)

    @pandas_udf("double")
    def sim(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="float64")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        if not assume_normalized and len(mat):
            n = np.linalg.norm(mat, axis=1, keepdims=True)
            np.maximum(n, 1e-12, out=n)
            mat = mat / n
        return pd.Series(np.clip(mat @ q, 0.0, 1.0))

    return sim


def topk_cosine(
    vectors: DataFrame,
    query: list[float],
    params: SearchParams = SearchParams(),
    *,
    id_col: str = "id",
    vec_col: str = "vector",
) -> DataFrame:
    """Exact brute-force top-k cosine search (reference Q2,
    vector_db_query.py:148-163) with rank, then the reference's
    post-top-k filters (Q5/Q8/Q9).

    Returns the input columns (minus the vector) plus
    ``similarity_score`` (double, clipped) and ``rank`` (1..≤k).
    Ties break on ``id_col`` ascending so results are deterministic
    (the reference's numpy argpartition tie order is unspecified;
    SURVEY §2.8 requires an explicit tiebreaker).
    """
    sim_udf = make_query_sim_udf(query, assume_normalized=params.assume_normalized)
    scored = vectors.withColumn("similarity_score", sim_udf(F.col(vec_col)))

    # TakeOrderedAndProject: per-partition k-heaps, no full sort/shuffle.
    topk = (
        scored.orderBy(F.col("similarity_score").desc(), F.col(id_col).asc())
        .limit(params.k)
    )

    # Rank within the materialized top-k (window over ≤k rows — cheap),
    # assigned BEFORE post-filters so surviving rows keep their original
    # rank, matching the reference's ordered-list semantics.
    w = Window.orderBy(F.col("similarity_score").desc(), F.col(id_col).asc())
    ranked = topk.withColumn("rank", F.row_number().over(w))

    out = ranked.where(F.col("similarity_score") >= F.lit(params.threshold))
    if params.search_term:
        # Q8: case-insensitive substring containment on chunk text
        # (vector_db_query.py:243-250).
        out = out.where(
            F.contains(F.lower(F.col("text")), F.lit(params.search_term.lower()))
        )
    if params.document_type:
        # Q9: exact equality on document_type (vector_db_query.py:252-257).
        out = out.where(F.col("document_type") == F.lit(params.document_type))
    return out.drop(vec_col).orderBy("rank")


def range_search(
    vectors: DataFrame,
    query: list[float],
    *,
    radius: float,
    id_col: str = "id",
    vec_col: str = "vector",
    assume_normalized: bool = False,
) -> DataFrame:
    """ALL vectors within a similarity radius of the query (the FAISS
    ``range_search`` analogue) — no k: result size is data-dependent,
    which is what dedup sweeps and recall audits want, where top-k's
    fixed cutoff would truncate dense neighborhoods.

    Plan shape: one scan + map-side filter — no shuffle at all until
    the final (result-sized, not data-sized) sort. At 100 TB this is
    strictly cheaper than top-k: no per-partition heaps, no ordered
    reduce; the scan parallelism IS the operator.

    Returns the input columns (minus the vector) plus
    ``similarity_score`` (double, clipped to [0,1]), ordered by
    (score desc, id).
    """
    sim_udf = make_query_sim_udf(query, assume_normalized=assume_normalized)
    return (
        vectors.withColumn("similarity_score", sim_udf(F.col(vec_col)))
        .where(F.col("similarity_score") >= F.lit(radius))
        .drop(vec_col)
        .orderBy(F.col("similarity_score").desc(), F.col(id_col).asc())
    )


def topk_cosine_batch(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int = 6,
    threshold: float = 0.0,
    id_col: str = "id",
    vec_col: str = "vector",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    assume_normalized: bool = False,
) -> DataFrame:
    """Top-k for MANY queries in one scan of the vectors table.

    The query set (small by contract — it is broadcast) is collected
    into a dense matrix and shipped to executors; every vectors
    partition computes its block × queriesᵀ with ONE BLAS matmul per
    Arrow batch and emits only its per-query local top-k, so the
    shuffle to the final per-query window rank carries ≤ k rows per
    query per partition — the O(N·M) similarity matrix never exists as
    rows. (A crossJoin + per-row higher-order-function dot product
    computes the same thing ~20× slower: the HOF lambda runs in the
    expression interpreter per row; measured in tools/scale_probe.py.)
    Local and global orderings are identical (similarity desc, id asc),
    which makes the two-phase top-k exact, ties included.

    This is the scale path for query throughput and for N×M similarity
    joins with a small N: one pass over 100 TB serves thousands of
    queries. For large×large, use the LSH tiers in
    operators.similarity instead.
    """
    spark = vectors.sparkSession
    qrows = queries.select(query_id_col, query_vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    if not assume_normalized and len(qmat):
        qn = np.linalg.norm(qmat, axis=1, keepdims=True)
        np.maximum(qn, 1e-12, out=qn)
        qmat = qmat / qn
    b_q = spark.sparkContext.broadcast((qids, qmat))

    def run(batches):
        qids_, qmat_ = b_q.value
        for pdf in batches:
            if not len(pdf) or not len(qids_):
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_mat = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            if not assume_normalized:
                n = np.linalg.norm(a_mat, axis=1, keepdims=True)
                np.maximum(n, 1e-12, out=n)
                a_mat = a_mat / n
            sims = np.clip(a_mat @ qmat_.T, 0.0, 1.0)  # [n_block, n_queries]
            kk = min(k, sims.shape[0])
            out_q, out_i, out_s = [], [], []
            for j in range(sims.shape[1]):
                col = sims[:, j]
                idx = (
                    np.argpartition(-col, kk - 1)[:kk]
                    if kk < col.shape[0]
                    else np.arange(col.shape[0])
                )
                idx = idx[np.lexsort((a_ids[idx], -col[idx]))]
                out_q.append(np.full(len(idx), qids_[j], dtype=np.int64))
                out_i.append(a_ids[idx])
                out_s.append(col[idx])
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    id_col: np.concatenate(out_i),
                    "similarity_score": np.concatenate(out_s),
                }
            )

    local = vectors.select(id_col, vec_col).mapInPandas(
        run, schema=f"{query_id_col} long, {id_col} long, similarity_score double"
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("similarity_score").desc(), F.col(id_col).asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.lit(k))
        .where(F.col("similarity_score") >= F.lit(threshold))
    )


def mmr_rerank(
    pool: DataFrame,
    query: list[float],
    *,
    k: int = 6,
    lam: float = 0.5,
    id_col: str = "id",
    vec_col: str = "vector",
) -> DataFrame:
    """Maximal-marginal-relevance diversification (Carbonell &
    Goldstein 1998, public method): greedily pick the candidate
    maximizing ``lam·sim(q, d) − (1−lam)·max_{s∈selected} sim(d, s)``
    — near-duplicate hits stop crowding the result the moment one of
    them is selected.

    Scale shape: the DISTRIBUTED part of the query (the full-table
    top-k scan) has already shrunk the data to a pool of tens of rows;
    MMR is an inherently sequential greedy loop over that pool, so it
    runs driver-side in numpy on k-sized data — putting it in a Spark
    job would add scheduling overhead to an O(pool²·dim) computation
    that fits in a cache line budget. Pass a pool of ``fetch_k`` (2-5×
    final k) rows from :func:`topk_cosine`; ties break by ascending
    id. Returns (id, similarity_score, mmr_score, mmr_rank).
    """
    rows = pool.select(id_col, vec_col).collect()
    if not rows:
        return pool.sparkSession.createDataFrame(
            [], f"{id_col} long, similarity_score double, mmr_score double, mmr_rank int"
        )
    ids = [r[0] for r in rows]
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    qv = np.asarray(query, dtype=np.float64)
    rel = mat @ qv  # assume unit-norm store (write-path invariant)

    selected: list[int] = []
    scores: list[float] = []
    remaining = list(range(len(ids)))
    while remaining and len(selected) < k:
        if not selected:
            mmr = rel[remaining]
        else:
            red = (mat[remaining] @ mat[selected].T).max(axis=1)
            mmr = lam * rel[remaining] - (1.0 - lam) * red
        # argmax with ascending-id tiebreak: sort keys (score desc, id)
        best = min(
            range(len(remaining)),
            key=lambda i: (-mmr[i], ids[remaining[i]]),
        )
        selected.append(remaining[best])
        scores.append(float(mmr[best]))
        remaining.pop(best)

    out = [
        (int(ids[i]), float(rel[i]), scores[r], r + 1)
        for r, i in enumerate(selected)
    ]
    return pool.sparkSession.createDataFrame(
        out, f"{id_col} long, similarity_score double, mmr_score double, mmr_rank int"
    )
