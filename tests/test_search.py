"""Search-path operator tests (SURVEY §2.5 Q2/Q4/Q5/Q8/Q9)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectordb_light_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
)
from vectordb_light_spark.operators.search import (
    SearchParams,
    topk_cosine,
    topk_cosine_batch,
)


def _vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], "alpha doc", "document"),
        (2, [0.0, 1.0, 0.0], "beta doc", "image"),
        (3, [1.0, 1.0, 0.0], "gamma DOC text", "document"),
        (4, [-1.0, 0.0, 0.0], "delta", "document"),
        (5, [0.6, 0.8, 0.0], "epsilon doc", "audio"),
    ]
    return spark.createDataFrame(
        rows, "id long, vector array<double>, text string, document_type string"
    )


def test_dot_and_norm(spark):
    df = spark.range(1).select(
        dot_product(F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(3.0), F.lit(4.0))).alias("d"),
        l2_norm(F.array(F.lit(3.0), F.lit(4.0))).alias("n"),
    )
    row = df.first()
    assert row["d"] == 11.0
    assert row["n"] == 5.0


def test_l2_normalize_unit_norm(spark):
    df = spark.range(1).select(
        l2_norm(l2_normalize(F.array(F.lit(3.0), F.lit(4.0)))).alias("n"),
        l2_norm(l2_normalize(F.array(F.lit(0.0), F.lit(0.0)))).alias("zero"),
    )
    row = df.first()
    assert math.isclose(row["n"], 1.0, rel_tol=1e-9)
    assert row["zero"] == 0.0  # zero vector stays zero, no NaN


def test_cosine_similarity_known_values(spark):
    df = spark.range(1).select(
        cosine_similarity(
            F.array(F.lit(1.0), F.lit(0.0)), F.array(F.lit(1.0), F.lit(1.0))
        ).alias("c")
    )
    assert math.isclose(df.first()["c"], 1 / math.sqrt(2), rel_tol=1e-9)


def test_topk_orders_by_similarity_with_tiebreak(spark):
    out = topk_cosine(
        _vecs(spark), [1.0, 0.0, 0.0], SearchParams(k=3, threshold=0.0)
    ).collect()
    # sims: id1=1.0, id3=.707, id5=.6, id2=0, id4=-1→clip 0
    assert [r["id"] for r in out] == [1, 3, 5]
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["similarity_score"] == 1.0


def test_threshold_applied_after_topk_shrinks_result(spark):
    # k=4 admits id2 (sim clipped to 0); threshold 0.5 then removes it
    # AND id5 (0.6 >= .5 stays) — result < k rows, ranks preserved.
    out = topk_cosine(
        _vecs(spark), [1.0, 0.0, 0.0], SearchParams(k=4, threshold=0.5)
    ).collect()
    assert [r["id"] for r in out] == [1, 3, 5]
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_search_term_filter_case_insensitive(spark):
    out = topk_cosine(
        _vecs(spark),
        [1.0, 0.0, 0.0],
        SearchParams(k=5, threshold=0.0, search_term="DoC"),
    ).collect()
    # id4 ("delta") is the only text without "doc"; id2/id4 tie at
    # sim 0 → id asc tiebreak puts id2 at rank 4.
    assert [r["id"] for r in out] == [1, 3, 5, 2]


def test_document_type_filter(spark):
    out = topk_cosine(
        _vecs(spark),
        [1.0, 0.0, 0.0],
        SearchParams(k=5, threshold=0.0, document_type="audio"),
    ).collect()
    assert [r["id"] for r in out] == [5]
    assert out[0]["rank"] == 3  # rank from the pre-filter top-k order


def test_clip_to_unit_interval(spark):
    out = topk_cosine(
        _vecs(spark), [-1.0, 0.0, 0.0], SearchParams(k=5, threshold=0.0)
    ).collect()
    by_id = {r["id"]: r["similarity_score"] for r in out}
    assert by_id[4] == 1.0
    assert by_id[1] == 0.0  # cos=-1 clipped to 0


def test_topk_batch_matches_single(spark):
    vecs = _vecs(spark)
    queries = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0])],
        "query_id long, query_vec array<double>",
    )
    out = topk_cosine_batch(vecs, queries, k=2)
    got = {
        (r["query_id"], r["rank"]): r["id"] for r in out.collect()
    }
    assert got[(10, 1)] == 1 and got[(10, 2)] == 3
    assert got[(11, 1)] == 2 and got[(11, 2)] == 5  # id5 [.6,.8,0] → sim .8


def test_topk_prefix_monotonicity(spark):
    """k' ≤ k ⇒ top-k' is a prefix of top-k (SURVEY §5 property)."""
    vecs = _vecs(spark)
    q = [0.3, 0.7, 0.1]
    big = [r["id"] for r in topk_cosine(vecs, q, SearchParams(k=5, threshold=0.0)).collect()]
    small = [r["id"] for r in topk_cosine(vecs, q, SearchParams(k=2, threshold=0.0)).collect()]
    assert big[:2] == small


# ---------------------------------------------------------------------------
# int8 quantized store
# ---------------------------------------------------------------------------


def test_quantized_roundtrip_error_and_recall(spark):
    import numpy as np

    from vectordb_light_spark.functions.vector import (
        dequantize_int8,
        quantize_int8,
    )
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine
    from vectordb_light_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    deq = emb.withColumn("dq", dequantize_int8(quantize_int8("embedding")))

    # element-wise error ≤ half a quantization step (0.5/127) for
    # in-range values
    row = deq.select("embedding", "dq").first()
    a, b = np.array(row.embedding, dtype=np.float64), np.array(row.dq)
    clipped = np.clip(a, -1.0, 1.0)
    assert float(np.max(np.abs(clipped - b))) <= 0.5 / 127 + 1e-12

    # storage type really is tinyint
    qt = emb.select(quantize_int8("embedding").alias("q")).schema["q"].dataType
    assert qt.simpleString() == "array<tinyint>"

    # top-10 recall vs the float store ≥ 0.8 for the same query
    q = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    exact = {
        r.vec_id
        for r in topk_cosine(
            emb, q, SearchParams(k=10, threshold=0.0),
            id_col="vec_id", vec_col="embedding",
        ).collect()
    }
    quant = {
        r.vec_id
        for r in topk_cosine(
            deq.drop("embedding").withColumnRenamed("dq", "embedding"),
            q, SearchParams(k=10, threshold=0.0),
            id_col="vec_id", vec_col="embedding",
        ).collect()
    }
    assert len(exact & quant) >= 8


def test_mean_pool_vectors_means_and_unit_norm(spark):
    """mean_pool_vectors: element-wise group means (verified against
    numpy) and L2-renormalization to unit norm."""
    import numpy as np

    from vectordb_light_spark.functions.vector import mean_pool_vectors

    rows = [
        ("a", [1.0, 0.0, 0.0]),
        ("a", [0.0, 1.0, 0.0]),
        ("b", [2.0, 2.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "g string, vector array<float>")
    got = {
        r["g"]: np.array(r["vec"])
        for r in mean_pool_vectors(df, "g", "vector", out_col="vec").collect()
    }
    expect_a = np.array([0.5, 0.5, 0.0])
    expect_a = expect_a / np.linalg.norm(expect_a)
    expect_b = np.array([2.0, 2.0, 1.0]) / 3.0
    expect_b = expect_b / np.linalg.norm(expect_b)
    assert np.allclose(got["a"], expect_a, atol=1e-9)
    assert np.allclose(got["b"], expect_b, atol=1e-9)
    for v in got.values():
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-9

    raw = {
        r["g"]: np.array(r["vec"])
        for r in mean_pool_vectors(
            df, "g", "vector", out_col="vec", normalize=False
        ).collect()
    }
    assert np.allclose(raw["a"], [0.5, 0.5, 0.0], atol=1e-9)


def test_vectordb_srp_index_and_ann_search(spark, tmp_path):
    """build_srp_index rewrites the store atomically with signatures;
    search(ann_radius=full) equals the exact search; a modest radius
    scans fewer rows (observe metrics prove the pruning) while the
    plane spec round-trips through _meta.json."""
    import json as _json
    import os as _os

    from vectordb_light_spark.engine import VectorDB
    from vectordb_light_spark.operators.ingest import IngestConfig, create_database
    from vectordb_light_spark.sources.extract import load_directory

    texts = [
        (f"doc{i}.txt", f"topic{i % 5} " * 40 + f"unique{i} filler " * 20)
        for i in range(12)
    ]
    src = tmp_path / "docs"
    src.mkdir()
    for name, body in texts:
        (src / name).write_text(body)
    db_root = str(tmp_path / "dbs")
    _os.makedirs(db_root)
    docs, _rejects = load_directory(spark, str(src))
    create_database(
        spark,
        docs,
        db_root,
        "annd",
        IngestConfig(chunk_size=200, chunk_overlap=50, target_files=1),
    )

    db = VectorDB.open(spark, db_root, "annd", cache=False)
    exact = [(r["id"], r["rank"]) for r in db.search("topic1 filler").collect()]

    db.build_srp_index(n_planes=16, seed=7)
    meta = _json.load(open(_os.path.join(db_root, "annd", "_meta.json")))
    assert meta["srp_index"] == {"n_planes": 16, "seed": 7}
    # the rebuild honors the open()-time cache policy (opened cache=False)
    assert not db.vectors.is_cached

    full = db.search("topic1 filler", ann_radius=16)
    assert [(r["id"], r["rank"]) for r in full.collect()] == exact
    n_full = db.last_search_stats["n_scanned"]

    pruned = db.search("topic1 filler", ann_radius=4)
    pruned.collect()
    assert db.last_search_stats["n_scanned"] < n_full

    with pytest.raises(ValueError):
        VectorDB.open(spark, db_root, "annd", cache=False).meta.pop("srp_index")
        bad = VectorDB.open(spark, db_root, "annd", cache=False)
        bad.vectors = bad.vectors.drop("srp_sig")
        bad.search("x", ann_radius=2)


def test_filtered_topk_pushes_predicate_to_scan(spark, tmp_path):
    """Pre-filter semantics: the label predicate reaches the parquet
    scan (PushedFilters), unlike the reference's post-top-k filters
    which must stay above the limit. Scans its own parquet COPY:
    Spark's cache manager substitutes any plan matching a cached one,
    so scanning the shared embeddings path would read the
    InMemoryRelation other tests cached and hide PushedFilters."""
    own = str(tmp_path / "emb_copy")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").write.parquet(own)
    emb = spark.read.parquet(own).where(F.col("label") == 3)
    df = topk_cosine(
        emb,
        [0.0] * 63 + [1.0],
        SearchParams(k=6, threshold=0.0, assume_normalized=True),
        id_col="vec_id",
        vec_col="embedding",
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan
    assert "EqualTo(label,3)" in plan.replace(" ", "")
    assert df.count() == 6  # pre-filter guarantees k survivors


def test_mean_pool_empty_input(spark):
    from vectordb_light_spark.functions.vector import mean_pool_vectors

    df = spark.createDataFrame([], "g string, vector array<float>")
    assert mean_pool_vectors(df, "g", "vector").count() == 0


def test_mmr_rerank_demotes_near_duplicates(spark):
    """With two near-identical top hits, plain top-k returns both
    back-to-back; MMR picks one, then a diverse hit."""
    import numpy as np

    from vectordb_light_spark.operators.search import mmr_rerank

    def unit(v):
        a = np.asarray(v, dtype=float)
        return (a / np.linalg.norm(a)).tolist()

    rows = [
        (1, unit([0.95, 0.31, 0.0])),    # best match
        (2, unit([0.95, 0.31, 0.02])),   # near-dup of 1
        (3, unit([0.90, -0.44, 0.0])),   # diverse, still relevant
        (4, unit([0.0, 1.0, 0.0])),      # off-topic
    ]
    pool = spark.createDataFrame(rows, "id long, vector array<double>")
    q = [1.0, 0.0, 0.0]

    out = mmr_rerank(pool, q, k=3, lam=0.5).collect()
    # plain relevance would give [1, 2, 3]; MMR demotes the near-dup
    # below the diverse hit
    assert [r["id"] for r in out] == [1, 3, 2]
    assert [r["mmr_rank"] for r in out] == [1, 2, 3]

    # lam=1 degrades to pure relevance order
    pure = mmr_rerank(pool, q, k=3, lam=1.0).collect()
    assert [r["id"] for r in pure] == [1, 2, 3]

    # empty pool → empty result, stable schema
    empty = mmr_rerank(pool.where("id > 99"), q, k=3)
    assert empty.count() == 0
    assert "mmr_rank" in empty.columns


def test_vectordb_search_diverse_end_to_end(spark, tmp_path):
    """Facade MMR path over a built DB: rank-ordered, ≤k rows, text
    late-materialized, and the rank-1 hit equals plain search's."""
    import os as _os

    from vectordb_light_spark.engine import VectorDB
    from vectordb_light_spark.operators.ingest import IngestConfig, create_database
    from vectordb_light_spark.sources.extract import load_directory

    src = tmp_path / "docs"
    src.mkdir()
    for i in range(8):
        (src / f"d{i}.txt").write_text(f"subject{i % 4} body " * 30)
    db_root = str(tmp_path / "dbs")
    _os.makedirs(db_root)
    docs, _ = load_directory(spark, str(src))
    create_database(
        spark, docs, db_root, "mmrd",
        IngestConfig(chunk_size=150, chunk_overlap=30, target_files=1),
    )
    db = VectorDB.open(spark, db_root, "mmrd", cache=False)

    out = db.search_diverse("subject1 body", k=4, fetch_k=12).collect()
    assert 0 < len(out) <= 4
    assert [r["mmr_rank"] for r in out] == list(range(1, len(out) + 1))
    assert all(r["text"] for r in out)
    top_plain = db.search("subject1 body", params=SearchParams(k=1, threshold=0.0))
    assert out[0]["id"] == top_plain.first()["id"]


def test_vectordb_pq_index_and_batch_search(spark, tmp_path):
    """build_pq_index persists codebooks + code column atomically;
    search_pq with exact re-rank reproduces the exact top-k on a
    small store; search_batch equals per-query search."""
    import os as _os

    from vectordb_light_spark.engine import VectorDB
    from vectordb_light_spark.operators.ingest import IngestConfig, create_database
    from vectordb_light_spark.sources.extract import load_directory

    src = tmp_path / "docs"
    src.mkdir()
    for i in range(10):
        (src / f"d{i}.txt").write_text(f"theme{i % 4} body " * 30 + f"tail{i} " * 10)
    db_root = str(tmp_path / "dbs")
    _os.makedirs(db_root)
    docs, _ = load_directory(spark, str(src))
    create_database(
        spark, docs, db_root, "pqd",
        IngestConfig(chunk_size=150, chunk_overlap=30, target_files=1),
    )
    db = VectorDB.open(spark, db_root, "pqd", cache=False)

    exact = [(r["id"], r["rank"]) for r in db.search("theme2 body").collect()]

    db.build_pq_index(m=8, n_codes=16)
    assert db.meta["pq_index"] == {"m": 8, "n_codes": 16}
    assert "pq_code" in db.vectors.columns
    assert _os.path.exists(_os.path.join(db_root, "pqd", "_index", "pq_codebooks.npy"))

    # re-rank pool covering the whole tiny store ⇒ exact agreement
    # (ann_topk_pq emits (id, similarity_score) rank-ordered, no rank col)
    pq_ids = [r["id"] for r in db.search_pq("theme2 body", k=6, rerank_pool=1000).collect()]
    assert pq_ids == [i for i, _ in exact]

    # batch search: one scan, per-query results equal the single path
    batch = db.search_batch(["theme2 body", "theme0 body"], k=6)
    by_q: dict[int, list] = {}
    for r in batch.collect():
        by_q.setdefault(r["query_id"], []).append((r["id"], r["rank"]))
    assert sorted(by_q) == [0, 1]
    assert sorted(by_q[0]) == sorted(exact)
    exact_q1 = [(r["id"], r["rank"]) for r in db.search("theme0 body").collect()]
    assert sorted(by_q[1]) == sorted(exact_q1)


def test_range_search_radius_semantics(spark):
    from vectordb_light_spark.operators.search import range_search

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.8, 0.6]),   # cos 0.8
            (3, [0.0, 1.0]),   # cos 0.0
            (4, [-1.0, 0.0]),  # cos -1 → clipped 0
        ],
        "id long, vector array<double>",
    )
    out = range_search(df, [1.0, 0.0], radius=0.5, assume_normalized=True)
    rows = out.collect()
    assert [r["id"] for r in rows] == [1, 2]  # ordered by score desc
    assert rows[0]["similarity_score"] == 1.0
    assert abs(rows[1]["similarity_score"] - 0.8) < 1e-9
    # radius 0 admits the clipped-to-zero vectors too — no k truncation
    assert {r["id"] for r in range_search(
        df, [1.0, 0.0], radius=0.0, assume_normalized=True).collect()} == {1, 2, 3, 4}


def test_vectordb_ivf_index_and_partition_pruned_search(spark, tmp_path):
    """build_ivf_index rewrites the store partitioned by cluster and
    persists centroids; search_ivf at full probe reproduces the exact
    top-k; a 1-probe search reads only that cluster's rows."""
    import os as _os

    from vectordb_light_spark.engine import VectorDB
    from vectordb_light_spark.operators.ingest import IngestConfig, create_database
    from vectordb_light_spark.sources.extract import load_directory

    src = tmp_path / "docs"
    src.mkdir()
    for i in range(12):
        (src / f"d{i}.txt").write_text(f"theme{i % 3} body " * 30 + f"tail{i} " * 10)
    db_root = str(tmp_path / "dbs")
    _os.makedirs(db_root)
    docs, _ = load_directory(spark, str(src))
    create_database(
        spark, docs, db_root, "ivfd",
        IngestConfig(chunk_size=150, chunk_overlap=30, target_files=1),
    )
    db = VectorDB.open(spark, db_root, "ivfd", cache=False)

    exact = [r["id"] for r in db.search("theme1 body").collect()]

    db.build_ivf_index(n_centroids=4)
    assert db.meta["ivf_index"] == {"n_centroids": 4}
    assert "ivf_cluster" in db.vectors.columns
    assert _os.path.exists(
        _os.path.join(db_root, "ivfd", "_index", "ivf_centroids.npy")
    )
    # the store is physically partitioned by cluster
    parts = [
        d for d in _os.listdir(_os.path.join(db_root, "ivfd", "vectors"))
        if d.startswith("ivf_cluster=")
    ]
    assert len(parts) >= 2

    # full probe degenerates to the exact scan
    full = [r["id"] for r in db.search_ivf("theme1 body", k=6, nprobe=4).collect()]
    assert full == exact

    # nprobe=1 scans a strict subset of rows
    one = db.search_ivf("theme1 body", k=6, nprobe=1)
    assert 0 < one.count() <= len(full)


def test_index_builds_compose_without_clobbering_artifacts(spark, tmp_path):
    """pq-index then ivf-index on the same DB must keep BOTH artifact
    files and both search paths working (save_index_artifacts merges,
    never replaces, the _index/ directory)."""
    import os as _os

    from vectordb_light_spark.engine import VectorDB
    from vectordb_light_spark.operators.ingest import (
        IngestConfig,
        create_database,
        load_index_artifacts,
    )
    from vectordb_light_spark.sources.extract import load_directory

    src = tmp_path / "docs"
    src.mkdir()
    for i in range(8):
        (src / f"d{i}.txt").write_text(f"theme{i % 2} words " * 40)
    db_root = str(tmp_path / "dbs")
    _os.makedirs(db_root)
    docs, _ = load_directory(spark, str(src))
    create_database(
        spark, docs, db_root, "both",
        IngestConfig(chunk_size=150, chunk_overlap=30, target_files=1),
    )
    db = VectorDB.open(spark, db_root, "both", cache=False)
    db.build_pq_index(m=8, n_codes=16)
    db.build_ivf_index(n_centroids=2)
    arts = load_index_artifacts(db.path)
    assert {"pq_codebooks", "ivf_centroids"} <= set(arts)
    assert db.search_pq("theme1 words", k=3, rerank_pool=100).count() > 0
    assert db.search_ivf("theme1 words", k=3, nprobe=2).count() > 0
    # index-implementation columns never leak into result schemas
    for out in (
        db.search("theme1 words"),
        db.search_ivf("theme1 words", k=3, nprobe=2),
    ):
        assert not ({"pq_code", "ivf_cluster", "srp_sig"} & set(out.columns))


def test_open_recovers_from_interrupted_index_swap(spark, tmp_path):
    """A crash between the two swap renames leaves vectors.<tier>-old
    and no vectors/ — open() must restore the original store."""
    import os as _os
    import shutil as _shutil

    from vectordb_light_spark.engine import VectorDB
    from vectordb_light_spark.operators.ingest import IngestConfig, create_database
    from vectordb_light_spark.sources.extract import load_directory

    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.txt").write_text("recoverable content " * 40)
    db_root = str(tmp_path / "dbs")
    _os.makedirs(db_root)
    docs, _ = load_directory(spark, str(src))
    create_database(
        spark, docs, db_root, "crashy",
        IngestConfig(chunk_size=150, chunk_overlap=30, target_files=1),
    )
    db_path = _os.path.join(db_root, "crashy")
    n_before = spark.read.parquet(_os.path.join(db_path, "vectors")).count()
    # simulate the crash window: first rename done, second never ran
    _os.rename(
        _os.path.join(db_path, "vectors"),
        _os.path.join(db_path, "vectors.ivf-old"),
    )
    db = VectorDB.open(spark, db_root, "crashy", cache=False)
    assert db.vectors.count() == n_before
    assert _os.path.isdir(_os.path.join(db_path, "vectors"))
    assert not _os.path.isdir(_os.path.join(db_path, "vectors.ivf-old"))
    _shutil.rmtree(db_path)


def test_open_compound_crash_restores_newest_old(spark, tmp_path):
    """With vectors/ missing and TWO stale -old dirs, open() must
    restore the most recently modified one (a fixed tier order could
    resurrect a pre-build snapshot and lose rows); with vectors/
    intact, leftover -old/-tmp dirs are garbage-collected."""
    import os as _os
    import shutil as _shutil
    import time as _time

    from vectordb_light_spark.engine import VectorDB
    from vectordb_light_spark.operators.ingest import IngestConfig, create_database
    from vectordb_light_spark.sources.extract import load_directory

    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.txt").write_text("compound crash content " * 40)
    db_root = str(tmp_path / "dbs")
    _os.makedirs(db_root)
    docs, _ = load_directory(spark, str(src))
    create_database(
        spark, docs, db_root, "cc",
        IngestConfig(chunk_size=150, chunk_overlap=30, target_files=1),
    )
    db_path = _os.path.join(db_root, "cc")
    vec = _os.path.join(db_path, "vectors")
    # stale pq-old (older) vs current ivf-old (newer), vectors missing
    _shutil.copytree(vec, vec + ".pq-old")
    _time.sleep(0.05)
    _os.rename(vec, vec + ".ivf-old")
    _os.utime(vec + ".ivf-old")
    db = VectorDB.open(spark, db_root, "cc", cache=False)
    assert db.vectors.count() > 0
    assert not _os.path.exists(vec + ".pq-old")
    assert not _os.path.exists(vec + ".ivf-old")
    # vectors intact + garbage dirs → cleaned on open
    _os.makedirs(vec + ".srp-tmp")
    VectorDB.open(spark, db_root, "cc", cache=False)
    assert not _os.path.exists(vec + ".srp-tmp")


def test_open_rolls_back_staged_artifacts_on_interrupted_rebuild(spark, tmp_path):
    """A crash AFTER the vectors swap but BEFORE the artifact commit
    (or mid-commit) must roll back to the matching pre-build snapshot:
    old vectors AND old _index together — never new centroids beside
    old cluster assignments (ADVICE r2: silent near-zero-recall)."""
    import json as _json
    import os as _os
    import shutil as _shutil

    import numpy as np

    from vectordb_light_spark.engine import VectorDB
    from vectordb_light_spark.operators.ingest import (
        IngestConfig,
        create_database,
        load_index_artifacts,
        stage_index_artifacts,
    )
    from vectordb_light_spark.sources.extract import load_directory

    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.txt").write_text("staged artifact rollback content " * 40)
    db_root = str(tmp_path / "dbs")
    _os.makedirs(db_root)
    docs, _ = load_directory(spark, str(src))
    create_database(
        spark, docs, db_root, "stagey",
        IngestConfig(chunk_size=150, chunk_overlap=30, target_files=1),
    )
    db_path = _os.path.join(db_root, "stagey")
    db = VectorDB.open(spark, db_root, "stagey", cache=False)
    db.build_ivf_index(n_centroids=2)
    old_centroids = load_index_artifacts(db_path)["ivf_centroids"].copy()
    n_before = spark.read.parquet(_os.path.join(db_path, "vectors")).count()

    # simulate: rebuild trained NEW centroids, staged them, swapped
    # vectors, then crashed before commit_index_artifacts
    stage_index_artifacts(db_path, {"ivf_centroids": old_centroids + 99.0})
    vec = _os.path.join(db_path, "vectors")
    _shutil.copytree(vec, vec + ".ivf-old")
    _os.utime(vec + ".ivf-old")
    db2 = VectorDB.open(spark, db_root, "stagey", cache=False)
    assert db2.vectors.count() == n_before
    assert not _os.path.isdir(_os.path.join(db_path, "_index.tmp"))
    np.testing.assert_array_equal(
        load_index_artifacts(db_path)["ivf_centroids"], old_centroids
    )

    # simulate: crash MID-commit (_index renamed aside, tmp promoted)
    stage_index_artifacts(db_path, {"ivf_centroids": old_centroids + 99.0})
    _shutil.copytree(vec, vec + ".ivf-old")
    _os.utime(vec + ".ivf-old")
    _os.rename(
        _os.path.join(db_path, "_index"), _os.path.join(db_path, "_index.old")
    )
    _os.rename(
        _os.path.join(db_path, "_index.tmp"), _os.path.join(db_path, "_index")
    )
    db3 = VectorDB.open(spark, db_root, "stagey", cache=False)
    assert db3.vectors.count() == n_before
    np.testing.assert_array_equal(
        load_index_artifacts(db_path)["ivf_centroids"], old_centroids
    )
    # meta was never rewritten by the crashed rebuild
    with open(_os.path.join(db_path, "_meta.json")) as f:
        assert _json.load(f)["ivf_index"]["n_centroids"] == 2
    _shutil.rmtree(db_path)


def test_open_rolls_back_standalone_artifact_commit_crash(spark, tmp_path):
    """A standalone save_index_artifacts (no vectors swap in flight)
    that crashes BETWEEN its two renames leaves _index.old as the ONLY
    surviving artifact copy (_index missing, _index.tmp staged).
    open()'s no-vectors-old branch must roll _index.old back, not
    garbage-collect it — deleting it would leave _meta.json advertising
    an index whose artifacts are gone (ADVICE r3)."""
    import os as _os
    import shutil as _shutil

    import numpy as np

    from vectordb_light_spark.engine import VectorDB
    from vectordb_light_spark.operators.ingest import (
        IngestConfig,
        create_database,
        load_index_artifacts,
        stage_index_artifacts,
    )
    from vectordb_light_spark.sources.extract import load_directory

    src = tmp_path / "docs"
    src.mkdir()
    (src / "a.txt").write_text("standalone artifact crash content " * 40)
    db_root = str(tmp_path / "dbs")
    _os.makedirs(db_root)
    docs, _ = load_directory(spark, str(src))
    create_database(
        spark, docs, db_root, "solo",
        IngestConfig(chunk_size=150, chunk_overlap=30, target_files=1),
    )
    db_path = _os.path.join(db_root, "solo")
    db = VectorDB.open(spark, db_root, "solo", cache=False)
    db.build_ivf_index(n_centroids=2)
    old_centroids = load_index_artifacts(db_path)["ivf_centroids"].copy()

    # simulate save_index_artifacts crashing between its two renames:
    # stage new artifacts, rename _index aside, never promote the tmp
    stage_index_artifacts(db_path, {"ivf_centroids": old_centroids + 99.0})
    _os.rename(
        _os.path.join(db_path, "_index"), _os.path.join(db_path, "_index.old")
    )
    assert not _os.path.isdir(_os.path.join(db_path, "_index"))
    VectorDB.open(spark, db_root, "solo", cache=False)
    assert _os.path.isdir(_os.path.join(db_path, "_index"))
    assert not _os.path.isdir(_os.path.join(db_path, "_index.old"))
    assert not _os.path.isdir(_os.path.join(db_path, "_index.tmp"))
    np.testing.assert_array_equal(
        load_index_artifacts(db_path)["ivf_centroids"], old_centroids
    )
    _shutil.rmtree(db_path)


def test_topk_contract_flipped_matches_v1(spark):
    """The staged r9 contract rewrite (flipped membership, no
    corpus-id broadcast) must be byte-identical to the v1 projection the three
    gradable entries still run — the equivalence that lets r9 flip
    the call sites spending only the grading slots, not re-design."""
    from vectordb_light_spark.functions.embedding import (
        HashingEmbedder,
        embed_documents,
    )
    from vectordb_light_spark.operators.search import SearchParams, topk_cosine
    from vectordb_light_spark.queries import (
        _topk_contract,
        _topk_contract_flipped,
        load_docs,
    )

    docs = load_docs(spark, "/root/testdata/sf0.001", "doc_id", "text")
    embedded = embed_documents(
        docs, {"encoder": "hashing", "dim": 64, "seed": 0}
    ).drop("text")
    qtext = docs.where(F.col("doc_id") == 0).select("text").first()[0]
    q = [float(x) for x in HashingEmbedder(dim=64, seed=0).encode([qtext])[0]]
    out = topk_cosine(
        embedded,
        q,
        SearchParams(k=10, threshold=0.0, assume_normalized=True),
        id_col="doc_id",
        vec_col="vector",
    )
    v1 = [r.asDict() for r in _topk_contract(embedded, out).collect()]
    v2 = [r.asDict() for r in _topk_contract_flipped(embedded, out).collect()]
    assert v1 == v2
    assert len(v1) == 10 and all(r["in_pool"] == 1 for r in v1)


def test_topk_contract_flipped_robust_to_duplicate_ids(spark):
    """A malformed top-k that repeats a doc_id at two ranks must not
    inflate the flipped contract's n_docs/n_bad_norms through join
    multiplication — the contract exists to FLAG broken plans, so it
    must stay v1-identical exactly there (r8 review finding)."""
    from vectordb_light_spark.queries import (
        _topk_contract,
        _topk_contract_flipped,
    )

    embedded = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(50)],
        "doc_id long, vector array<double>",
    )
    # doc 0 appears at ranks 1 AND 2; rank 3 points outside the pool
    out = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 0.9), (999, 3, 0.8)],
        "doc_id long, rank int, similarity_score double",
    )
    v1 = [r.asDict() for r in _topk_contract(embedded, out).collect()]
    v2 = [
        r.asDict() for r in _topk_contract_flipped(embedded, out).collect()
    ]
    assert v1 == v2
    assert [r["n_docs"] for r in v2] == [50, 50, 50]
    assert [r["in_pool"] for r in v2] == [1, 1, 0]


def test_topk_contract_flipped_duplicate_rank_mixed_membership(spark):
    """ADVICE r8: collecting matched RANKS let a malformed top-k that
    emits rank 2 twice — once for an in-pool id, once for an
    out-of-pool id — read in_pool [1,1,1] where v1 reads [1,1,0].
    The id-membership form must stay v1-identical on exactly this
    input. A NULL id row must also read in_pool 0, like v1's
    left-join + coalesce."""
    from vectordb_light_spark.queries import (
        _topk_contract,
        _topk_contract_flipped,
    )

    embedded = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(50)],
        "doc_id long, vector array<double>",
    )
    # rank 2 appears twice: doc 7 (in pool) and doc 999 (not); plus a
    # NULL-id row at rank 4
    out = spark.createDataFrame(
        [(0, 1, 1.0), (7, 2, 0.9), (999, 2, 0.9), (None, 4, 0.7)],
        "doc_id long, rank int, similarity_score double",
    )
    v1 = sorted(
        (r.asDict() for r in _topk_contract(embedded, out).collect()),
        key=lambda r: (r["rank"], r["in_pool"]),
    )
    v2 = sorted(
        (
            r.asDict()
            for r in _topk_contract_flipped(embedded, out).collect()
        ),
        key=lambda r: (r["rank"], r["in_pool"]),
    )
    assert v1 == v2
    assert [r["in_pool"] for r in v2] == [1, 0, 1, 0]
    assert all(r["n_docs"] == 50 for r in v2)


def test_topk_contract_flipped_matches_v1_on_random_malformed_frames(spark):
    """Seeded randomized equivalence: six corpora of malformed top-k
    frames — duplicate ids, duplicate ranks, out-of-pool ids, NULL
    ids, empty out — must read byte-identical between v1 and the
    flipped contract. The three hand-written shapes above pin the
    known failure modes; this sweep guards the ones nobody thought
    of."""
    import random

    from vectordb_light_spark.queries import (
        _topk_contract,
        _topk_contract_flipped,
    )

    embedded = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(40)],
        "doc_id long, vector array<double>",
    )
    for seed in range(6):
        rng = random.Random(seed)
        n = rng.randint(0, 8)
        rows = []
        for r in range(1, n + 1):
            doc = rng.choice([rng.randrange(40), 998 + rng.randrange(3), None])
            rank = rng.choice([r, max(1, r - 1)])  # occasional dup rank
            rows.append((doc, rank, round(1.0 - 0.05 * r, 3)))
        out = spark.createDataFrame(
            rows, "doc_id long, rank int, similarity_score double"
        )
        key = lambda d: (d["rank"], d["in_pool"], str(d))
        v1 = sorted(
            (r.asDict() for r in _topk_contract(embedded, out).collect()),
            key=key,
        )
        v2 = sorted(
            (
                r.asDict()
                for r in _topk_contract_flipped(embedded, out).collect()
            ),
            key=key,
        )
        assert v1 == v2, f"seed {seed}: {v1} != {v2}"
