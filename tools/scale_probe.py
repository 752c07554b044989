"""Scaling probe: replicate the sf0.1 tables 4x/16x into /tmp and
measure key operators at each scale (steady-state: best of 2 after a
warm-up). Writes the table printed at the end into SCALING.md when run
with --write.

Replication offsets ids per copy so dedup/join keys stay distinct;
the replicated write produces multiple files, giving the scans the
multi-partition layout a real corpus would have.

    python tools/scale_probe.py [--write]
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_light_spark.session import get_spark, load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/scale_probe"
SCALES = (1, 4, 16)


def replicate(spark, table: str, id_col: str, factor: int, out: str) -> None:
    df = load_table(spark, BASE, table)
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000)) for i in range(factor)
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    union.repartition(max(4, factor * 2)).write.mode("overwrite").parquet(out)


def replicate_unique(spark, factor: int, out: str) -> None:
    """Documents replicated with a PER-COPY text perturbation, so
    duplicate clusters keep their base size instead of gaining
    factor-many exact copies — the realistic bounded-cluster-density
    protocol. True duplicate pairs grow linearly in the factor here,
    isolating engine scaling from the adversarial protocol's
    quadratic pair growth (see the NOTE under the main table)."""
    df = load_table(spark, BASE, "documents").select("doc_id", "text")
    # Rewrite every word boundary with a per-copy token: copy i of a
    # doc shares ~no shingles with copy j (cross-copy Jaccard ≈ 0),
    # while two base docs that were near-dups of each other remain
    # near-dups WITHIN each copy — per-copy duplicate density equals
    # the base corpus'.
    parts = [
        df.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        .withColumn("text", F.regexp_replace("text", " ", f" v{i}x "))
        for i in range(factor)
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    # ≥32 output files at every factor: the probe compares DATA
    # scaling, so every point gets full local[32] map parallelism
    # (at 4 files the x1 point measures task-count starvation, not
    # the operator).
    union.repartition(max(32, factor * 2)).write.mode("overwrite").parquet(out)


def clusters_probe(docs):
    from vectordb_light_spark.operators.components import duplicate_clusters
    from vectordb_light_spark.operators.dedup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(docs).where(F.col("est_jaccard") >= 0.75)
    return duplicate_clusters(pairs, left_id="id_a", right_id="id_b").count()


def probes(spark, docs, emb):
    """name -> thunk returning a materialized count. Operators chosen
    to cover the main cost classes: pandas-UDF text stage, LSH
    candidate join, batch vector search, exact pair matmul."""
    from vectordb_light_spark.functions.text import make_winnow_udf
    from vectordb_light_spark.operators.dedup import (
        canonical_text,
        minhash_lsh_candidates,
    )
    from vectordb_light_spark.operators.search import topk_cosine_batch
    from vectordb_light_spark.operators.similarity import cosine_pairs_exact

    winnow = make_winnow_udf()

    def p_winnow():
        canon = docs.select("doc_id", canonical_text("text").alias("t")).where(
            F.length("t") > 0
        )
        return canon.select(F.size(winnow(F.col("t"))).alias("n")).agg(
            F.sum("n")
        ).collect()[0][0]

    def p_minhash():
        return minhash_lsh_candidates(docs).count()

    def p_batch_topk():
        queries = emb.where(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return topk_cosine_batch(
            emb, queries, k=5, threshold=0.0,
            id_col="vec_id", vec_col="embedding", assume_normalized=False,
        ).count()

    def p_batch_topk_1000q():
        # 10x the query batch on the same store: ONE scan still serves
        # all queries — wall time should grow far sublinearly vs 100q
        queries = emb.where(F.col("vec_id") < 1000).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return topk_cosine_batch(
            emb, queries, k=5, threshold=0.0,
            id_col="vec_id", vec_col="embedding", assume_normalized=False,
        ).count()

    def p_pairs_exact():
        return cosine_pairs_exact(
            emb, id_col="vec_id", vec_col="embedding", threshold=0.95,
            assume_normalized=False,
        ).count()

    def p_bm25():
        from vectordb_light_spark.operators.keyword import bm25_topk

        return bm25_topk(docs, ["spark", "vector", "stream"], k=10).count()

    def p_pq_adc():
        from vectordb_light_spark.operators.similarity import (
            add_pq_codes,
            ann_topk_pq,
            train_pq_codebooks,
        )

        books = train_pq_codebooks(emb, m=16, n_codes=64, max_train=5_000)
        q = [float(x) for x in emb.select("embedding").first()[0]]
        return ann_topk_pq(add_pq_codes(emb, books), books, q, k=10).count()

    def p_mean_pool():
        from vectordb_light_spark.functions.vector import mean_pool_vectors

        g = emb.select(F.pmod("vec_id", F.lit(64)).alias("g"), "embedding")
        return mean_pool_vectors(g, "g", "embedding").count()

    def p_containment():
        from vectordb_light_spark.operators.dedup import containment_pairs

        return containment_pairs(docs, threshold=0.2, max_df=20).count()

    def p_bigram_lm():
        from vectordb_light_spark.operators.profiling import bigram_lm_scores

        return bigram_lm_scores(docs).count()

    def p_decontaminate():
        from vectordb_light_spark.operators.dedup import ngram_contamination

        bench = docs.where(F.col("doc_id") % 997 == 0)  # ~0.1% eval slice
        return ngram_contamination(docs, bench, n=4).count()

    def p_pii_scrub():
        from vectordb_light_spark.functions.text import scrub_pii

        return (
            docs.select(F.length(scrub_pii("text")).alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )

    def p_boilerplate():
        from vectordb_light_spark.operators.dedup import remove_boilerplate

        return remove_boilerplate(
            docs.select("doc_id", "text"), sep=" ", min_docs=docs.count() * 3 // 4
        ).count()

    def p_vocab():
        from vectordb_light_spark.operators.profiling import vocab_topk

        return vocab_topk(docs, k=50, min_count=2).count()

    def p_clusters():
        return clusters_probe(docs)

    def p_range_search():
        from vectordb_light_spark.operators.search import range_search

        q = [float(x) for x in emb.select("embedding").first()[0]]
        return range_search(
            emb, q, radius=0.25, id_col="vec_id", vec_col="embedding"
        ).count()

    return {
        "winnow_fingerprints": p_winnow,
        "minhash_lsh_candidates": p_minhash,
        "batch_topk_100q": p_batch_topk,
        "batch_topk_1000q": p_batch_topk_1000q,
        "cosine_pairs_exact": p_pairs_exact,
        "bm25_topk": p_bm25,
        "pq_train_encode_adc_topk": p_pq_adc,
        "mean_pool_64groups": p_mean_pool,
        "containment_pairs": p_containment,
        "bigram_lm_scores": p_bigram_lm,
        "ngram_decontaminate": p_decontaminate,
        "pii_scrub": p_pii_scrub,
        "remove_boilerplate": p_boilerplate,
        "vocab_topk": p_vocab,
        "duplicate_clusters_e2e": p_clusters,
        "range_search": p_range_search,
    }


def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[int, float]] = {}
    rows: dict[int, dict[str, int]] = {}
    try:
        for factor in SCALES:
            d_docs = os.path.join(WORK, f"docs_x{factor}")
            d_emb = os.path.join(WORK, f"emb_x{factor}")
            replicate(spark, "documents", "doc_id", factor, d_docs)
            replicate(spark, "embeddings", "vec_id", factor, d_emb)
            docs = spark.read.parquet(d_docs).select("doc_id", "text")
            emb = spark.read.parquet(d_emb)
            rows[factor] = {"docs": docs.count(), "vectors": emb.count()}
            for name, fn in probes(spark, docs, emb).items():
                fn()  # warm-up
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    fn()
                    best = min(best, time.time() - t0)
                results.setdefault(name, {})[factor] = round(best, 2)
                print(f"x{factor} {name}: {results[name][factor]}s", flush=True)
    finally:
        shutil.rmtree(WORK, ignore_errors=True)

    lines = [
        "# SCALING — measured operator scaling on replicated sf0.1",
        "",
        "Generated by `python tools/scale_probe.py --write` "
        "(steady-state best-of-2 after warm-up, local[32]).",
        "",
        "| probe | " + " | ".join(f"x{f} ({rows[f]['docs']} docs / {rows[f]['vectors']} vecs)" for f in SCALES) + " |",
        "|---|" + "---|" * len(SCALES),
    ]
    for name, by_scale in results.items():
        lines.append(
            f"| {name} | " + " | ".join(f"{by_scale[f]}s" for f in SCALES) + " |"
        )
    lines += [
        "",
        "Reading: winnow / batch-top-k are data-linear (per-row stages and one",
        "scan per query batch). minhash candidate joins scale with candidate",
        "count (near-linear here; duplicate clusters share band keys BY",
        "construction, so buckets above DEFAULT_MAX_BUCKET collapse to",
        "signature-group stars — the cap that bounds the worst task).",
        "cosine_pairs_exact is O(N·M) by construction — its curve is the",
        "argument for the LSH tiers past broadcast reach (similarity.py).",
        "bm25_topk is data-linear: the matched-postings shuffle grows with",
        "corpus size but the per-row work is all codegen builtins.",
        "pq_train_encode_adc_topk is data-linear with a constant training",
        "term (the codebook sample is capped); the scan cost is the encode",
        "UDF — the ADC ranking itself reads 16 bytes/vector. mean_pool is",
        "data-linear: map-side partial sums keep the exchange at",
        "(groups × dim) partials regardless of row count. containment's",
        "df-capped posting self-join and the bigram-LM's vocabulary-sized",
        "model joins both grow with postings, not with postings², which",
        "is what their curves should show. vocab_topk is the canonical",
        "map-side-combine count (exchange carries vocabulary-sized",
        "partials); range_search is scan-linear with zero data-sized",
        "shuffle. duplicate_clusters_e2e = minhash candidates + iterative",
        "min-label CC; NOTE the replication protocol is adversarial for this",
        "probe: every doc gains factor-many exact copies, so true duplicate",
        "PAIRS grow ~quadratically in the factor (x16 carries ~16x the pairs",
        "per doc of x4) — wall grows SUBlinearly vs that pair count, and CC",
        "rounds stay at the (scale-invariant) cluster diameter. On a real",
        "corpus pair density is roughly scale-free and the curve follows the",
        "candidate join.",
    ]
    out = "\n".join(lines)
    print(out)
    if "--write" in sys.argv:
        # Preserve every probe-owned section — a base-table refresh
        # must not silently drop any of them.
        p = Path(__file__).resolve().parent.parent / "SCALING.md"
        tail = ""
        if p.exists():
            txt = p.read_text()
            idxs = [txt.find(m) for m in _all_markers() if txt.find(m) >= 0]
            if idxs:
                tail = txt[min(idxs):]
        p.write_text(out + "\n" + tail)


#: All section markers, in canonical document order. _write_section
#: replaces exactly one section and preserves every other, so
#: re-running any probe with --write never drops another probe's
#: measurements.
def _all_markers():
    return (BIG_MARKER, CLUSTERS_MARKER, CAPPED_MARKER, HH_MARKER)


def _write_section(marker: str, out: str) -> None:
    p = Path(__file__).resolve().parent.parent / "SCALING.md"
    txt = p.read_text() if p.exists() else ""
    if marker in txt:
        head, rest = txt.split(marker, 1)
        idxs = [
            rest.find(m)
            for m in _all_markers()
            if m != marker and rest.find(m) >= 0
        ]
        tail = rest[min(idxs):] if idxs else ""
        txt = head.rstrip("\n") + "\n" + out + "\n" + tail
    else:
        txt = txt.rstrip("\n") + "\n" + out + "\n"
    p.write_text(txt)


#: Section marker owned by main_big in SCALING.md (main preserves it,
#: main_big replaces its own previous section instead of appending).
BIG_MARKER = "\n## x64 point"

#: Probes with data-linear plans — the only ones worth paying an x64
#: replication for (the pairwise/clustering probes' x64 cost is
#: dominated by the adversarial-replication pair blow-up, not plan
#: behavior).
BIG_PROBES = (
    "winnow_fingerprints",
    "batch_topk_100q",
    "batch_topk_1000q",
    "bm25_topk",
    "mean_pool_64groups",
    "pii_scrub",
    "vocab_topk",
    "range_search",
)


def main_big(factor: int = 64) -> None:
    """One extra scale point (default x64 = 320k docs / 128k vectors)
    for the linear probes; appends a section to SCALING.md with
    --write."""
    spark = get_spark("scale-probe-big")
    spark.sparkContext.setLogLevel("ERROR")
    d_docs = os.path.join(WORK, f"docs_x{factor}")
    d_emb = os.path.join(WORK, f"emb_x{factor}")
    try:
        replicate(spark, "documents", "doc_id", factor, d_docs)
        replicate(spark, "embeddings", "vec_id", factor, d_emb)
        docs = spark.read.parquet(d_docs).select("doc_id", "text")
        emb = spark.read.parquet(d_emb)
        n_docs, n_vecs = docs.count(), emb.count()
        all_probes = probes(spark, docs, emb)
        lines = [
            "",
            f"## x{factor} point ({n_docs} docs / {n_vecs} vectors) — linear probes",
            "",
            "| probe | wall |",
            "|---|---|",
        ]
        for name in BIG_PROBES:
            fn = all_probes[name]
            fn()  # warm-up
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            lines.append(f"| {name} | {round(best, 2)}s |")
            print(f"x{factor} {name}: {round(best, 2)}s", flush=True)
        lines += [
            "",
            f"Same plans as the x1-x16 table at {factor}x the base rows: the",
            "linear probes' wall should track data volume (task count times",
            "per-row codegen/Arrow cost), confirming no hidden super-linear",
            "stage appears past the x16 point.",
        ]
        out = "\n".join(lines)
        print(out)
        if "--write" in sys.argv:
            _write_section(BIG_MARKER, out)
    finally:
        shutil.rmtree(WORK, ignore_errors=True)


#: Section marker owned by main_clusters in SCALING.md.
CLUSTERS_MARKER = "\n## duplicate_clusters on bounded-cluster replication"


def main_clusters() -> None:
    """The realistic-density clusters curve: duplicate_clusters_e2e
    over ``replicate_unique`` data (per-copy text perturbation keeps
    cluster sizes at their base values, so true pairs grow linearly).
    Appends its own SCALING.md section with --write, separating engine
    scaling from the adversarial protocol's quadratic pair growth."""
    spark = get_spark("scale-probe-clusters")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[int, float] = {}
    try:
        for factor in SCALES:
            d = os.path.join(WORK, f"docs_uq_x{factor}")
            replicate_unique(spark, factor, d)
            docs = spark.read.parquet(d).select("doc_id", "text")
            clusters_probe(docs)  # warm-up
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                clusters_probe(docs)
                best = min(best, time.time() - t0)
            results[factor] = round(best, 2)
            print(f"x{factor} clusters_realistic: {results[factor]}s", flush=True)
    finally:
        shutil.rmtree(WORK, ignore_errors=True)
    lines = [
        "",
        CLUSTERS_MARKER.strip(),
        "",
        "| probe | " + " | ".join(f"x{f}" for f in SCALES) + " |",
        "|---|" + "---|" * len(SCALES),
        "| duplicate_clusters_e2e (bounded clusters) | "
        + " | ".join(f"{results[f]}s" for f in SCALES)
        + " |",
        "",
        "Replication perturbs each copy's text (`replicate_unique`), so",
        "duplicate clusters keep their base sizes and true pairs grow",
        "LINEARLY with the factor — the realistic-corpus curve. Compare",
        "with the adversarial row in the main table, where every doc",
        "gains factor-many exact copies and the hot-bucket cap",
        "(operators/dedup.py DEFAULT_MAX_BUCKET) is what bounds the",
        "blow-up per band bucket. Absolute x1 levels are NOT comparable",
        "across the two protocols (the per-word copy token roughly",
        "doubles text length here); the shape of each curve is the",
        "signal.",
    ]
    out = "\n".join(lines)
    print(out)
    if "--write" in sys.argv:
        _write_section(CLUSTERS_MARKER, out)


#: Section marker owned by main_capped in SCALING.md.
CAPPED_MARKER = "\n## x64 capped-dedup point"


def main_capped(factors: tuple[int, ...] = (4, 16, 64)) -> None:
    """r4: full adversarial curves for the CAPPED dedup paths up to
    x64 (320k docs) — confirms the hot-bucket (MinHash) and
    hot-cluster (SimHash) caps keep the band joins bounded as the
    adversarial duplicate clusters grow to 64x their base size — plus
    one x64 point extending the bounded-cluster (realistic-density)
    clusters curve. Appends its own SCALING.md section with --write."""
    from vectordb_light_spark.operators.dedup import (
        minhash_lsh_candidates,
        simhash_near_dups,
    )

    spark = get_spark("scale-probe-capped")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[int, float]] = {}
    clusters_x64 = None
    try:
        for factor in factors:
            d_adv = os.path.join(WORK, f"docs_x{factor}")
            replicate(spark, "documents", "doc_id", factor, d_adv)
            adv = spark.read.parquet(d_adv).select("doc_id", "text")

            def p_minhash_adv():
                return minhash_lsh_candidates(adv).count()

            def p_simhash_adv():
                return simhash_near_dups(adv, max_hamming=3).count()

            for name, fn in (
                ("minhash_lsh_candidates (adversarial, capped)", p_minhash_adv),
                ("simhash_near_dups (adversarial, capped)", p_simhash_adv),
            ):
                fn()  # warm-up
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    fn()
                    best = min(best, time.time() - t0)
                results.setdefault(name, {})[factor] = round(best, 2)
                print(f"x{factor} {name}: {round(best, 2)}s", flush=True)
        d_uq = os.path.join(WORK, f"docs_uq_x{factors[-1]}")
        replicate_unique(spark, factors[-1], d_uq)
        uq = spark.read.parquet(d_uq).select("doc_id", "text")
        clusters_probe(uq)  # warm-up
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            clusters_probe(uq)
            best = min(best, time.time() - t0)
        clusters_x64 = round(best, 2)
        print(f"x{factors[-1]} clusters_bounded: {clusters_x64}s", flush=True)
    finally:
        shutil.rmtree(WORK, ignore_errors=True)
    cols = " | ".join(f"x{f}" for f in factors)
    lines = [
        "",
        CAPPED_MARKER.strip() + f" (up to {factors[-1]}x = ~{factors[-1] * 5000} docs)",
        "",
        f"| probe | {cols} |",
        "|---|" + "---|" * len(factors),
    ] + [
        "| " + n + " | " + " | ".join(f"{results[n][f]}s" for f in factors) + " |"
        for n in results
    ] + [
        f"| duplicate_clusters_e2e (bounded clusters) | — | — | {clusters_x64}s |",
        "",
        "Adversarial xN gives every base doc N exact copies, so every",
        "duplicate cluster is N x its base size — without the hot-bucket",
        "(MinHash) and hot-cluster (SimHash) caps these band self-joins",
        "would emit ~N^2 x the base pair volume in a handful of tasks.",
        "With the caps the wall should track DATA volume (~4x per step),",
        "not pair volume (~16x per step). The bounded-cluster row extends",
        "the realistic-density curve of the section above to x64; its",
        "true-pair volume is linear by protocol.",
    ]
    out = "\n".join(lines)
    print(out)
    if "--write" in sys.argv:
        _write_section(CAPPED_MARKER, out)


#: Section marker owned by main_hh in SCALING.md.
HH_MARKER = "\n## streaming heavy hitters (sharded SpaceSaving)"


def main_hh(factors: tuple[int, ...] = (1, 4, 16)) -> None:
    """r4: events replicated with per-copy user_id offsets (distinct
    keys grow linearly with data) through the full streaming query —
    wall should track data volume while retained state stays bounded
    by shards x capacity. A low-capacity variant forces the eviction
    regime to show the bound engaging. Appends its own SCALING.md
    section with --write."""
    from vectordb_light_spark.streaming.events import (
        bounded_state_partitions,
        normalize_event_ts,
        streaming_heavy_hitters,
        run_stream_to_memory,
    )

    spark = get_spark("scale-probe-hh")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[int, float]] = {}
    state_rows: dict[str, dict[int, int]] = {}
    keys_by_factor: dict[int, int] = {}
    try:
        for factor in factors:
            d = os.path.join(WORK, f"events_x{factor}")
            ev = load_table(spark, BASE, "events")
            parts = [
                ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
                .withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
                for i in range(factor)
            ]
            union = parts[0]
            for p in parts[1:]:
                union = union.unionByName(p)
            union.repartition(max(8, factor * 2)).write.mode("overwrite").parquet(d)
            batch = spark.read.parquet(d)
            keys_by_factor[factor] = batch.select("user_id").distinct().count()

            def run(capacity: int, tag: str, factor=factor, d=d, batch=batch):
                def go():
                    stream = normalize_event_ts(
                        spark.readStream.schema(batch.schema).parquet(d)
                    )
                    with bounded_state_partitions(spark, 8):
                        out = run_stream_to_memory(
                            streaming_heavy_hitters(
                                stream, threshold=1, capacity=capacity
                            ),
                            f"hh_probe_{tag}_x{factor}",
                            output_mode="update",
                        )
                    return out.count()

                n = go()  # warm-up
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    go()
                    best = min(best, time.time() - t0)
                results.setdefault(tag, {})[factor] = round(best, 2)
                state_rows.setdefault(tag, {})[factor] = n
                print(
                    f"x{factor} heavy_hitters[{tag}]: {round(best, 2)}s "
                    f"({n} retained / {keys_by_factor[factor]} keys)",
                    flush=True,
                )

            run(65536, "exact_regime")
            run(512, "capacity_512")
    finally:
        shutil.rmtree(WORK, ignore_errors=True)
    cols = " | ".join(f"x{f}" for f in factors)
    lines = [
        "",
        HH_MARKER.strip(),
        "",
        f"| variant | {cols} |",
        "|---|" + "---|" * len(factors),
    ] + [
        "| " + tag + " | " + " | ".join(
            f"{results[tag][f]}s ({state_rows[tag][f]}/{keys_by_factor[f]})"
            for f in factors
        ) + " |"
        for tag in results
    ] + [
        "",
        "Cells: wall (retained counters / distinct keys). Replication",
        "offsets user_id per copy, so distinct keys grow with the data.",
        "In the exact regime (capacity 65536/shard) every key is",
        "retained with max_err 0 and wall tracks data volume. At",
        "capacity 512 x 8 shards the summaries saturate at 4096",
        "counters no matter how many keys flow through — constant",
        "state is the 100 TB property; retention/error bounds are",
        "unit-tested (tests/test_streaming.py).",
    ]
    out = "\n".join(lines)
    print(out)
    if "--write" in sys.argv:
        _write_section(HH_MARKER, out)


if __name__ == "__main__":
    if "--big" in sys.argv:
        main_big()
    elif "--clusters" in sys.argv:
        main_clusters()
    elif "--capped" in sys.argv:
        main_capped()
    elif "--hh" in sys.argv:
        main_hh()
    else:
        main()
