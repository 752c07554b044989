"""ANN evaluation: recall@10 vs scanned-fraction across the engine's
index tiers (SRP radius sweep, IVF nprobe sweep, PQ/ADC, IVFPQ), on
the sf0.1 embeddings against the exact scan. Writes ANN_EVAL.md with
--write.

The point of the table: every tier is a DIFFERENT lever on the same
trade — SRP prunes rows by signature distance, IVF prunes rows by
centroid locality, PQ shrinks bytes-per-row, IVFPQ multiplies the
last two — and the measured curve is what a deployment tunes against.

    python tools/ann_eval.py [--write]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from vectordb_light_spark.operators.search import (  # noqa: E402
    SearchParams,
    topk_cosine,
)
from vectordb_light_spark.operators.similarity import (  # noqa: E402
    add_ivf_cluster,
    add_pq_codes,
    add_srp_signature,
    ann_topk_ivf,
    ann_topk_ivfpq,
    ann_topk_pq,
    ann_topk_srp,
    srp_planes,
    srp_signature_of,
    train_ivf_centroids,
    train_pq_codebooks,
)
from vectordb_light_spark.session import get_spark, load_table  # noqa: E402

SF = "/root/testdata/sf0.1"
K = 10
N_QUERIES = 20
FLOAT_BYTES_PER_VEC = 64 * 4


def main() -> None:
    spark = get_spark("ann-eval")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF, "embeddings").cache()
    n = emb.count()
    qrows = (
        emb.where(F.pmod("vec_id", F.lit(100)) == 0)
        .orderBy("vec_id")
        .limit(N_QUERIES)
        .collect()
    )
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]

    def exact_ids(qv):
        out = topk_cosine(
            emb, qv, SearchParams(k=K, threshold=0.0, assume_normalized=True),
            id_col="vec_id", vec_col="embedding",
        )
        return {r["vec_id"] for r in out.select("vec_id").collect()}

    exact = {qid: exact_ids(qv) for qid, qv in queries}

    rows = []  # (tier, config, recall, scan_fraction_rows, bytes_per_row)

    # SRP radius sweep (16 planes)
    srp = add_srp_signature(emb, n_planes=16).cache()
    srp.count()
    planes = srp_planes(64, 16, 42)
    for radius in (2, 4, 6, 8):
        recs, fracs = [], []
        for qid, qv in queries:
            qsig = srp_signature_of(qv, planes)
            cand = srp.where(
                F.bit_count(F.col("srp_sig").bitwiseXOR(F.lit(qsig))) <= radius
            ).count()
            got = {
                r["vec_id"]
                for r in ann_topk_srp(
                    srp, qv, k=K, probe_hamming=radius, n_planes=16
                ).select("vec_id").collect()
            }
            recs.append(len(got & exact[qid]) / K)
            fracs.append(cand / n)
        rows.append(("SRP-16", f"radius={radius}", np.mean(recs), np.mean(fracs),
                     FLOAT_BYTES_PER_VEC))

    # IVF nprobe sweep (16 centroids)
    cents = train_ivf_centroids(emb, n_centroids=16)
    ivf = add_ivf_cluster(emb, cents).cache()
    sizes = {
        r["ivf_cluster"]: r["count"]
        for r in ivf.groupBy("ivf_cluster").count().collect()
    }
    for nprobe in (1, 2, 4, 8):
        recs, fracs = [], []
        for qid, qv in queries:
            order = np.argsort(-(cents @ np.asarray(qv)))
            probed = sum(sizes.get(int(c), 0) for c in order[:nprobe])
            got = {
                r["vec_id"]
                for r in ann_topk_ivf(ivf, cents, qv, k=K, nprobe=nprobe)
                .select("vec_id").collect()
            }
            recs.append(len(got & exact[qid]) / K)
            fracs.append(probed / n)
        rows.append(("IVF-16", f"nprobe={nprobe}", np.mean(recs), np.mean(fracs),
                     FLOAT_BYTES_PER_VEC))

    # PQ / ADC (full scan, compressed rows)
    books = train_pq_codebooks(emb, m=16, n_codes=64, max_train=5_000)
    coded = add_pq_codes(emb, books).cache()
    coded.count()
    recs = [
        len(
            {
                r["vec_id"]
                for r in ann_topk_pq(coded, books, qv, k=K).collect()
            }
            & exact[qid]
        )
        / K
        for qid, qv in queries
    ]
    rows.append(("PQ-16x64", "full scan", np.mean(recs), 1.0, 16))

    # IVFPQ (probe pruning x compressed rows)
    ivfpq = add_pq_codes(ivf, books).cache()
    ivfpq.count()
    for nprobe in (2, 4):
        recs, fracs = [], []
        for qid, qv in queries:
            order = np.argsort(-(cents @ np.asarray(qv)))
            probed = sum(sizes.get(int(c), 0) for c in order[:nprobe])
            got = {
                r["vec_id"]
                for r in ann_topk_ivfpq(
                    ivfpq, cents, books, qv, k=K, nprobe=nprobe
                ).collect()
            }
            recs.append(len(got & exact[qid]) / K)
            fracs.append(probed / n)
        rows.append(("IVFPQ", f"nprobe={nprobe}", np.mean(recs), np.mean(fracs), 16))

    lines = [
        "# ANN_EVAL — recall@10 vs scanned fraction (sf0.1, 20 queries, exact-scan ground truth)",
        "",
        "Generated by `python tools/ann_eval.py --write` "
        f"({n} vectors, dim 64, unit-norm; k={K}).",
        "",
        "| tier | config | recall@10 | rows scanned | bytes/row | relative scan cost* |",
        "|---|---|---|---|---|---|",
    ]
    for tier, cfg, rec, frac, bpr in rows:
        rel = frac * bpr / FLOAT_BYTES_PER_VEC
        lines.append(
            f"| {tier} | {cfg} | {rec:.2f} | {frac:.1%} | {bpr} | {rel:.1%} |"
        )
    lines += [
        "",
        "\\* scanned-rows fraction × bytes-per-row, relative to the exact",
        "float32 full scan (= 100%). Exact scan recall is 1.00 by",
        "definition. SRP prunes rows by signature Hamming distance, IVF",
        "by centroid locality, PQ shrinks every scanned row 16×, and",
        "IVFPQ multiplies the last two — each tier is a different lever",
        "on the same recall/cost trade, and a deployment picks its point",
        "on this curve (then optionally exact-re-ranks a pool, see",
        "tests/test_similarity.py pool-superset assertions).",
    ]
    out = "\n".join(lines)
    print(out)
    if "--write" in sys.argv:
        Path(__file__).resolve().parent.parent.joinpath("ANN_EVAL.md").write_text(
            out + "\n"
        )


if __name__ == "__main__":
    main()
