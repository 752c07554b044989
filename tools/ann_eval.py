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
                     FLOAT_BYTES_PER_VEC, 0.0))

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
                     FLOAT_BYTES_PER_VEC, 0.0))

    # PQ / ADC (full scan, compressed rows) ± exact re-rank of the ADC
    # pool — re-rank fetches pool full vectors, so its extra relative
    # cost is pool/n (full-width rows) on top of the code scan.
    for n_codes in (64, 128):
        books = train_pq_codebooks(emb, m=16, n_codes=n_codes, max_train=5_000)
        coded = add_pq_codes(emb, books).cache()
        coded.count()
        for pool in (None, 50):
            recs = [
                len(
                    {
                        r["vec_id"]
                        for r in ann_topk_pq(
                            coded, books, qv, k=K, rerank_pool=pool
                        ).collect()
                    }
                    & exact[qid]
                )
                / K
                for qid, qv in queries
            ]
            cfg = "full ADC scan" if pool is None else f"ADC + rerank@{pool}"
            rows.append(
                (f"PQ-16x{n_codes}", cfg, np.mean(recs), 1.0, 16,
                 (pool or 0) / n)
            )
        if n_codes == 64:
            books64, coded64 = books, coded
        else:
            coded.unpersist()

    # OPQ (learned rotation before PQ): same 16-byte scan as PQ, less
    # ADC distortion — compare full-ADC recall head-to-head with PQ at
    # the same n_codes, and the production rerank point.
    from vectordb_light_spark.operators.similarity import (
        add_opq_codes,
        ann_topk_opq,
        train_opq,
    )

    for n_codes in (64, 128):
        R, obooks = train_opq(
            emb, m=16, n_codes=n_codes, opq_iters=6, max_train=5_000
        )
        ocoded = add_opq_codes(emb, R, obooks).cache()
        ocoded.count()
        for pool in (None, 50):
            recs = [
                len(
                    {
                        r["vec_id"]
                        for r in ann_topk_opq(
                            ocoded, R, obooks, qv, k=K, rerank_pool=pool
                        ).collect()
                    }
                    & exact[qid]
                )
                / K
                for qid, qv in queries
            ]
            cfg = "full ADC scan" if pool is None else f"ADC + rerank@{pool}"
            rows.append(
                (f"OPQ-16x{n_codes}", cfg, np.mean(recs), 1.0, 16,
                 (pool or 0) / n)
            )
        ocoded.unpersist()

    # IVFPQ (probe pruning x compressed rows) ± re-rank
    ivfpq = add_pq_codes(ivf, books64).cache()
    ivfpq.count()
    for nprobe, pool in (
        (2, None),
        (4, None),
        (4, 50),
        (8, 50),
        (8, 100),
        (12, 100),
    ):
        recs, fracs = [], []
        for qid, qv in queries:
            order = np.argsort(-(cents @ np.asarray(qv)))
            probed = sum(sizes.get(int(c), 0) for c in order[:nprobe])
            got = {
                r["vec_id"]
                for r in ann_topk_ivfpq(
                    ivfpq, cents, books64, qv, k=K, nprobe=nprobe,
                    rerank_pool=pool,
                ).collect()
            }
            recs.append(len(got & exact[qid]) / K)
            fracs.append(probed / n)
        cfg = f"nprobe={nprobe}" + ("" if pool is None else f" + rerank@{pool}")
        rows.append(
            ("IVFPQ", cfg, np.mean(recs), np.mean(fracs), 16, (pool or 0) / n)
        )

    lines = [
        "# ANN_EVAL — recall@10 vs scanned fraction (sf0.1, 20 queries, exact-scan ground truth)",
        "",
        "Generated by `python tools/ann_eval.py --write` "
        f"({n} vectors, dim 64, unit-norm; k={K}).",
        "",
        "| tier | config | recall@10 | rows scanned | bytes/row | relative scan cost* |",
        "|---|---|---|---|---|---|",
    ]
    for tier, cfg, rec, frac, bpr, extra in rows:
        rel = frac * bpr / FLOAT_BYTES_PER_VEC + extra
        star = " ★" if rec >= 0.9 and rel <= 0.10 else ""
        lines.append(
            f"| {tier} | {cfg} | {rec:.2f} | {frac:.1%} | {bpr} | {rel:.1%}{star} |"
        )
    lines += [
        "",
        "\\* scanned-rows fraction × bytes-per-row, relative to the exact",
        "float32 full scan (= 100%), plus pool/n full-width rows when",
        "exact re-rank is on. Exact scan recall is 1.00 by definition.",
        "SRP prunes rows by signature Hamming distance, IVF by centroid",
        "locality, PQ shrinks every scanned row 16×, and IVFPQ",
        "multiplies the last two. ★ marks operating points at",
        "recall@10 ≥ 0.9 under ≤ 10% relative cost — `ann_topk_pq(...,",
        "rerank_pool=50)` is the production default: ADC picks WHAT to",
        "fetch, exact float math decides the final ORDER, so recall is",
        "bounded by pool membership rather than ADC distortion.",
        "",
        "OPQ (learned rotation, Ge et al. 2013) measures ≈ EQUAL to PQ",
        "here — expected and honest: this corpus's vectors are isotropic",
        "(near-uniform random), so there is no cross-subspace correlation",
        "for the rotation to concentrate. The trained rotation still",
        "lowers reconstruction MSE (asserted in tests); on real embedding",
        "distributions (which are strongly anisotropic) the same code is",
        "where the ADC-recall gain appears.",
        "",
        "IVFPQ reaches its ★ at nprobe=12/16 + rerank@100 (r3 sweep) —",
        "but note what that config admits: scanning 75% of clusters",
        "means the IVF pruning contributes almost nothing at this",
        "corpus size, and plain PQ + rerank@50 dominates it (equal-or-",
        "better recall at lower cost). The composed tier's real role is",
        "the >RAM corpus regime, where `partitionBy(cluster)` storage",
        "turns the probe fraction into SKIPPED FILES (IO, not CPU) and",
        "a coarser-than-16 centroid book drives the probe fraction far",
        "below 75% — this benchmark's 2000 in-memory vectors cannot",
        "exhibit that; the recall contract pins the tier's floor",
        "anyway (queries.py ann_recall_contract).",
    ]
    out = "\n".join(lines)
    print(out)
    if "--write" in sys.argv:
        Path(__file__).resolve().parent.parent.joinpath("ANN_EVAL.md").write_text(
            out + "\n"
        )


if __name__ == "__main__":
    main()
