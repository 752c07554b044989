"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from vectordb_light_spark.queries import QUERIES, _SOLO_COST_S  # noqa: E402
from vectordb_light_spark.session import get_spark  # noqa: E402


def _warm_session(spark, sf_dir: str) -> None:
    """Unbenched session warm-up (r6 verdict item 2): the registry
    order is staleness-first and reshuffles every round, so whichever
    entries land at the head used to absorb the session's one-time
    costs (parquet footer reads, first scan page-cache faults, JVM
    codegen JIT, Python/Arrow worker pool spawn) and read as phantom
    2x movers on unchanged code. Pay ALL of those here, before any
    timed loop: full scan of every base table + one Arrow-batched
    pandas UDF action to spin up the python worker pool."""
    import glob as _glob

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    for p in sorted(_glob.glob(os.path.join(sf_dir, "*.parquet"))):
        df = spark.read.parquet(p)
        # Touch every column (not just footers) so the first timed
        # query doesn't pay the page-cache cold read.
        df.select([F.count(c) for c in df.columns]).collect()

    _warm_pool = pandas_udf(lambda s: s * 1.0, "double")

    spark.range(0, 32 * 1000, 1, 32).select(
        _warm_pool(F.col("id").cast("double")).alias("w")
    ).agg(F.sum("w")).collect()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("vectordb-light-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    _warm_session(spark, sf_dir)

    # Per query: one warm-up run (python-worker spawn, parquet footer
    # cache), then best-of-2 timed runs. The host VM shows heavy
    # transient CPU steal, so a single sample can read 3-5× high;
    # min-of-2 after warm-up reports the engine's steady-state cost.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        try:
            t0 = time.time()
            fn(spark, sf_dir).collect()  # warm-up, untimed
            warm_s = time.time() - t0
            # Heavy tail entries (real streaming jobs, multi-query ANN
            # contracts) get ONE timed run — min-of-2 denoising isn't
            # worth doubling their cost in the round budget.
            n_runs = 1 if warm_s > 4.0 else repeats
            dt = float("inf")
            for _ in range(n_runs):
                t0 = time.time()
                fn(spark, sf_dir).collect()
                dt = min(dt, time.time() - t0)
            # Outlier re-check (r6 verdict item 2): host CPU steal can
            # still make a pair of samples read 1.5-2x the entry's
            # committed solo floor on UNCHANGED code. When that
            # happens, take up to 2 extra timed runs — a genuine
            # regression stays high; transient steal collapses back
            # into band. Bounded: only sub-4s entries, only when the
            # reading is out of band.
            solo = _SOLO_COST_S.get(name)
            extra = 0
            while (
                solo is not None
                and dt > 1.5 * solo
                and dt < 4.0
                and extra < 2
            ):
                t0 = time.time()
                fn(spark, sf_dir).collect()
                dt = min(dt, time.time() - t0)
                extra += 1
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
            dt = float("nan")
        timings[name] = round(dt, 3)
        if dt == dt:
            total += dt

    # BASELINE.md bench plan "ingest": the reference's entry point A
    # (chunk + normalize + embed + write) end-to-end over the sf
    # documents table, reported as wall s + chunks/s (the analogue of
    # the reference's stage_split.py:428-431 throughput log).
    ingest = {}
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from vectordb_light_spark.operators.ingest import (
            IngestConfig,
            create_database,
        )

        docs = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select(
                F.sha2(F.coalesce("text", F.lit("")), 256).alias("hash"),
                "text",
                F.lit(".txt").alias("file_type"),
                F.col("doc_id"),
            )
        )
        # Same denoising as the queries (r3 verdict: the one
        # un-denoised probe moved 1.6x on host CPU steal with no code
        # change): one untimed warm-up build, then min-of-2 timed
        # builds, each into a fresh directory.
        cfg = IngestConfig(
            chunk_size=1200, chunk_overlap=600,
            embedder_spec={"encoder": "hashing", "dim": 64, "seed": 0},
            target_files=8,
        )
        wall, n_chunks = float("inf"), 0
        for i in range(3):
            root = tempfile.mkdtemp(prefix="bench-ingest-")
            try:
                t0 = time.time()
                meta = create_database(spark, docs, root, "benchdb", cfg)
                dt = time.time() - t0
            finally:
                shutil.rmtree(root, ignore_errors=True)
            if i == 0:
                continue  # warm-up (python-worker spawn, footer cache)
            if dt < wall:
                wall = dt
                n_chunks = int(meta["observed"].get("n_chunks", 0))
        ingest = {
            "ingest_wall_s": round(wall, 3),
            "ingest_chunks": n_chunks,
            "ingest_chunks_per_s": round(n_chunks / wall, 1) if wall else 0,
        }
    except Exception as e:  # noqa: BLE001
        print(f"bench error in ingest: {e}", file=sys.stderr)

    # The driver captures only a bounded tail of stdout (r1: the full
    # 80-query JSON line overflowed it → "parsed": null). Emit a
    # COMPACT final line — totals + a fixed headline subset — and put
    # the full per-query dict in BENCH_FULL.json next to this script.
    # r13 (VERDICT r12 item 7): BENCH_FULL.json was clobbered by
    # whatever bench ran last (the committed copy ended up holding
    # the driver's 8-core scaling run), so a (cpus, sf)-tagged copy
    # is written alongside; the untagged file stays for the stdout
    # contract's `queries_full` pointer. The compact stdout line is
    # UNCHANGED.
    full_blob = json.dumps(
        {
            "metric": "all_queries_wall",
            "value": round(total, 3),
            "unit": "sec",
            "n_queries": len(timings),
            "queries": timings,
            **ingest,
            "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        },
        indent=1,
    )
    here = Path(__file__).resolve().parent
    (here / "BENCH_FULL.json").write_text(full_blob)
    tag = f"c{os.environ.get('SPARK_GRAFT_CPUS', '32')}_sf{sf}"
    (here / f"BENCH_FULL_{tag}.json").write_text(full_blob)
    headline = [
        "vq_topk_cosine",
        "vq_batch_topk",
        "rel_pricing_summary",
        "rel_shipping_priority",
        "rel_events_asof",
        "rel_window_order_rank",
        "dd_exact_dedup",
        "dd_minhash_candidates",
        "dd_embedding_near_dups",
        "ann_topk_join",
        "kw_bm25_topk",
        "st_events_sessions",
        "pipe_sequence_pack",
        "pipe_training_corpus",
        "ts_lang_id",
        "prof_events_rollup",
        "emb_feature_hash_topk",
        "pipe_decontaminate",
        "sim_sparse_cosine_pairs",
    ]
    line = json.dumps(
        {
            "metric": "all_queries_total_wall",
            "value": round(total, 3),
            "unit": "sec",
            "n_queries": len(timings),
            "queries": {k: timings[k] for k in headline if k in timings},
            **ingest,
            "queries_full": "BENCH_FULL.json",
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        },
        separators=(",", ":"),
    )
    assert len(line) < 1800, f"bench line too long ({len(line)}) for driver capture"
    print(line)


if __name__ == "__main__":
    main()
