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

from vectordb_light_spark.queries import QUERIES  # noqa: E402
from vectordb_light_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("vectordb-light-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers with a trivial action so per-query
    # numbers measure the query, not session startup.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # Per query: one warm-up run (python-worker spawn, parquet footer
    # cache), then best-of-2 timed runs. The host VM shows heavy
    # transient CPU steal, so a single sample can read 3-5× high;
    # min-of-2 after warm-up reports the engine's steady-state cost.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in QUERIES.items():
        try:
            fn(spark, sf_dir).collect()  # warm-up, untimed
            dt = float("inf")
            for _ in range(repeats):
                t0 = time.time()
                fn(spark, sf_dir).collect()
                dt = min(dt, time.time() - t0)
        except Exception as e:  # noqa: BLE001
            print(f"bench error in {name}: {e}", file=sys.stderr)
            dt = float("nan")
        timings[name] = round(dt, 3)
        if dt == dt:
            total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
