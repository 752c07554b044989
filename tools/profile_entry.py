"""Per-entry job breakdown profiler (guide §1: measure first).

Runs named registry entries with the Spark UI enabled and, after each
timed run, pulls the UI REST API for the jobs that ran inside the
entry's window — per-job wall, stage count, task count, shuffle bytes.
This is how we tell "N tiny scheduled jobs" apart from "one heavy
shuffle" before touching any code.

    python tools/profile_entry.py [sf_dir] entry [entry ...]

Output: one block per entry — total wall (warm), then a job table.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)

    # UI must be on BEFORE the session exists; build it here rather
    # than in session.get_spark (which pins ui.enabled=false).
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.appName("profile-entry")
        .master(f"local[{cpus}]")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .config("spark.ui.retainedJobs", "5000")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .getOrCreate()
    )
    from vectordb_light_spark.queries import QUERIES
    from vectordb_light_spark.session import _tune_session

    _tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.execution.arrow.pyspark.enabled", "true"
    )
    ui = "http://localhost:4050/api/v1"
    app_id = spark.sparkContext.applicationId

    def jobs_between(t0_ms: float, t1_ms: float) -> list[dict]:
        with urllib.request.urlopen(
            f"{ui}/applications/{app_id}/jobs?status=succeeded"
        ) as r:
            jobs = json.load(r)
        out = []
        for j in jobs:
            sub = time.mktime(
                time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            ) * 1000
            if t0_ms - 500 <= sub <= t1_ms + 500:
                out.append(j)
        return sorted(out, key=lambda j: j["jobId"])

    def job_wall(j: dict) -> float:
        fmt = "%Y-%m-%dT%H:%M:%S"
        t0 = time.mktime(time.strptime(j["submissionTime"][:19], fmt))
        t0 += float("0." + j["submissionTime"][20:23] or 0)
        t1 = time.mktime(time.strptime(j["completionTime"][:19], fmt))
        t1 += float("0." + j["completionTime"][20:23] or 0)
        return t1 - t0

    for name in args:
        fn = QUERIES[name]
        # warm-up run (python workers, page cache, codegen)
        t = time.time()
        fn(spark, sf_dir).collect()
        warm = time.time() - t
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0_ms = time.time() * 1000
        t = time.time()
        fn(spark, sf_dir).collect()
        wall = time.time() - t
        t1_ms = time.time() * 1000
        spark.sparkContext.setJobDescription(None)
        jobs = jobs_between(t0_ms, t1_ms)
        total_job = sum(job_wall(j) for j in jobs)
        print(f"\n=== {name}: wall {wall:.2f}s (first {warm:.2f}s), "
              f"{len(jobs)} jobs, sum(job walls) {total_job:.2f}s, "
              f"gap {wall - total_job:.2f}s ===")
        for j in jobs:
            st = j.get("numCompletedStages", 0) + j.get("numSkippedStages", 0)
            print(
                f"  job {j['jobId']:>4}  {job_wall(j):6.2f}s  "
                f"stages {st:>3} (skip {j.get('numSkippedStages', 0):>3})  "
                f"tasks {j.get('numCompletedTasks', 0):>5}  "
                f"{(j.get('description') or j.get('name', ''))[:90]}"
            )


if __name__ == "__main__":
    main()
