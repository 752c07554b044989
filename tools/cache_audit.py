"""Cache-substitution audit (VERDICT r12 item 1, bench integrity §5).

`persist_if_batch` frames were historically never unpersisted. Spark's
CacheManager substitutes a cached plan into any LATER structurally-
equal query (canonicalized-plan lookup), so after an entry's warm-up
run the timed runs MAY read the warm-up's materialized intermediates
instead of recomputing from parquet — exactly the cross-run caching
the bench rules forbid. The pre-fix run of this tool (r13 round open)
measured exactly that: dd_minhash_candidates' cached-RDD count stayed
at 1 across warm-up + 2 timed runs (the timed builds' persists
canonically matched the warm-up plan and were served from its cache),
and 11 cached RDDs were carried into the last timed build of a
5-entry sequence.

The r13 fix: session.persist_if_batch records every persisted frame;
the registry wrapper (queries.register) calls
session.release_persisted() at the start of every TOP-LEVEL entry
build. This tool verifies the fix with the CacheManager invariant —
the CacheManager (the substitution surface) must hold ONLY entries
created by the current build, i.e. after every run:

    cacheManager.cachedData().size() <= len(session._PERSISTED_FRAMES)

(`<=` because two structurally-equal persists inside ONE build share
a cache entry). Storage-level RDD counts additionally include
localCheckpoint blocks (ordered_once, CC rounds) — those are PRIVATE
per build (never substituted; ContextCleaner reclaims them once the
build's references drop), so they are reported but not gated on.

    python tools/cache_audit.py [sf_dir] entry [entry ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.solo_study import warmed_session  # noqa: E402
from vectordb_light_spark import session as _session  # noqa: E402
from vectordb_light_spark.queries import QUERIES  # noqa: E402


def storage_info(spark) -> tuple[int, int]:
    """(n cached RDDs, total cached bytes) from the JVM SparkContext —
    includes localCheckpoint blocks, not only CacheManager entries."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()  # noqa: SLF001
    return len(infos), sum(i.memSize() + i.diskSize() for i in infos)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a]
    unknown = [n for n in names if n not in QUERIES]
    if unknown or not names:
        raise SystemExit(f"unknown entries: {unknown or '(none given)'}")

    spark, _ = warmed_session("cache-audit", sf_dir)
    cm = spark._jsparkSession.sharedState().cacheManager()  # noqa: SLF001

    violations = 0
    for name in names:
        fn = QUERIES[name]
        for run in ("warmup", "timed1", "timed2"):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            dt = time.time() - t0
            cm_size = cm.cachedData().size()
            ledger = len(_session._PERSISTED_FRAMES)  # noqa: SLF001
            n_rdd, rdd_bytes = storage_info(spark)
            ok = cm_size <= ledger
            violations += 0 if ok else 1
            print(
                f"{name:32s} {run:7s} {dt:7.3f}s  CacheManager {cm_size} "
                f"vs this-build ledger {ledger} -> "
                f"{'OK' if ok else 'STALE-CACHE'}  "
                f"(storage RDDs incl. checkpoints: {n_rdd}, "
                f"{rdd_bytes / 1e6:.0f} MB)",
                flush=True,
            )
    if violations == 0:
        print("\nCLEAN: every live cache entry belongs to the current build")
    else:
        print(
            f"\nDIRTY: {violations} runs saw cache entries from a "
            "previous build"
        )


if __name__ == "__main__":
    main()
