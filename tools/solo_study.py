"""Warm solo re-timing study for bench-mover adjudication.

The r8/r9 rounds each carried one driver-bench mover that had to be
adjudicated noise-vs-regression (vq_mmr_rerank in r8, ann_topk_join
in r9). The playbook that settled both: run the entry SOLO on an
otherwise-idle machine — bench.py's full session warm-up, one untimed
warm-up execution, then N timed executions — and compare the
best/median against the committed `_SOLO_COST_S` floor and the driver
reading. A floor-level best = host jitter; a floor that moved = real
regression to profile.

    python tools/solo_study.py [sf_dir] <entry> [iterations=10]

Prints one line per run plus best/median/floor and the load average
before and after (the documented host-contention control).
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _warm_session  # noqa: E402
from vectordb_light_spark.queries import QUERIES, _SOLO_COST_S  # noqa: E402
from vectordb_light_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    rest = [a for a in args if "/" not in a]
    name = rest[0]
    iters = int(rest[1]) if len(rest) > 1 else 10

    load0 = open("/proc/loadavg").read().split()[0]
    spark = get_spark("solo-study")
    spark.sparkContext.setLogLevel("ERROR")
    _warm_session(spark, sf_dir)

    fn = QUERIES[name]
    t0 = time.time()
    fn(spark, sf_dir).collect()
    print(f"warm-up: {time.time() - t0:.3f}s", flush=True)

    samples = []
    for i in range(iters):
        t0 = time.time()
        fn(spark, sf_dir).collect()
        dt = time.time() - t0
        samples.append(dt)
        print(f"run {i + 1}: {dt:.3f}s", flush=True)

    load1 = open("/proc/loadavg").read().split()[0]
    floor = _SOLO_COST_S.get(name)
    print(
        f"\n{name} @ {sf_dir}: best {min(samples):.3f}s  "
        f"median {statistics.median(samples):.3f}s  "
        f"mean {statistics.mean(samples):.3f}s  "
        f"worst {max(samples):.3f}s  "
        f"floor {floor}  loadavg {load0}->{load1}"
    )


if __name__ == "__main__":
    main()
