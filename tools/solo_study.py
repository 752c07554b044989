"""Warm solo re-timing study for bench-mover adjudication.

The r8/r9 rounds each carried one driver-bench mover that had to be
adjudicated noise-vs-regression (vq_mmr_rerank in r8, ann_topk_join
in r9). The playbook that settled both: run the entry SOLO on an
otherwise-idle machine — bench.py's full session warm-up, one untimed
warm-up execution, then N timed executions — and compare the
best/median against the committed `_SOLO_COST_S` floor and the driver
reading. A floor-level best = host jitter; a floor that moved = real
regression to profile.

    python tools/solo_study.py [sf_dir] <entry> [entry ...] [iterations=10]

Several entries share one warmed session (an adjudication should
always re-time 1-2 UNTOUCHED control entries in the same session —
the r10 ann_topk_join playbook). Prints one line per run plus
best/median/floor and the load average before and after (the
documented host-contention control).
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


def loadavg() -> str:
    return open("/proc/loadavg").read().split()[0]


def warmed_session(app_name: str, sf_dir: str):
    """The shared study discipline (solo_study + ab_study): quiet
    session + bench.py's full warm-up, bracketed by /proc/loadavg.
    Returns ``(spark, load0)``; read :func:`loadavg` again at the end
    for the contention control."""
    load0 = loadavg()
    spark = get_spark(app_name)
    spark.sparkContext.setLogLevel("ERROR")
    _warm_session(spark, sf_dir)
    return spark, load0


def summary_stats(samples: list[float]) -> str:
    return (
        f"best {min(samples):.3f}s  "
        f"median {statistics.median(samples):.3f}s  "
        f"mean {statistics.mean(samples):.3f}s  "
        f"worst {max(samples):.3f}s"
    )


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    rest = [a for a in args if "/" not in a]
    names = [a for a in rest if not a.isdigit()]
    iters = next((int(a) for a in rest if a.isdigit()), 10)
    unknown = [n for n in names if n not in QUERIES]
    if unknown or not names:
        raise SystemExit(f"unknown entries: {unknown or '(none given)'}")

    spark, load0 = warmed_session("solo-study", sf_dir)

    summaries = []
    for name in names:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).collect()
        print(f"{name} warm-up: {time.time() - t0:.3f}s", flush=True)

        samples = []
        for i in range(iters):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            dt = time.time() - t0
            samples.append(dt)
            print(f"{name} run {i + 1}: {dt:.3f}s", flush=True)
        floor = _SOLO_COST_S.get(name)
        summaries.append(
            f"{name} @ {sf_dir}: {summary_stats(samples)}  floor {floor}"
            + (
                f"  best/floor {min(samples) / floor:.2f}x"
                if floor
                else ""
            )
        )

    load1 = loadavg()
    print(f"\nloadavg {load0}->{load1}")
    for s in summaries:
        print(s)


if __name__ == "__main__":
    main()
