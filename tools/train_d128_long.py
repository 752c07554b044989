"""Long-schedule d128 encoder run (round-4 verdict item #4).

The r4 capacity-notch attempts (ANN_EVAL.md) topped out at mrr 0.161
(lr 3e-3, ~1250 steps) — below the shipping gate (>=2x seeded MRR AND
top1 >= 0.3). The measured plateau-escape schedule is >=3000 steps, so
this script runs the full budget as a resumable background job:

    python tools/train_d128_long.py [--steps N] [--lr LR]

- snapshots every 200 steps into tools/.d128_long/ (gitignored scratch)
- on finish, evaluates the final weights AND every snapshot, picks the
  best by MRR, and ships to assets/ ONLY if the gate clears; otherwise
  appends the measured negative row for ANN_EVAL.md to the log.
- re-running resumes from the newest snapshot (warm restart).
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from vectordb_light_spark.functions import encoder_train as et  # noqa: E402

CORPUS = "/root/testdata/sf0.1/documents.parquet"
CFG = dict(dim=128, n_layers=2, n_heads=4, max_seq=128)
SNAP_DIR = Path(__file__).resolve().parent / ".d128_long"


def _eval(w32, texts):
    return et.eval_retrieval(
        w32, texts, n_layers=CFG["n_layers"], n_heads=CFG["n_heads"],
        max_seq=CFG["max_seq"],
    )


def main() -> None:
    steps = 3200
    lr = 3e-3
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    if "--lr" in sys.argv:
        lr = float(sys.argv[sys.argv.index("--lr") + 1])
    SNAP_DIR.mkdir(exist_ok=True)
    texts = pq.read_table(CORPUS, columns=["text"]).column("text").to_pylist()
    print(f"corpus: {len(texts)} docs; target {steps} steps at lr {lr}", flush=True)

    init, done, seed = None, 0, 0
    snaps = sorted(
        SNAP_DIR.glob("snap_*.npz"),
        key=lambda p: int(re.search(r"\d+", p.stem).group()),
    )
    if snaps:
        done = int(re.search(r"\d+", snaps[-1].stem).group())
        init = {k: v for k, v in np.load(snaps[-1]).items()}
        seed = done  # fresh batch sequence on warm restart
        print(f"resuming from {snaps[-1].name} ({done} steps done)", flush=True)
    remaining = steps - done
    if remaining > 0:
        t0 = time.time()

        def snap(step, w32):
            np.savez(SNAP_DIR / f"snap_{done + step}.npz", **w32)
            el = time.time() - t0
            print(
                f"  snapshot {done + step} ({el:.0f}s, {el / step:.2f}s/step)",
                flush=True,
            )

        w, hist = et.train_contrastive(
            texts, steps=remaining, lr=lr, seed=seed, init_weights=init,
            snapshot_every=200, snapshot=snap, log_every=100, **CFG,
        )
        final = {k: v.astype(np.float32) for k, v in w.items()}
        np.savez(SNAP_DIR / f"snap_{steps}.npz", **final)
        print(f"train done: loss {hist[0]:.3f} -> {hist[-1]:.3f}", flush=True)

    base = _eval(
        et.seeded_weights(CFG["dim"], CFG["n_layers"], CFG["n_heads"], CFG["max_seq"]),
        texts,
    )
    print(f"seeded baseline: {base}", flush=True)
    best = None
    for p in sorted(
        SNAP_DIR.glob("snap_*.npz"),
        key=lambda q: int(re.search(r"\d+", q.stem).group()),
    ):
        w32 = {k: v for k, v in np.load(p).items()}
        m = _eval(w32, texts)
        step_n = int(re.search(r"\d+", p.stem).group())
        print(f"  step {step_n}: top1 {m['top1']:.3f} mrr {m['mrr']:.3f}", flush=True)
        if best is None or m["mrr"] > best[1]["mrr"]:
            best = (step_n, m, w32)
    step_n, m, w32 = best
    gate = m["mrr"] >= 2 * base["mrr"] and m["top1"] >= 0.3
    verdict = {
        "best_step": step_n, "top1": m["top1"], "mrr": m["mrr"],
        "seeded_mrr": base["mrr"], "lr": lr, "steps": steps, "gate": gate,
    }
    print("VERDICT " + json.dumps(verdict), flush=True)
    if gate:
        path = et.checkpoint_path(
            CFG["dim"], CFG["n_layers"], CFG["n_heads"], CFG["max_seq"]
        )
        et.save_checkpoint(path, w32)
        print(f"gate CLEARED -> shipped {path}", flush=True)
    else:
        print("gate NOT cleared — record as measured negative in ANN_EVAL.md", flush=True)


if __name__ == "__main__":
    main()
