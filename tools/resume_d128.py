"""Resume the d128 encoder long run from a warm snapshot (offline).

The r4 capacity notch (ANN_EVAL.md) measured that d128 plateau escape
needs >=3000 steps — beyond a single in-round budget — so this tool
continues training from the last warm snapshot instead of restarting
from the seeded init. It evaluates at every snapshot and keeps the
best-by-MRR checkpoint plus a gate-cleared copy when the shipping bar
(mrr >= 2x seeded AND top1 >= 0.3) is met.

    python tools/resume_d128.py [--snapshot /tmp/d128_long.npz]
        [--steps 6000] [--lr 3e-3]

Safe to kill at any point: progress persists at every snapshot.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from vectordb_light_spark.functions import encoder_train as et  # noqa: E402

CORPUS = "/root/testdata/sf0.1/documents.parquet"
CFG = dict(dim=128, n_layers=2, n_heads=4, max_seq=128)
LATEST = "/tmp/d128_r5_latest.npz"
BEST = "/tmp/d128_r5_best.npz"
GATED = "/tmp/d128_r5_gated.npz"
LOG = "/tmp/d128_r5_eval.jsonl"


def _arg(flag, default, cast=str):
    if flag in sys.argv:
        return cast(sys.argv[sys.argv.index(flag) + 1])
    return default


def main() -> None:
    snap_path = _arg("--snapshot", "/tmp/d128_long.npz")
    steps = _arg("--steps", 6000, int)
    lr = _arg("--lr", 3e-3, float)
    texts = pq.read_table(CORPUS, columns=["text"]).column("text").to_pylist()
    eval_kw = dict(
        n_layers=CFG["n_layers"], n_heads=CFG["n_heads"], max_seq=CFG["max_seq"]
    )
    seeded = et.eval_retrieval(
        et.seeded_weights(CFG["dim"], *eval_kw.values()), texts, **eval_kw
    )
    gate_mrr, gate_top1 = 2.0 * seeded["mrr"], 0.3
    print(f"seeded d128: {seeded}; gate mrr>={gate_mrr:.3f} top1>={gate_top1}")

    init = et.load_checkpoint(snap_path) if Path(snap_path).exists() else None
    start = et.eval_retrieval(init, texts, **eval_kw) if init else None
    print(f"resume from {snap_path}: {start}", flush=True)
    state = {"best_mrr": (start or {}).get("mrr", 0.0), "t0": time.time()}
    if init:
        et.save_checkpoint(BEST, init)

    def on_snapshot(step, w):
        et.save_checkpoint(LATEST, w)
        m = et.eval_retrieval(w, texts, **eval_kw)
        rec = {"step": step, "sec": round(time.time() - state["t0"], 1), **m}
        with open(LOG, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(f"snap {rec}", flush=True)
        if m["mrr"] > state["best_mrr"]:
            state["best_mrr"] = m["mrr"]
            et.save_checkpoint(BEST, w)
        if m["mrr"] >= gate_mrr and m["top1"] >= gate_top1:
            et.save_checkpoint(GATED, w)
            print(f"GATE CLEARED at step {step}: {m}", flush=True)

    w, hist = et.train_contrastive(
        texts,
        steps=steps,
        lr=lr,
        seed=500,
        snapshot_every=100,
        snapshot=on_snapshot,
        init_weights=init,
        **CFG,
    )
    et.save_checkpoint(LATEST, {k: v.astype(np.float32) for k, v in w.items()})
    final = et.eval_retrieval(
        {k: v.astype(np.float32) for k, v in w.items()}, texts, **eval_kw
    )
    print(f"final: {final}; best_mrr {state['best_mrr']:.3f}")


if __name__ == "__main__":
    main()
