"""Train and ship the mini-encoder checkpoints (one-shot, offline).

Trains the two configurations the engine instantiates — the default
64-dim encoder and the 32-dim registry-entry config — on the sf0.1
documents corpus with the span-pair InfoNCE objective
(functions/encoder_train.py), evaluates span-holdout retrieval, and
writes the .npz checkpoints into vectordb_light_spark/assets/ where
MiniTransformerEmbedder auto-loads them (weights_mode="pretrained").

    python tools/train_mini_encoder.py [--steps N]

No Spark needed: the corpus fits driver-side and training is numpy.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from vectordb_light_spark.functions import encoder_train as et  # noqa: E402

CORPUS = "/root/testdata/sf0.1/documents.parquet"

CONFIGS = [
    dict(dim=32, n_layers=2, n_heads=4, max_seq=64, steps=2000, lr=1.5e-3),
    dict(dim=64, n_layers=2, n_heads=4, max_seq=128, steps=1200, lr=1.5e-3),
    # r4 capacity notch — measured NEGATIVE, not shipped (ANN_EVAL.md
    # has the full table): neither d128 depth clears the shipping gate
    # within a round budget. 4-layer: chance loss at step 400,
    # retrieval below seeded (0.085 vs 0.122 MRR), stopped. 2-layer at
    # this config (1250 steps incl. a warm restart): loss ~4.01,
    # retrieval below seeded; a 3e-3 hedge reached mrr 0.161 (1.3x
    # seeded — best d128 point, still far from d64's 0.377). Plateau
    # escape grows with width AND depth; budget >=3000 steps before
    # re-attempting. Config kept for reproducibility; the gate test
    # skips until a checkpoint actually clears the bar.
    dict(dim=128, n_layers=2, n_heads=4, max_seq=128, steps=1200, lr=1.5e-3),
]


def main() -> None:
    steps_override = None
    if "--steps" in sys.argv:
        steps_override = int(sys.argv[sys.argv.index("--steps") + 1])
    only_dim = None
    if "--only-dim" in sys.argv:
        only_dim = int(sys.argv[sys.argv.index("--only-dim") + 1])
    texts = pq.read_table(CORPUS, columns=["text"]).column("text").to_pylist()
    print(f"corpus: {len(texts)} docs")
    for cfg in CONFIGS:
        if only_dim is not None and cfg["dim"] != only_dim:
            continue
        cfg = dict(cfg)
        if steps_override is not None:
            cfg["steps"] = steps_override
        print(f"\n== training {cfg}", flush=True)
        steps, lr = cfg.pop("steps"), cfg.pop("lr")
        w, hist = et.train_contrastive(texts, steps=steps, lr=lr, **cfg)
        w32 = {k: v.astype(np.float32) for k, v in w.items()}
        metrics = et.eval_retrieval(
            w32,
            texts,
            n_layers=cfg["n_layers"],
            n_heads=cfg["n_heads"],
            max_seq=cfg["max_seq"],
        )
        base = et.eval_retrieval(
            et.seeded_weights(
                cfg["dim"], cfg["n_layers"], cfg["n_heads"], cfg["max_seq"]
            ),
            texts,
            n_layers=cfg["n_layers"],
            n_heads=cfg["n_heads"],
            max_seq=cfg["max_seq"],
        )
        path = et.checkpoint_path(
            cfg["dim"], cfg["n_layers"], cfg["n_heads"], cfg["max_seq"]
        )
        et.save_checkpoint(path, w32)
        print(
            f"loss {hist[0]:.3f} -> {hist[-1]:.3f} | "
            f"retrieval top1 {metrics['top1']:.3f} mrr {metrics['mrr']:.3f} "
            f"(seeded baseline top1 {base['top1']:.3f} mrr {base['mrr']:.3f}) "
            f"-> {path}"
        )


if __name__ == "__main__":
    main()
