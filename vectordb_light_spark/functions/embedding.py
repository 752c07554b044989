"""The embedding stage (SURVEY §2.4 E1-E10): text → L2-normalized
float32 vectors via ``mapInPandas``.

Reference pipeline: tokenize in batches (E1), sort by token length so
padded batches are near-rectangular (E2, reference
stage_tokenize.py:103-104), pad (E3), forward pass + L2-normalize (E5,
embedding_models.py:373-475, normalize at :437), scatter back (E6).
In Spark the whole thing is ONE ``mapInPandas`` stage: Arrow batches
in, the encoder loaded once per executor (not per batch), vectors out.
E2's length-sort becomes ``sortWithinPartitions(length(text))`` before
the stage — batches inside a partition then have near-uniform lengths;
E6's un-sort is unnecessary because rows carry their ids (Spark rows
are unordered between stages anyway).

Two encoders behind one interface:

  HashingEmbedder — deterministic feature-hashing projection
    (hash each token to a bucket ± sign, L2-normalize). No model
    download, identical on every executor and every run: the test
    double SURVEY §5.3 calls for. Also genuinely useful at scale as a
    cheap locality-ish signature.

  SentenceTransformerEmbedder — real model encode, import-gated
    (sentence-transformers is not in this container). Family
    instruction prompts for queries (E7, reference
    embedding_models.py:49-63) and the reference's L2-normalize
    invariant (embedding_models.py:437) are applied here.

The write-path invariant both guarantee: every stored vector is
L2-normalized float32, so cosine ≡ dot product on the read path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 64

#: (dim, seed) → {token: (bucket, sign)} — per-process memo for the
#: hashing encoder (vocabulary-bounded).
_TOKEN_MEMO: dict[tuple[int, int], dict[str, tuple[int, float]]] = {}


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HashingEmbedder:
    """Deterministic bag-of-tokens feature hashing → unit vector.

    encode() is pure: blake2b(token) picks (bucket, sign); counts
    accumulate; the result is L2-normalized float32. Similar token
    multisets ⇒ high cosine, disjoint ⇒ ~orthogonal — enough structure
    for meaningful top-k tests without any model asset.
    """

    dim: int = DEFAULT_DIM
    seed: int = 0

    @property
    def spec(self) -> dict:
        return {"encoder": "hashing", "dim": self.dim, "seed": self.seed}

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        salt = str(self.seed).encode()
        # Token hashes memoized per (dim, seed): corpus vocabulary is
        # vastly smaller than token count, so the blake2b runs once
        # per distinct token per process instead of once per
        # occurrence (~10× on natural text).
        memo = _TOKEN_MEMO.setdefault((self.dim, self.seed), {})
        for i, text in enumerate(texts):
            for tok in (text or "").lower().split():
                hit = memo.get(tok)
                if hit is None:
                    h = int.from_bytes(
                        hashlib.blake2b(
                            tok.encode(), digest_size=8, salt=salt
                        ).digest(),
                        "big",
                    )
                    hit = (h % self.dim, 1.0 if (h >> 62) & 1 else -1.0)
                    memo[tok] = hit
                out[i, hit[0]] += hit[1]
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        np.maximum(norms, 1e-12, out=norms)
        return (out / norms).astype(np.float32)


#: Query instruction prompts per model family (E7, reference
#: embedding_models.py:58-63).
_FAMILY_PROMPTS = {
    "qwen": (
        "Instruct: Given a web search query, retrieve relevant passages "
        "that answer the query\nQuery:"
    ),
    "bge": "Represent this sentence for searching relevant passages: ",
}


def family_of(model_name: str) -> str:
    """Model-family detection (reference embedding_models.py:49-55)."""
    name = model_name.lower()
    if "qwen" in name:
        return "qwen"
    if "bge" in name:
        return "bge"
    return "generic"


class SentenceTransformerEmbedder:
    """Real-model encoder — import-gated on sentence-transformers.

    Applies the reference's flat query normalization + family prompt
    for queries (embedding_models.py:66-85,477-487) and L2-normalizes
    every output (:437).
    """

    def __init__(self, model_name: str, dim: int | None = None):
        from sentence_transformers import SentenceTransformer  # gated

        self._model = SentenceTransformer(model_name)
        self.model_name = model_name
        self.dim = dim or self._model.get_sentence_embedding_dimension()

    @property
    def spec(self) -> dict:
        return {"encoder": "sentence-transformers", "model": self.model_name, "dim": self.dim}

    def encode(self, texts: list[str]) -> np.ndarray:
        vecs = self._model.encode(
            texts, normalize_embeddings=True, convert_to_numpy=True
        )
        return np.ascontiguousarray(vecs, dtype=np.float32)


def make_embedder(spec: dict):
    """Rebuild an encoder from its stored spec (the _meta sidecar
    persists this so the read path embeds queries with the SAME model
    the database was built with — reference vector_db_query.py:152)."""
    kind = spec.get("encoder", "hashing")
    if kind == "hashing":
        return HashingEmbedder(dim=int(spec.get("dim", DEFAULT_DIM)), seed=int(spec.get("seed", 0)))
    if kind == "sentence-transformers":
        return SentenceTransformerEmbedder(spec["model"], dim=spec.get("dim"))
    raise ValueError(f"unknown encoder spec: {spec!r}")


# ---------------------------------------------------------------------------
# The mapInPandas stage
# ---------------------------------------------------------------------------

#: Per-process encoder cache: executors reuse one model across Arrow
#: batches and tasks (reference loads the model once per run,
#: embedding_models.py:373-405; per-executor is the Spark analogue).
_ENCODER_CACHE: dict[str, object] = {}


def _cached_encoder(spec: dict):
    key = repr(sorted(spec.items()))
    enc = _ENCODER_CACHE.get(key)
    if enc is None:
        enc = make_embedder(spec)
        _ENCODER_CACHE[key] = enc
    return enc


def embed_documents(
    df: DataFrame,
    spec: dict,
    *,
    text_col: str = "text",
    out_col: str = "vector",
    length_sort: bool = True,
    encode_batch_size: int = 256,
    rebalance: bool = True,
) -> DataFrame:
    """Add an L2-normalized float32 ``array<float>`` embedding column.

    One mapInPandas stage; all input columns pass through. The encoder
    is resolved per executor process from ``spec`` and cached. With
    ``length_sort`` (E2) rows are pre-sorted within partitions by text
    length so real transformer batches pad near-rectangularly; for the
    hashing encoder it's a no-op cost-wise either way.

    ``rebalance`` widens narrow inputs (e.g. one small parquet file →
    one partition) to the cluster's full core count before the embed
    stage: encoding is the expensive stage of the write path, and a
    narrow scan would otherwise serialize it on one core. The shuffle
    moves only the pre-embed rows (id + text), never vectors.
    """
    in_schema = df.schema
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema)
    out_schema = f"{fields}, `{out_col}` array<float>"

    if rebalance and not df.isStreaming:
        target = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)

    if length_sort:
        df = df.sortWithinPartitions(F.length(text_col).desc())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = _cached_encoder(spec)
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            vecs: list[np.ndarray] = []
            for i in range(0, len(texts), encode_batch_size):
                vecs.append(enc.encode(texts[i : i + encode_batch_size]))
            mat = np.vstack(vecs) if vecs else np.zeros((0, enc.dim), np.float32)
            out = pdf.copy()
            out[out_col] = [row for row in mat]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def embed_query(text: str, spec: dict) -> list[float]:
    """Driver-side single-text embed with flat normalization and the
    model family's instruction prompt (Q1/E7 — reference
    vector_db_query.py:152-159, embedding_models.py:477-487). No Spark
    job for one vector."""
    from vectordb_light_spark.functions.text import normalize_query_text_py

    enc = _cached_encoder(spec)
    prompt = ""
    model_name = spec.get("model", "")
    if model_name:
        prompt = _FAMILY_PROMPTS.get(family_of(model_name), "")
    normalized = normalize_query_text_py(text)
    return [float(x) for x in enc.encode([prompt + normalized])[0]]
