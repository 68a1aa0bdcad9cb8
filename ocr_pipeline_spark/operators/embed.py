"""Text -> embedding via the hashing trick (feature-hashed character
n-grams), closing the corpus -> embedding -> ANN/semdedup loop without
any model artifact.

This is the classic public featurization (Weinberger et al. 2009,
"Feature Hashing for Large Scale Multitask Learning"; scikit-learn's
HashingVectorizer): each character n-gram hashes to one of `dim`
buckets with a ±1 sign bit, the per-document bucket sums are
L2-normalized, and cosine over the result approximates n-gram Jaccard
similarity.  Reference analog: the description/classification vectors
the reference's VLM produces per page (stage2_ocr.py) — here replaced
by a deterministic, engine-portable featurizer so the downstream
ANN / SemDeDup / quantization operators run off real text-derived
vectors instead of fixture embeddings.

Determinism contract: the n-gram hash is a pure integer recurrence
(FNV-prime polynomial over UTF-8 bytes + a splitmix64-style finalizer,
all wrapping uint64) — no Python `hash()`, no platform dependence.
The same function is the single-process witness twin
(scripts/gen_witness.py) and the per-row body of the Arrow batch
kernel, so distributed == local is exact, not approximate.

Scale shape: one narrow mapInPandas over (doc_id, text) — no shuffle,
no state; the embedding column feeds the existing bucketed ANN /
SemDeDup paths unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

_FNV = np.uint64(1099511628211)
_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)
_S33 = np.uint64(33)

DIM = 64
NGRAM = 3
QUANT = 1_000_000  # 6-dp integer quantization for the md5 witness


def ngram_hashes(text: str, n: int = NGRAM) -> np.ndarray:
    """uint64 hash per character n-gram (over UTF-8 bytes), fully
    vectorized: polynomial rolling accumulate + 64-bit finalizer so
    bucket (low bits) and sign (top bit) are well mixed."""
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    m = len(b) - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = np.zeros(m, dtype=np.uint64)
        for j in range(n):
            h = h * _FNV + b[j : j + m].astype(np.uint64)
        h ^= h >> _S33
        h *= _MIX1
        h ^= h >> _S33
        h *= _MIX2
        h ^= h >> _S33
    return h


def embed_text(text: str, dim: int = DIM, n: int = NGRAM) -> np.ndarray:
    """Deterministic L2-normalized hashed n-gram embedding (float64).
    Documents shorter than n characters embed to the zero vector."""
    h = ngram_hashes(text, n)
    v = np.zeros(dim, dtype=np.float64)
    if len(h):
        buckets = (h % np.uint64(dim)).astype(np.int64)
        signs = np.where(h >> np.uint64(63), -1.0, 1.0)
        np.add.at(v, buckets, signs)
        norm = np.linalg.norm(v)
        if norm > 0.0:
            v /= norm
    return v


def embedding_md5(v: np.ndarray, quant: int = QUANT) -> str:
    """Witness hash of an embedding: md5 over the space-joined 6-dp
    integer quantization (round-half-even, same as the witness twin) —
    float-formatting-proof across engines."""
    q = np.rint(v * quant).astype(np.int64)
    return hashlib.md5(" ".join(map(str, q.tolist())).encode()).hexdigest()


def embed_kernel(
    dim: int = DIM, n: int = NGRAM, quant: int = QUANT
):
    """Arrow batch kernel for mapInPandas over (doc_id, text):
    emits (doc_id, embedding array<double>, emb_md5).  Per-row body is
    the same pure embed_text the witness twin calls — batch shape
    cannot change the result."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id"]].copy()
            embs: list[list[float]] = []
            md5s: list[str] = []
            for t in pdf["text"]:
                v = embed_text(t or "", dim, n)
                embs.append([float(x) for x in v])
                md5s.append(embedding_md5(v, quant))
            out["embedding"] = embs
            out["emb_md5"] = md5s
            yield out

    return kernel


EMBED_DDL = "doc_id long, embedding array<double>, emb_md5 string"
