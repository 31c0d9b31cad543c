"""Deterministic text embeddings + cosine similarity.

Replaces the reference's network embedding providers
(/root/reference/src/utils/embeddings/{cloud,local}.py, manager.py:361-441)
with a hashing-trick character-3-gram encoder: fixed dim, pure NumPy, no
model download, stable across processes — so merge decisions are exactly
reproducible on any executor. The fingerprint convention
("{model}:{dim}", reference manager.py:318-338) is preserved.

Cosine semantics follow the reference (similarity.py:80-98): returns 0.0 on
empty input, length mismatch, or zero norm.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

EMBEDDING_MODEL = "hashed-char3gram-v1"
EMBEDDING_DIM = 256


def _ngram_slots(text: str, dim: int) -> np.ndarray:
    """Signed hashing-trick counts over char 3-grams of the match-cased text."""
    vec = np.zeros(dim, dtype=np.float32)
    s = " " + text.lower() + " "
    for i in range(len(s) - 2):
        gram = s[i : i + 3]
        h = int.from_bytes(
            hashlib.blake2b(gram.encode("utf-8"), digest_size=8).digest(), "big"
        )
        slot = h % dim
        sign = 1.0 if (h >> 62) & 1 else -1.0
        vec[slot] += sign
    return vec


def embed_text(text: str, dim: int = EMBEDDING_DIM) -> np.ndarray:
    """L2-normalized hashed 3-gram vector; zero vector for empty text."""
    vec = _ngram_slots(str(text or ""), dim)
    norm = float(np.linalg.norm(vec))
    if norm > 0:
        vec /= norm
    return vec


def embed_series(texts: pd.Series, dim: int = EMBEDDING_DIM) -> pd.Series:
    """Series[str] → Series[list[float]] (pandas-UDF body)."""
    return texts.map(lambda t: embed_text(t, dim).tolist())


def cosine(a, b) -> float:
    """Cosine with the reference's degenerate-input rules
    (similarity.py:80-98): 0.0 on empty / length-mismatch / zero-norm."""
    va = np.asarray(a, dtype=np.float64)
    vb = np.asarray(b, dtype=np.float64)
    if va.size == 0 or vb.size == 0 or va.size != vb.size:
        return 0.0
    na, nb = float(np.linalg.norm(va)), float(np.linalg.norm(vb))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(np.dot(va, vb) / (na * nb))


def cosine_series(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched cosine over two array<float> columns (pandas-UDF body)."""
    return pd.Series(
        [cosine(x, y) for x, y in zip(a, b)], dtype=np.float64
    )


def fingerprint(model: str = EMBEDDING_MODEL, dim: int = EMBEDDING_DIM) -> str:
    """'{model}:{dim}' fingerprint (reference: manager.py:318-338)."""
    return f"{model}:{dim}"
