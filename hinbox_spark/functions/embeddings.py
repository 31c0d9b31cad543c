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



import numpy as np
import pandas as pd

EMBEDDING_MODEL = "hashed-char3gram-v2"
EMBEDDING_DIM = 256

# 64-bit multiplicative rolling-hash constants (splitmix-style odd numbers)
_K1 = np.uint64(0x9E3779B97F4A7C15)
_K2 = np.uint64(0xC2B2AE3D27D4EB4F)
_K3 = np.uint64(0x165667B19E3779F9)


def _ngram_slots(text: str, dim: int) -> np.ndarray:
    """Signed hashing-trick counts over char 3-grams of the lowercased text.

    Fully numpy-vectorized: the 3-gram hash is a wrapping uint64 polynomial
    over the UTF-8 bytes — ~1000× faster than a per-gram digest and equally
    deterministic across processes/platforms (uint64 wrap is well-defined)."""
    vec = np.zeros(dim, dtype=np.float32)
    b = np.frombuffer((" " + text.lower() + " ").encode("utf-8"), dtype=np.uint8)
    if b.size < 3:
        return vec
    a = b.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = a[:-2] * _K1 + a[1:-1] * _K2 + a[2:] * _K3
        h ^= h >> np.uint64(29)
        h *= _K1
        h ^= h >> np.uint64(32)
    slots = (h % np.uint64(dim)).astype(np.int64)
    signs = np.where((h >> np.uint64(63)).astype(bool), 1.0, -1.0).astype(np.float32)
    np.add.at(vec, slots, signs)
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


def dot_seq_udf():
    """Vectorized pandas UDF computing the dot product of two equal-length
    float vector columns with EXACTLY the operation sequence of the SQL
    expression

        aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE)*CAST(y AS
        DOUBLE)), 0.0D, (acc, x) -> acc + x)

    i.e. a strict left fold ((0 + x0·y0) + x1·y1) + … in float64. The
    accumulation loop runs over DIMENSIONS (so each pair's adds happen in
    array order, bit-identical to the interpreted fold — verified by an
    exact-equality pin in tests) while vectorizing across the row batch —
    the interpreted higher-order expression gets no codegen and measured
    ~25-40 µs/row, ~1 s per million pairs at 32 cores (r6). NULL on
    either side yields NULL, matching aggregate-over-null semantics.
    Rows within a batch must share one dimensionality (ragged batches
    raise — callers pass fixed-dim embedding columns)."""

    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _dot(ea: pd.Series, eb: pd.Series) -> pd.Series:
        mask = ea.notna() & eb.notna()
        out = pd.Series(np.nan, index=ea.index, dtype="float64")
        if mask.any():
            A = np.array(ea[mask].tolist(), dtype=np.float64)
            B = np.array(eb[mask].tolist(), dtype=np.float64)
            acc = np.zeros(len(A), dtype=np.float64)
            for j in range(A.shape[1]):
                acc += A[:, j] * B[:, j]
            out[mask] = acc
        return out

    return _dot


def fingerprint(model: str = EMBEDDING_MODEL, dim: int = EMBEDDING_DIM) -> str:
    """'{model}:{dim}' fingerprint (reference: manager.py:318-338)."""
    return f"{model}:{dim}"


def build_evidence(
    name: str,
    text: str,
    window_chars: int = 240,
    max_windows: int = 3,
    max_chars: int = 1500,
) -> str:
    """Deterministic evidence pseudo-profile (reference J1,
    mergers.py:577-705): up to `max_windows` non-overlapping windows of
    ±window_chars/2 around case-insensitive hits of `name` in `text`,
    joined and truncated to `max_chars`, prefixed with the name header.
    Falls back to the head of the article when the name never occurs."""
    text = text or ""
    win = window_chars // 2
    low_t, low_n = text.lower(), str(name or "").lower()
    windows: list[str] = []
    start = 0
    last_end = -1
    while len(windows) < max_windows and low_n:
        idx = low_t.find(low_n, start)
        if idx < 0:
            break
        lo, hi = max(0, idx - win), min(len(text), idx + len(low_n) + win)
        if lo > last_end:  # non-overlapping
            windows.append(text[lo:hi])
            last_end = hi
        start = idx + len(low_n)
    evidence = (" ... ".join(windows) if windows else text[:max_chars])[:max_chars]
    return f"{name}: {evidence}"
