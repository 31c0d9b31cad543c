"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The DECODERS registry carries both REAL decoders — pure-stdlib PNG
(zlib inflate + IHDR parse + scanline unfilter) and WAV (RIFF/PCM), see
functions/media_codecs.py, plus a format-sniffing 'real' dispatcher — and
a deterministic 'synth' decoder for the header written by `synth_media`
(the stand-in for formats whose libraries are absent in this container:
JPEG, MP4, ...). The Spark-side plumbing — schema, batch shape, partition
sizing, UDF signature, poison-pill tolerance — is shared by every decoder
and tested on real PNG/WAV bytes (tests/test_multimodal.py).

Design notes for 100 TB of media:
- binary payloads ride in their own column so column pruning skips them for
  metadata-only queries;
- decode is mapInPandas (cardinality-preserving) with small Arrow batches —
  `spark.sql.execution.arrow.maxRecordsPerBatch` bounds per-batch memory
  (payloads are MBs, not rows, so batch size matters more than row count);
- feature extraction emits fixed-size float arrays → the ANN/dedup
  operators above apply unchanged.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

_MAGIC = b"SYNM"  # synthetic media header: MAGIC | kind(1) | w | h | dur


def synth_media(media_id: int, kind: str = "image") -> dict:
    """Deterministic fake media blob with a parseable header (stands in for
    a real JPEG/WAV; payload bytes derive from media_id)."""
    w, h, dur = 64 + (media_id % 8) * 16, 48 + (media_id % 5) * 16, 0
    if kind == "audio":
        w = h = 0
        dur = 1000 + (media_id % 10) * 500
    body = (np.arange(256, dtype=np.uint8) * ((media_id % 251) + 1) % 256).tobytes()
    payload = _MAGIC + kind[:1].encode() + struct.pack("<iii", w, h, dur) + body
    return {
        "media_id": media_id,
        "kind": kind,
        "mime": {"image": "image/synth", "audio": "audio/synth"}.get(kind, "application/octet-stream"),
        "width": w,
        "height": h,
        "duration_ms": dur,
        "payload": payload,
    }


def synth_media_df(spark, n: int = 100) -> DataFrame:
    rows = [synth_media(i, "image" if i % 3 else "audio") for i in range(n)]
    return spark.createDataFrame(
        [tuple(r[k] for k in
               ("media_id", "kind", "mime", "width", "height", "duration_ms", "payload"))
         for r in rows],
        MEDIA_SCHEMA_DDL,
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: parses the SYNM header. A real
    deployment registers cv2/PIL/librosa decoders here."""
    if payload is None or payload[:4] != _MAGIC:
        raise ValueError("unrecognized media payload")
    kind = {b"i": "image", b"a": "audio"}.get(payload[4:5], "unknown")
    w, h, dur = struct.unpack("<iii", payload[5:17])
    body = np.frombuffer(payload[17:], dtype=np.uint8)
    return {"kind": kind, "width": w, "height": h, "duration_ms": dur, "body": body}


def _png_decode(payload: bytes) -> dict:
    """Real PNG decode (pure stdlib: functions/media_codecs.py — zlib
    inflate + IHDR parse + scanline unfilter). Body is the raw pixel bytes,
    so the downstream histogram/resize/frame plumbing applies unchanged."""
    from hinbox_spark.functions.media_codecs import decode_png

    d = decode_png(payload)
    return {
        "kind": "image",
        "width": d["width"],
        "height": d["height"],
        "duration_ms": 0,
        "body": d["pixels"].reshape(-1),
    }


def _wav_decode(payload: bytes) -> dict:
    """Real WAV decode (RIFF/PCM header parse). Body is the PCM byte
    stream viewed as uint8 — the shared feature/frames contract."""
    from hinbox_spark.functions.media_codecs import decode_wav

    d = decode_wav(payload)
    return {
        "kind": "audio",
        "width": 0,
        "height": 0,
        "duration_ms": d["duration_ms"],
        "body": d["samples"].view(np.uint8),
    }


def _real_decode(payload: bytes) -> dict:
    """Format-sniffing real decoder: PNG signature / RIFF magic → the
    matching stdlib codec; anything else is a decode failure (poison-pill
    rows, decode_ok=false)."""
    if payload is None:
        raise ValueError("null media payload")
    head = bytes(payload[:8])
    if head.startswith(b"\x89PNG"):
        return _png_decode(payload)
    if head.startswith(b"RIFF"):
        return _wav_decode(payload)
    raise ValueError("unrecognized media format")


DECODERS = {
    "synth": _fake_decode,
    "png": _png_decode,
    "wav": _wav_decode,
    "real": _real_decode,
}
# further real decoders (JPEG/MP4 — libs absent in this container) would be
# registered the same way: DECODERS["jpeg"] = lambda b: cv2.imdecode(...)


def decode_media(payload: bytes, decoder: str = "synth") -> dict:
    """Decode one payload. Unregistered decoder names raise — the Spark
    plumbing around the registry is unaffected."""
    fn = DECODERS.get(decoder)
    if fn is None:
        raise NotImplementedError(
            f"decoder '{decoder}' not available in this environment; "
            "register it in hinbox_spark.operators.multimodal.DECODERS"
        )
    return fn(payload)


FEATURE_SCHEMA_DDL = (
    "media_id long, kind string, feat array<float>, feat_dim int, decode_ok boolean"
)


def extract_features(media: DataFrame, feat_dim: int = 32,
                     decoder: str = "synth") -> DataFrame:
    """payload → fixed-size feature vector (histogram of decoded bytes).

    mapInPandas so each Arrow batch decodes in one Python hop; failures
    yield decode_ok=false rows instead of failing the task (poison-pill
    media must not kill a 100 TB job)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                try:
                    d = decode_media(bytes(payload), decoder)
                    hist, _ = np.histogram(d["body"], bins=feat_dim, range=(0, 256))
                    tot = hist.sum() or 1
                    feat = (hist / tot).astype(np.float32).tolist()
                    out.append((int(mid), kind, feat, feat_dim, True))
                except Exception:
                    out.append((int(mid), kind, [0.0] * feat_dim, feat_dim, False))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "feat", "feat_dim", "decode_ok"]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _extract, FEATURE_SCHEMA_DDL
    )


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must NOT read the payload column (column
    pruning keeps the scan cheap; asserted in tests via the plan)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_ms").alias("avg_duration_ms"),
        F.sum(F.length("mime")).alias("mime_bytes"),
    )

RESIZED_SCHEMA_DDL = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary, resize_ok boolean"
)


def resize_media(media: DataFrame, target_w: int, target_h: int,
                 decoder: str = "synth") -> DataFrame:
    """payload → payload resized to (target_w, target_h) — the standard
    image-normalization pass before feature extraction / training.

    The pixel resample itself is the stubbed decode step (deterministic
    nearest-neighbor over the synthetic body; a real deployment swaps in
    cv2.resize via DECODERS): what is real and tested is the Spark
    plumbing — cardinality-preserving mapInPandas over Arrow batches,
    payload re-encoded with the updated header so downstream decoders see
    a consistent blob, audio rows passed through untouched (resize is a
    no-op for kind='audio'), and poison-pill payloads yielding
    resize_ok=false rows instead of killing the task."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    if row.kind != "image":
                        out.append(tuple(row) + (True,))
                        continue
                    d = decode_media(bytes(row.payload), decoder)
                    if decoder in ("png", "real") and d["width"] > 0:
                        # real path: nearest-neighbor resample of the actual
                        # pixel grid, re-encoded as a real PNG so downstream
                        # decoders read the resized blob like any other
                        from hinbox_spark.functions.media_codecs import encode_png

                        c = len(d["body"]) // (d["width"] * d["height"])
                        px = d["body"].reshape(d["height"], d["width"], c)
                        ys = (np.arange(target_h) * d["height"] // target_h)
                        xs = (np.arange(target_w) * d["width"] // target_w)
                        payload = encode_png(px[ys][:, xs])
                    else:
                        body = d["body"]
                        n = max(1, target_w * target_h // 64)
                        idx = (np.arange(n) * max(1, len(body)) // n) % max(1, len(body))
                        resized = body[idx] if len(body) else body
                        payload = (
                            _MAGIC + b"i"
                            + struct.pack("<iii", target_w, target_h, 0)
                            + resized.tobytes()
                        )
                    out.append((row.media_id, row.kind, row.mime, target_w,
                                target_h, row.duration_ms, payload, True))
                except Exception:
                    out.append((row.media_id, row.kind, row.mime, row.width,
                                row.height, row.duration_ms, row.payload, False))
            yield pd.DataFrame(
                out,
                columns=["media_id", "kind", "mime", "width", "height",
                         "duration_ms", "payload", "resize_ok"],
            )

    return media.select(
        "media_id", "kind", "mime", "width", "height", "duration_ms", "payload"
    ).mapInPandas(_resize, RESIZED_SCHEMA_DDL)


FRAME_SCHEMA_DDL = (
    "media_id long, frame_idx int, ts_ms int, frame binary, decode_ok boolean"
)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 32, decoder: str = "synth") -> DataFrame:
    """Temporal frame sampling — one row per sampled frame (images emit a
    single frame at ts 0; audio/video emit one per `every_ms` of
    duration). The per-media fan-out is HARD-CAPPED at `max_frames` so a
    corrupt duration header can never explode one task's output (the cap
    is the multimodal analogue of the dedup bucket caps — bounded fan-out
    by construction, not by hope). Frame bytes are a deterministic slice
    of the decoded body (the stubbed stand-in for a real keyframe
    decoder); schema/batching/poison-pill semantics are the real,
    tested plumbing."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                try:
                    d = decode_media(bytes(payload), decoder)
                    body = d["body"]
                    n = 1 if d["duration_ms"] <= 0 else min(
                        max_frames, 1 + d["duration_ms"] // every_ms
                    )
                    n = max(1, min(int(n), max_frames))
                    step = max(1, len(body) // n)
                    for i in range(n):
                        sl = body[i * step:(i + 1) * step]
                        out.append((int(mid), i, int(i * every_ms),
                                    sl.tobytes(), True))
                except Exception:
                    out.append((int(mid), 0, 0, b"", False))
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "ts_ms", "frame", "decode_ok"],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _sample, FRAME_SCHEMA_DDL
    )
