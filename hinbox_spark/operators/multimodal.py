"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The decode step itself is STUBBED (no image/audio libraries in this
container — see the module-level DECODERS registry): `decode_media` either
raises NotImplementedError (strict mode) or applies a deterministic fake
decoder that parses the synthetic header written by `synth_media`. The
Spark-side plumbing — schema, batch shape, partition sizing, UDF signature —
is real and tested (tests/test_multimodal.py).

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


DECODERS = {"synth": _fake_decode}
# real decoders (absent in this container) would be registered as:
# DECODERS["image"] = lambda b: cv2.imdecode(...)   # noqa: ERA001


def decode_media(payload: bytes, decoder: str = "synth") -> dict:
    """Decode one payload. decoder='real' raises until a real library is
    registered — the Spark plumbing around it is unaffected."""
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
