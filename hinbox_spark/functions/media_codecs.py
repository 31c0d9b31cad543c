"""Pure-stdlib media codecs: PNG (zlib inflate + scanline unfilter) and WAV
(RIFF/PCM header parse). No image/audio libraries exist in this container,
so these retire the multimodal decode stub with real, dependency-free
decoders for two genuinely common formats — enough to drive the whole
decode → resize → feature-extract path on real bytes.

PNG support: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA); all five scanline filters (None/Sub/Up/Average/Paeth); multiple
IDAT chunks. Interlaced (Adam7) and palette images raise ValueError — the
caller's poison-pill handling (decode_ok=false rows) covers them.

WAV support: PCM (format 1) and IEEE float (format 3), any channel count /
sample rate; duration derived from the data chunk length.

Encoders exist so tests can synthesize real fixtures deterministically
(filter-0 PNG, 16-bit PCM WAV) without binary blobs in the repo.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ── PNG decode ───────────────────────────────────────────────────────────


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering → (height, width*bpp) uint8 matrix."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(line[x]) + int(left)) & 0xFF
        elif ftype == 2:  # Up
            out[y] = (line.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(out[y, x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                out[y, x] = (int(line[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def decode_png(payload: bytes) -> dict:
    """PNG bytes → {width, height, channels, pixels(np.uint8 HxWxC)}."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expected = height * (1 + width * channels)
    if len(raw) != expected:
        raise ValueError(f"PNG data length {len(raw)} != expected {expected}")
    mat = _unfilter(raw, width, height, channels)
    return {
        "width": int(width),
        "height": int(height),
        "channels": channels,
        "pixels": mat.reshape(height, width, channels),
    }


# ── PNG encode (test fixtures; filter 0 rows) ────────────────────────────


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, C) uint8 → PNG bytes. filter_type 0 (None) or 2 (Up) —
    enough to exercise both the trivial and a non-trivial unfilter path."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = []
    prev = np.zeros((w * c,), dtype=np.uint8)
    for y in range(h):
        line = pixels[y].reshape(-1)
        if filter_type == 0:
            rows.append(b"\x00" + line.tobytes())
        elif filter_type == 2:
            rows.append(
                b"\x02"
                + ((line.astype(np.int16) - prev.astype(np.int16)) % 256)
                .astype(np.uint8)
                .tobytes()
            )
        else:
            raise ValueError("encoder supports filter 0 or 2 only")
        prev = line
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )


# ── WAV decode / encode ──────────────────────────────────────────────────


def decode_wav(payload: bytes) -> dict:
    """WAV bytes → {sample_rate, channels, bits, duration_ms, samples}."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format not in (1, 3):  # PCM / IEEE float
        raise ValueError(f"unsupported WAV format {audio_format}")
    dtype = {8: np.uint8, 16: np.int16, 32: np.float32 if audio_format == 3 else np.int32}.get(bits)
    if dtype is None:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    samples = np.frombuffer(data, dtype=dtype)
    n_frames = len(samples) // max(1, channels)
    duration_ms = int(n_frames * 1000 / sample_rate) if sample_rate else 0
    return {
        "sample_rate": int(sample_rate),
        "channels": int(channels),
        "bits": int(bits),
        "duration_ms": duration_ms,
        "samples": samples,
    }


def encode_wav(samples: np.ndarray, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """int16 samples → 16-bit PCM WAV bytes (test fixtures)."""
    samples = samples.astype(np.int16)
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body
