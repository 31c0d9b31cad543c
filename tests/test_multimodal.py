"""Multimodal plumbing: binary payload columns, stubbed decode, feature
extraction batch shape, metadata column pruning."""

import pytest

from hinbox_spark.operators.multimodal import (
    decode_media,
    extract_features,
    media_metadata_stats,
    synth_media,
    synth_media_df,
)


def test_decode_real_is_stubbed():
    blob = synth_media(1)["payload"]
    with pytest.raises(NotImplementedError):
        decode_media(blob, decoder="real-jpeg")


def test_feature_extraction(spark):
    media = synth_media_df(spark, 30)
    feats = extract_features(media, feat_dim=32).collect()
    assert len(feats) == 30
    assert all(r["decode_ok"] for r in feats)
    assert all(len(r["feat"]) == 32 for r in feats)
    # histogram features are normalized
    assert all(abs(sum(r["feat"]) - 1.0) < 1e-3 for r in feats)


def test_poison_pill_media_survives(spark):
    media = synth_media_df(spark, 5).unionByName(
        spark.createDataFrame(
            [(999, "image", "image/synth", 1, 1, 0, b"GARBAGE")],
            "media_id long, kind string, mime string, width int, height int, "
            "duration_ms int, payload binary",
        )
    )
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(rows) == 6
    assert rows[999]["decode_ok"] is False
    assert rows[0]["decode_ok"] is True


def test_metadata_stats_prune_payload(spark, tmp_path):
    path = str(tmp_path / "media")
    synth_media_df(spark, 20).write.parquet(path)
    media = spark.read.parquet(path)
    stats = media_metadata_stats(media)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan, "payload column must be pruned from the scan"
    out = {r["kind"]: r["n"] for r in stats.collect()}
    assert out["image"] + out["audio"] == 20


def test_resize_media(spark):
    """Images re-encode with the target dimensions and remain decodable;
    audio passes through untouched; a poison payload yields
    resize_ok=false instead of failing the task."""
    import pyspark.sql.functions as F

    from hinbox_spark.operators.multimodal import (
        decode_media, resize_media, synth_media_df,
    )

    media = synth_media_df(spark, 30)
    out = resize_media(media, 32, 32).collect()
    assert len(out) == 30  # cardinality-preserving
    for r in out:
        assert r["resize_ok"]
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (32, 32)
            d = decode_media(bytes(r["payload"]))  # still a valid blob
            assert (d["width"], d["height"]) == (32, 32)
        else:  # audio untouched
            assert r["duration_ms"] >= 1000

    poisoned = media.withColumn(
        "payload",
        F.when(F.col("media_id") == 4, F.lit(b"junk")).otherwise(F.col("payload")),
    )
    rows = {r["media_id"]: r for r in resize_media(poisoned, 32, 32).collect()}
    assert rows[4]["resize_ok"] is False
    assert sum(not r["resize_ok"] for r in rows.values()) == 1


def test_sample_frames_capped_fanout(spark):
    """One frame per every_ms of duration, images exactly one frame, and
    the per-media fan-out never exceeds max_frames even when the
    duration header claims hours."""
    import pyspark.sql.functions as F

    from hinbox_spark.operators.multimodal import sample_frames, synth_media_df

    media = synth_media_df(spark, 30)
    frames = sample_frames(media, every_ms=1000, max_frames=32).toPandas()
    meta = {r["media_id"]: r for r in media.select(
        "media_id", "kind", "duration_ms").collect()}
    by_media = frames.groupby("media_id").size().to_dict()
    for mid, n in by_media.items():
        m = meta[mid]
        if m["kind"] == "image":
            assert n == 1
        else:
            assert n == min(32, 1 + m["duration_ms"] // 1000)
    # cap: forge a duration of 10 hours -> still max_frames rows
    forged = media.filter(F.col("kind") == "audio").limit(1)
    from hinbox_spark.operators.multimodal import _MAGIC
    import struct as _s
    big = forged.collect()[0]
    payload = _MAGIC + b"a" + _s.pack("<iii", 0, 0, 36_000_000) + bytes(256)
    one = spark.createDataFrame(
        [(big["media_id"], "audio", payload)],
        "media_id long, kind string, payload binary",
    )
    n = sample_frames(one, every_ms=1000, max_frames=32).count()
    assert n == 32
    # determinism
    again = sample_frames(media, every_ms=1000, max_frames=32).toPandas()
    assert sorted(map(tuple, frames[["media_id", "frame_idx"]].itertuples(index=False))) == \
        sorted(map(tuple, again[["media_id", "frame_idx"]].itertuples(index=False)))


# ── real stdlib codecs (functions/media_codecs.py) ───────────────────────


def _real_media_df(spark, n_png=6, n_wav=3):
    import numpy as np

    from hinbox_spark.functions.media_codecs import encode_png, encode_wav
    from hinbox_spark.operators.multimodal import MEDIA_SCHEMA_DDL

    rows = []
    for i in range(n_png):
        rng = np.random.RandomState(i)
        w, h = 8 + i, 6 + i
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = encode_png(px, filter_type=2 if i % 2 else 0)
        rows.append((i, "image", "image/png", w, h, 0, blob))
    for i in range(n_wav):
        sr = 8000
        samples = (np.sin(np.arange(sr * (i + 1)) / 7.0) * 15000).astype(np.int16)
        blob = encode_wav(samples, sr, 1)
        rows.append((100 + i, "audio", "audio/wav", 0, 0, (i + 1) * 1000, blob))
    return spark.createDataFrame(rows, MEDIA_SCHEMA_DDL)


def test_png_wav_codecs_roundtrip():
    import numpy as np

    from hinbox_spark.functions.media_codecs import (
        decode_png, decode_wav, encode_png, encode_wav,
    )

    rng = np.random.RandomState(42)
    for shape in [(5, 4, 3), (8, 8, 1), (6, 3, 4), (7, 5, 2)]:
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        for ft in (0, 2):
            d = decode_png(encode_png(px, filter_type=ft))
            assert (d["pixels"] == px).all()
            assert (d["width"], d["height"], d["channels"]) == (
                shape[1], shape[0], shape[2],
            )
    s = (np.sin(np.arange(16000) / 10) * 20000).astype(np.int16)
    w = decode_wav(encode_wav(s, 8000, 1))
    assert w["sample_rate"] == 8000 and w["bits"] == 16
    assert abs(w["duration_ms"] - 2000) <= 1
    assert (w["samples"] == s).all()


def test_png_all_filter_types_unfilter():
    """decode_png must invert every PNG filter (None/Sub/Up/Average/Paeth);
    the forward filterer here is an independent reference implementation."""
    import struct
    import zlib

    import numpy as np

    from hinbox_spark.functions.media_codecs import (
        PNG_SIGNATURE, _chunk, decode_png,
    )

    def forward_filter(px, ftype):
        h, w, c = px.shape
        stride = w * c
        flat = px.reshape(h, stride).astype(np.int16)
        out = bytearray()
        for y in range(h):
            line = flat[y]
            out.append(ftype)
            for x in range(stride):
                left = int(line[x - c]) if x >= c else 0
                up = int(flat[y - 1][x]) if y > 0 else 0
                ul = int(flat[y - 1][x - c]) if (y > 0 and x >= c) else 0
                if ftype == 0:
                    v = line[x]
                elif ftype == 1:
                    v = line[x] - left
                elif ftype == 2:
                    v = line[x] - up
                elif ftype == 3:
                    v = line[x] - (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    v = line[x] - pred
                out.append(int(v) % 256)
        return bytes(out)

    px = np.random.RandomState(3).randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for ft in range(5):
        raw = forward_filter(px, ft)
        ihdr = struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0)
        blob = (
            PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        assert (decode_png(blob)["pixels"] == px).all(), f"filter {ft}"


def test_real_decoder_e2e_decode_resize_features(spark):
    """Real PNG/WAV bytes through the full Spark path: sniffing decode →
    resize (real PNG re-encode) → feature extraction; poison pill
    (truncated PNG) yields ok=false rows, never a task failure."""
    import numpy as np

    from hinbox_spark.functions.media_codecs import decode_png
    from hinbox_spark.operators.multimodal import resize_media, sample_frames

    media = _real_media_df(spark, n_png=6, n_wav=3)

    feats = extract_features(media, feat_dim=16, decoder="real").collect()
    assert len(feats) == 9 and all(r["decode_ok"] for r in feats)
    assert all(abs(sum(r["feat"]) - 1.0) < 1e-3 for r in feats)

    resized = resize_media(media, 4, 4, decoder="real").collect()
    assert all(r["resize_ok"] for r in resized)
    for r in resized:
        if r["kind"] == "image":
            d = decode_png(bytes(r["payload"]))  # re-encoded blob IS a PNG
            assert (d["width"], d["height"]) == (4, 4)

    frames = sample_frames(media, every_ms=500, max_frames=8,
                           decoder="real").toPandas()
    per_media = frames.groupby("media_id").size()
    assert all(per_media[mid] == 1 for mid in range(6))  # images: one frame
    assert per_media[100] == 3  # 1000ms audio @500ms → 1 + 1000//500
    assert per_media.max() <= 8

    # poison pill: a PNG truncated mid-IDAT and random garbage
    from hinbox_spark.operators.multimodal import MEDIA_SCHEMA_DDL

    bad_blob = bytes(media.filter("media_id = 0").first()["payload"])[:40]
    bad = spark.createDataFrame(
        [(900, "image", "image/png", 8, 6, 0, bad_blob),
         (901, "image", "image/png", 8, 6, 0, b"\x00garbage\x00" * 4)],
        MEDIA_SCHEMA_DDL,
    )
    out = extract_features(bad, feat_dim=16, decoder="real").collect()
    assert [r["decode_ok"] for r in out] == [False, False]
    assert np.allclose([sum(r["feat"]) for r in out], 0.0)
