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
