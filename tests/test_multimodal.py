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
