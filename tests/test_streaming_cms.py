"""Streaming count-min sketch: the folded sketch must equal the one-shot
batch sketch over the same corpus (merge exactness across micro-batches),
survive epoch re-delivery without double-counting, and keep its one-sided
overestimate guarantee when queried."""

from __future__ import annotations

import pyspark.sql.functions as F

from hinbox_spark.operators.sketches import cms_estimate, count_min_sketch
from hinbox_spark.streaming.heavy_hitters import (
    StreamingCmsSink,
    run_streaming_heavy_hitters,
)

DEPTH, WIDTH = 4, 256


def _tokens(spark, sf="/root/testdata/sf0.001"):
    return (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
    )


def _cells(df) -> dict:
    return {(r["r"], r["b"]): r["cnt"] for r in df.collect()}


def test_streamed_sketch_equals_batch_sketch(spark, tmp_path):
    """Split the corpus into 3 file-sized micro-batches; the standing
    sketch after the stream drains must be cell-identical to one CMS
    built over the whole corpus at once."""
    toks = _tokens(spark)
    items_dir = str(tmp_path / "items")
    # three separate files → maxFilesPerTrigger=1 yields 3 micro-batches
    for i in range(3):
        toks.filter(F.abs(F.xxhash64("token")) % 3 == i).write.mode(
            "append"
        ).parquet(items_dir)

    sink = run_streaming_heavy_hitters(
        spark,
        items_dir,
        "token string",
        "token",
        str(tmp_path / "sketch"),
        str(tmp_path / "ckpt"),
        depth=DEPTH,
        width=WIDTH,
        max_files_per_trigger=1,
    )
    streamed = sink.current_sketch()
    assert streamed is not None
    want = _cells(count_min_sketch(toks, "token", depth=DEPTH, width=WIDTH))
    assert _cells(streamed) == want


def test_redelivered_epoch_does_not_double_count(spark, tmp_path):
    """Calling the sink twice with the same batch id (crash replay) must
    leave the sketch bit-identical — and a fresh sink over the same dir
    (driver restart) must also skip the replay."""
    toks = _tokens(spark).limit(500)
    sink = StreamingCmsSink(
        spark, str(tmp_path / "sk"), "token", depth=DEPTH, width=WIDTH
    )
    sink(toks, 0)
    once = _cells(sink.current_sketch())
    sink(toks, 0)  # same-process replay
    assert _cells(sink.current_sketch()) == once

    sink2 = StreamingCmsSink(  # restart-recovery replay
        spark, str(tmp_path / "sk"), "token", depth=DEPTH, width=WIDTH
    )
    sink2(toks, 0)
    assert _cells(sink2.current_sketch()) == once

    sink2(toks, 1)  # a genuinely new batch folds in
    doubled = _cells(sink2.current_sketch())
    assert sum(doubled.values()) == 2 * sum(once.values())


def test_estimates_from_streamed_sketch_upper_bound_truth(spark, tmp_path):
    toks = _tokens(spark)
    sink = StreamingCmsSink(
        spark, str(tmp_path / "sk"), "token", depth=DEPTH, width=WIDTH
    )
    sink(toks, 0)
    truth = (
        toks.groupBy("token")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("token"))
        .limit(10)
    )
    est = cms_estimate(
        sink.current_sketch(), truth, "token", depth=DEPTH, width=WIDTH
    ).collect()
    assert len(est) == 10
    for r in est:
        assert r["est_cnt"] >= r["true_cnt"]  # CMS never undercounts
