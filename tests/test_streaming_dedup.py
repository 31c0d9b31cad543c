"""Streaming exact dedup (streaming/dedup.py): bounded-state
dropDuplicatesWithinWatermark semantics — within-batch dedup, cross-run
seen-set survival via the checkpoint, and state EXPIRY once the watermark
passes a key (the property that keeps state bounded at 10^12 docs)."""

import datetime

from hinbox_spark.streaming.dedup import stream_dedup_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_stream_dedup_within_and_across_runs(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def read_ids():
        return sorted(r["doc_id"] for r in spark.read.parquet(out_dir).collect())

    # run 1: duplicate content within one micro-batch is collapsed to one
    # surviving row; distinct content passes through.
    _docs(spark, [
        (1, "alpha body", _ts(10, 0)),
        (2, "beta body", _ts(10, 0)),
        (3, "alpha body", _ts(10, 30)),  # dup of 1, same batch
    ]).write.mode("append").parquet(docs_dir)
    stream_dedup_documents(spark, docs_dir, out_dir, ckpt, watermark_delay="1 hour")
    out1 = read_ids()
    assert len(out1) == 2
    assert 2 in out1
    assert (1 in out1) != (3 in out1)  # exactly one of the alpha pair

    # run 2: the checkpoint restores the seen-set — a cross-run duplicate
    # whose event time is within the watermark delay of the first
    # occurrence is dropped; new content is emitted.
    _docs(spark, [
        (4, "alpha body", _ts(10, 45)),   # cross-run dup, within delay
        (5, "gamma body", _ts(13, 0)),    # new; advances watermark to 12:00
    ]).write.mode("append").parquet(docs_dir)
    stream_dedup_documents(spark, docs_dir, out_dir, ckpt, watermark_delay="1 hour")
    out2 = read_ids()
    assert 4 not in out2
    assert 5 in out2
    assert len(out2) == 3

    # run 3: the 12:00 watermark has passed alpha's state expiry
    # (event_time + delay = 11:30) → its state was reclaimed, so a LATE
    # duplicate is re-emitted. This is the documented bounded-state trade:
    # exactly-once within the delay, at-least-once beyond it (the batch
    # MinHash/exact family downstream reconciles unbounded-lag dups).
    _docs(spark, [
        (6, "alpha body", _ts(12, 30)),
    ]).write.mode("append").parquet(docs_dir)
    stream_dedup_documents(spark, docs_dir, out_dir, ckpt, watermark_delay="1 hour")
    out3 = read_ids()
    assert 6 in out3
    assert len(out3) == 4


def test_stream_dedup_fingerprint_column_present(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _docs(spark, [(1, "some text", _ts(9, 0))]).write.parquet(docs_dir)
    stream_dedup_documents(spark, docs_dir, out_dir, ckpt)
    row = spark.read.parquet(out_dir).collect()[0]
    assert set(spark.read.parquet(out_dir).columns) == {
        "doc_id", "text", "ts", "fingerprint"
    }
    assert len(row["fingerprint"]) == 64  # sha256 hex
