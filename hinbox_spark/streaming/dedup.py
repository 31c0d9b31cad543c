"""Streaming exact dedup with BOUNDED state: the continuous-ingest version
of operators/dedup.exact_duplicates (reference's skip-if-unchanged semantics
live in batch at streaming/incremental.py; this is the arrival-stream shape
a Common-Crawl-style feed needs).

The load-bearing choice is `dropDuplicatesWithinWatermark`, not
`dropDuplicates`: on an unbounded stream, plain dropDuplicates keeps every
key it has ever seen in the state store — at 10¹² documents that state IS
the corpus and the job dies. WithinWatermark expires a key's state once the
event-time watermark passes it, so state is bounded by (arrival rate ×
watermark delay) regardless of total stream length. The trade is explicit
and documented: a duplicate arriving LATER than the watermark delay after
its first occurrence is re-emitted (its dedup state has been reclaimed) —
exactly-once-per-key within the window, at-least-once beyond it. Feeds with
unbounded duplicate lag need the batch MinHash/exact family downstream as a
reconciliation pass; this operator removes the near-arrival bulk (crawl
recrawls, mirror bursts) before the expensive per-document work.

Checkpointed: the dedup state store rides the streaming checkpoint, so a
second AvailableNow run of the same query resumes the SAME seen-set —
cross-run duplicates within the watermark are dropped, pinned in
tests/test_streaming_dedup.py. Within one micro-batch the surviving row of
a duplicate group is arrival-first (partition-order-dependent); consumers
needing a deterministic keeper apply the batch min-doc_id rule downstream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

DOCS_STREAM_SCHEMA_DDL = "doc_id long, text string, ts timestamp"


def stream_dedup_documents(
    spark: SparkSession,
    docs_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "1 hour",
) -> None:
    """Drain `docs_dir` (parquet file stream) through content-hash dedup
    into `output_dir`, keeping per-key state only `watermark_delay` past
    the observed event-time maximum. Trigger.AvailableNow: processes what
    is present, then stops; rerunning resumes from the checkpoint (new
    files only, seen-set restored)."""
    docs = spark.readStream.schema(DOCS_STREAM_SCHEMA_DDL).parquet(docs_dir)
    deduped = (
        docs.withColumn("fingerprint", F.sha2(F.col("text"), 256))
        .withWatermark("ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
