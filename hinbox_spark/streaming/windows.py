"""Watermarked windowed aggregation over the mention stream — late-data
handling for the streaming ingest path (SURVEY §2.11).

`windowed_mention_counts` is the declarative core: event-time window counts
per entity type with a watermark on warc_ts. Append output mode means a
window is emitted exactly once, when the watermark passes its end — rows
arriving later than the watermark are dropped by Spark's state store, the
standard bounded-state contract for infinite streams (state size is
O(open windows), not O(stream)).

The reference has no streaming surface (its incremental unit is the article
batch); this is the Spark-native equivalent of its per-day processing-log
rollups (src/process_and_extract.py metrics), maintained continuously.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MENTIONS_STREAM_SCHEMA_DDL = (
    "url string, entity_type string, name string, warc_ts timestamp"
)


def windowed_mention_counts(
    mentions_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """streaming mentions → (window_start, window_end, entity_type, n).

    Watermark bounds both state and lateness: a row older than
    max(event_time) − delay is dropped; a window finalizes (and is emitted,
    once) when the watermark passes its end."""
    return (
        mentions_stream.withWatermark("warc_ts", watermark_delay)
        .groupBy(
            F.window("warc_ts", window_duration).alias("w"),
            "entity_type",
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "entity_type",
            "n",
        )
    )


def run_windowed_counts(
    spark: SparkSession,
    mentions_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> None:
    """AvailableNow driver: drain new mention files, advance the watermark,
    append every newly-finalized window to the output table, stop. The
    watermark and window state persist in the checkpoint across runs."""
    stream = spark.readStream.schema(MENTIONS_STREAM_SCHEMA_DDL).parquet(
        mentions_dir
    )
    q = (
        windowed_mention_counts(stream, window_duration, watermark_delay)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
