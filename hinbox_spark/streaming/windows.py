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


def session_windowed_user_counts(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """streaming events → one row per closed user session:
    (user_id, session_start, session_end, n_events).

    The NATIVE dynamic-gap sibling of the batch sessionization oracle
    (`events_sessions` — lag/cumsum over a static table): Spark's
    `session_window` merges a user's events into a session that extends
    while consecutive events arrive within `gap`, and the state store
    keeps only OPEN sessions — a session finalizes (emitted once, append
    mode) when the watermark passes its close. State is bounded by
    (active users × open sessions), never the stream; this is the
    session shape to reach for before the custom
    applyInPandasWithState operator (streaming/stateful.py), which
    remains for semantics session_window can't express (running
    per-key emission while the key is still open)."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_session_counts(
    spark: SparkSession,
    events_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
) -> None:
    """AvailableNow driver for `session_windowed_user_counts` over a
    parquet file stream of events (doc feed shape: user_id + ts)."""
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(events_dir)
    q = (
        session_windowed_user_counts(stream, gap, watermark_delay)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
