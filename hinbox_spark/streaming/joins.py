"""Watermarked stream-stream interval join (SURVEY §2.11) — the streaming
face of `operators/rangejoin.py`.

Structured Streaming joins two streams with an event-time range condition
natively: the watermark on each side plus the time bound in the join
condition let the state store evict rows that can no longer match
(state is O(window × arrival rate), not O(stream)). This is the
continuous version of the click→purchase attribution the batch
`range_join` computes — same semantics, same rows, two execution models;
the test pins stream output == batch `range_join` output on identical
input.

Scale shape: both streams shuffle on the equality key (user_id), the
range predicate prunes state by event time, and append mode emits each
joined pair exactly once — the standard production shape for
stream-stream attribution at any fan-in.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

CLICKS_STREAM_SCHEMA_DDL = "event_id long, user_id long, ts timestamp"
PURCHASES_STREAM_SCHEMA_DDL = (
    "purchase_event_id long, user_id long, p_ts timestamp, p_value double"
)


def interval_join_streams(
    clicks: DataFrame,
    purchases: DataFrame,
    lower_s: int = 1,
    upper_s: int = 3600,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """clicks ⋈ purchases of the same user with
    p_ts ∈ [ts + lower_s, ts + upper_s] (inclusive), watermarked on both
    event times so the join state is bounded and evictable."""
    c = clicks.withWatermark("ts", watermark_delay)
    p = purchases.withColumnRenamed("user_id", "p_user_id").withWatermark(
        "p_ts", watermark_delay
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("ts") + F.expr(f"INTERVAL {lower_s} SECOND"))
        & (F.col("p_ts") <= F.col("ts") + F.expr(f"INTERVAL {upper_s} SECOND"))
    )
    return c.join(p, cond).select(
        "event_id", "user_id", "ts", "purchase_event_id", "p_ts", "p_value"
    )


def run_interval_join(
    spark: SparkSession,
    clicks_dir: str,
    purchases_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    lower_s: int = 1,
    upper_s: int = 3600,
    watermark_delay: str = "30 minutes",
) -> None:
    """AvailableNow driver: drain both file streams, emit every joined
    pair exactly once (append mode), persist join state in the checkpoint
    so later file arrivals join against retained in-window rows."""
    clicks = spark.readStream.schema(CLICKS_STREAM_SCHEMA_DDL).parquet(
        clicks_dir
    )
    purchases = spark.readStream.schema(PURCHASES_STREAM_SCHEMA_DDL).parquet(
        purchases_dir
    )
    q = (
        interval_join_streams(
            clicks, purchases, lower_s, upper_s, watermark_delay
        )
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
