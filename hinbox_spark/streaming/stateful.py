"""Custom stateful streaming operator: running per-entity mention totals
across micro-batches via applyInPandasWithState.

The state (running count + first/last seen timestamps per entity key)
persists in the streaming checkpoint, so a later Trigger.AvailableNow run
continues the totals — the streaming analog of the reference's incremental
entity-store updates (the batch pipeline recomputes; this maintains).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("entity_type", StringType()),
        StructField("name", StringType()),
        StructField("total_mentions", LongType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("total", LongType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
    ]
)


def _update_entity_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    total, first_seen, last_seen = (
        state.get if state.exists else (0, None, None)
    )
    for pdf in pdfs:
        total += len(pdf)
        ts_min, ts_max = pdf["warc_ts"].min(), pdf["warc_ts"].max()
        first_seen = ts_min if first_seen is None else min(first_seen, ts_min)
        last_seen = ts_max if last_seen is None else max(last_seen, ts_max)
    state.update((total, first_seen, last_seen))
    yield pd.DataFrame(
        {
            "entity_type": [key[0]],
            "name": [key[1]],
            "total_mentions": [total],
            "first_seen": [first_seen],
            "last_seen": [last_seen],
        }
    )


def running_entity_counts(mentions_stream: DataFrame) -> DataFrame:
    """streaming mentions(entity_type, name, warc_ts) → running totals.

    State is per (entity_type, name); no timeout (entity totals never
    expire). Update mode: each batch emits the new totals for keys it
    touched."""
    return mentions_stream.groupBy("entity_type", "name").applyInPandasWithState(
        _update_entity_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_running_counts(
    spark, mentions_dir: str, output_dir: str, checkpoint_dir: str
) -> None:
    """AvailableNow driver: drain new mention files, update state, append
    emitted totals to the output table, stop."""
    stream = (
        spark.readStream.schema(
            "url string, entity_type string, name string, warc_ts timestamp"
        ).parquet(mentions_dir)
    )
    # update-mode stateful output can't stream straight into parquet
    # (append-only sink); foreachBatch appends each micro-batch's emitted
    # totals — the standard pattern for update-mode → file sink
    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(output_dir)

    q = (
        running_entity_counts(stream)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
