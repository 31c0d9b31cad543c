"""Streaming upsert sink (streaming/upsert.py): foreachBatch → SnapshotTable
merge with exactly-once micro-batch commits — cross-drain last-wins
resolution, idempotent re-delivery after a simulated crash (same batch_id
twice, fresh sink instance), and deterministic within-batch key collapse."""

import datetime

from hinbox_spark.streaming.upsert import StreamingMergeSink, merge_stream
from hinbox_spark.tables import SnapshotTable

SCHEMA = "entity_id string, profile string, updated_at timestamp"


def _ts(m):
    return datetime.datetime(2024, 1, 1, 12, m)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _resolved(table):
    return {
        r["entity_id"]: r["profile"]
        for r in table.read_resolved(["entity_id"]).collect()
    }


def test_streaming_merge_last_wins_across_drains(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    table = SnapshotTable(spark, str(tmp_path / "store"))

    _rows(spark, [("e1", "v1", _ts(0)), ("e2", "v1", _ts(0))]).write.mode(
        "append"
    ).parquet(src)
    q = merge_stream(
        spark.readStream.schema(SCHEMA).parquet(src),
        table, "entities", ckpt, key_cols=["entity_id"], order_col="updated_at",
    )
    q.awaitTermination()
    assert _resolved(table) == {"e1": "v1", "e2": "v1"}

    # second drain: e1 updated, e3 new — merge-on-read last-wins
    _rows(spark, [("e1", "v2", _ts(5)), ("e3", "v1", _ts(5))]).write.mode(
        "append"
    ).parquet(src)
    q = merge_stream(
        spark.readStream.schema(SCHEMA).parquet(src),
        table, "entities", ckpt, key_cols=["entity_id"], order_col="updated_at",
    )
    q.awaitTermination()
    assert _resolved(table) == {"e1": "v2", "e2": "v1", "e3": "v1"}


def test_redelivered_batch_commits_exactly_once(spark, tmp_path):
    """A crash between the sink commit and the offset commit re-delivers
    the same batch_id on restart — possibly to a FRESH sink instance that
    must recover the ledger from the manifest history, not memory."""
    table = SnapshotTable(spark, str(tmp_path / "store"))
    sink = StreamingMergeSink(
        table, "entities", key_cols=["entity_id"], order_col="updated_at"
    )
    sink(_rows(spark, [("e1", "v1", _ts(0))]), batch_id=0)
    head = table.latest_snapshot_id()
    n = table.n_batches()

    # same instance re-delivery: no-op
    sink(_rows(spark, [("e1", "v1", _ts(0))]), batch_id=0)
    assert table.latest_snapshot_id() == head and table.n_batches() == n

    # fresh instance (post-crash restart): ledger recovered from manifests
    sink2 = StreamingMergeSink(
        table, "entities", key_cols=["entity_id"], order_col="updated_at"
    )
    sink2(_rows(spark, [("e1", "v1", _ts(0))]), batch_id=0)
    assert table.latest_snapshot_id() == head and table.n_batches() == n

    # a NEW batch id still commits
    sink2(_rows(spark, [("e1", "v2", _ts(1))]), batch_id=1)
    assert table.n_batches() == n + 1
    assert _resolved(table) == {"e1": "v2"}

    # ledgers are per-sink: a different sink_id on the same table is
    # independent (its batch 0 is not confused with ours)
    other = StreamingMergeSink(
        table, "audit", key_cols=["entity_id"], order_col="updated_at"
    )
    other(_rows(spark, [("a1", "x", _ts(0))]), batch_id=0)
    assert table.n_batches() == n + 2


def test_within_batch_duplicate_keys_collapse_deterministically(spark, tmp_path):
    """Rows sharing a key inside ONE micro-batch share a _seq, so they must
    be collapsed before commit — winner = max(updated_at), and the result
    is identical under any input partitioning."""
    table = SnapshotTable(spark, str(tmp_path / "store"))
    sink = StreamingMergeSink(
        table, "entities", key_cols=["entity_id"], order_col="updated_at"
    )
    rows = [("e1", "stale", _ts(0)), ("e1", "fresh", _ts(9)), ("e2", "only", _ts(1))]
    sink(_rows(spark, rows).repartition(7), batch_id=0)
    assert _resolved(table) == {"e1": "fresh", "e2": "only"}
    # the collapse happened at WRITE time (one row per key in the batch)
    assert table.read().count() == 2


def test_tie_on_order_col_resolved_by_payload_not_partition_order(
    spark, tmp_path
):
    """Two rows sharing (key, order_col) but differing payload: the key
    columns are constant within the group and break no ties, so the winner
    must come from the payload struct — identical under any partitioning."""
    winners = []
    for parts in (1, 7, 32):
        table = SnapshotTable(spark, str(tmp_path / f"store-{parts}"))
        sink = StreamingMergeSink(
            table, "entities", key_cols=["entity_id"], order_col="updated_at"
        )
        rows = [
            ("e1", "banana", _ts(3)),
            ("e1", "apple", _ts(3)),   # same key, same timestamp
            ("e1", "cherry", _ts(3)),
        ]
        sink(_rows(spark, rows).repartition(parts), batch_id=0)
        winners.append(_resolved(table)["e1"])
    # bit-deterministic: every partitioning picks the same winner, and it is
    # the max of the payload struct ordering (profile sorts first)
    assert winners == ["cherry", "cherry", "cherry"]


def test_batch_ledger_survives_snapshot_expiry(spark, tmp_path):
    """expire_snapshots can GC every streaming-merge manifest; the durable
    marker file must still stop a re-delivered epoch from re-merging (which
    would duplicate rows in raw reads and re-emit into the CDC feed)."""
    table = SnapshotTable(spark, str(tmp_path / "store"))
    sink = StreamingMergeSink(
        table, "entities", key_cols=["entity_id"], order_col="updated_at"
    )
    sink(_rows(spark, [("e1", "v1", _ts(0))]), batch_id=0)
    sink(_rows(spark, [("e1", "v2", _ts(1))]), batch_id=1)
    table.compact(["entity_id"])
    table.expire_snapshots(keep_last=1)  # only the compact manifest survives

    # fresh sink instance after a restart: manifests carry no merge ops any
    # more — recovery must come from the marker file
    sink2 = StreamingMergeSink(
        table, "entities", key_cols=["entity_id"], order_col="updated_at"
    )
    n = table.n_batches()
    head = table.latest_snapshot_id()
    sink2(_rows(spark, [("e1", "v2", _ts(1))]), batch_id=1)  # re-delivery
    assert table.n_batches() == n and table.latest_snapshot_id() == head
    assert table.read().count() == 1  # no duplicate rows in the raw read

    # genuinely new epochs still commit
    sink2(_rows(spark, [("e2", "w1", _ts(2))]), batch_id=2)
    assert _resolved(table) == {"e1": "v2", "e2": "w1"}


def test_map_payload_column_is_upsertable(spark, tmp_path):
    """A payload containing a MapType must not break the within-batch
    collapse: map columns are not orderable in Spark, so the deterministic
    tie-break carries them as canonical JSON text instead of raw
    (regression: the full-payload ordering struct raised
    'data type map<...> is not orderable' on the first micro-batch)."""
    table = SnapshotTable(spark, str(tmp_path / "t"))
    sink = StreamingMergeSink(
        table, "s", key_cols=["entity_id"], order_col="updated_at"
    )
    df = spark.createDataFrame(
        [
            ("a", {"k": "old"}, _ts(1)),
            ("a", {"k": "new"}, _ts(2)),  # later order_col wins
            ("b", {"k": "only"}, _ts(1)),
        ],
        "entity_id string, attrs map<string,string>, updated_at timestamp",
    )
    sink(df, 0)
    got = {
        r["entity_id"]: dict(r["attrs"])
        for r in table.read_resolved(["entity_id"]).collect()
    }
    assert got == {"a": {"k": "new"}, "b": {"k": "only"}}
