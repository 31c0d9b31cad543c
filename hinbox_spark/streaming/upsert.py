"""Streaming upsert sink: foreachBatch → SnapshotTable.merge, exactly-once
per micro-batch.

Structured Streaming's built-in file sink is append-only; the entity store
needs MERGE per micro-batch (the reference's operating mode is "merge each
new batch into the existing store", process_and_extract.py:545-760). The
engine contract for foreachBatch is at-least-once: after a crash the last
epoch re-runs with the SAME batch_id. Exactly-once is therefore built as an
idempotent commit keyed on (sink_id, batch_id): each commit records the
batch id in the snapshot manifest's operation string, and a re-delivered
batch whose id is already in the committed history is skipped without
writing. This is the same design real Iceberg/Delta streaming sinks use
(batch ids stored in snapshot summary metadata, checked on recovery).

The high-water batch id is ADDITIONALLY persisted as a create-exclusive
marker file under `<table>/_sinks/<sink_id>/` (the ChangeFeed cursor
protocol): `expire_snapshots` can GC every streaming-merge manifest, and a
sink restart that recovered from manifests alone would then see -1 and
re-merge a re-delivered epoch — benign for read_resolved (identical rows,
last-wins) but it would duplicate rows in raw reads and re-emit the batch
into the CDC feed. Recovery takes max(marker, manifest scan), so the
ledger survives expiry AND a crash between commit and marker publish.

Scale shape: the recovery scan walks manifests (O(snapshot history), JSON
metadata only — bounded by `expire_snapshots`) exactly once per sink
restart; steady-state skip checks are an in-memory integer compare, and
each micro-batch does O(batch rows) work — no table rewrite, no history
rescan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hinbox_spark import fs as hfs
from hinbox_spark.tables import SnapshotTable


def _contains_map(dt) -> bool:
    """True if the type holds a MapType anywhere — Spark rejects those in
    ordering expressions (max_by's comparator included)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False

_OP_PREFIX = "streaming-merge"
_MARKER_FMT = "committed-%012d"


class StreamingMergeSink:
    """Callable for `writeStream.foreachBatch(...)`: merges every
    micro-batch into a SnapshotTable as a merge-on-read upsert.

    `key_cols` + `order_col`: when given, each micro-batch is first
    collapsed to ONE row per key (max_by over `order_col`, the full PAYLOAD
    struct as the deterministic tie-break) — read_resolved breaks per-key
    ties across batches by `_seq`, so rows sharing a key WITHIN one batch
    must be pre-collapsed deterministically or the resolved winner would be
    partition-order-dependent. The key columns are constant within each
    group and break no ties; tying on the payload itself makes two rows
    sharing (key, order_col) but differing payload pick the same winner
    under any partitioning.
    """

    def __init__(
        self,
        table: SnapshotTable,
        sink_id: str,
        key_cols: list[str] | None = None,
        order_col: str | None = None,
    ):
        assert (key_cols is None) == (order_col is None), (
            "key_cols and order_col come together (within-batch collapse "
            "needs an explicit deterministic order)"
        )
        self.table = table
        self.sink_id = sink_id
        self.key_cols = key_cols
        self.order_col = order_col
        self.marker_dir = f"{table.path}/_sinks/{sink_id}"
        self._max_committed: int | None = None  # lazily recovered

    def _recover_max_committed(self) -> int:
        """Highest micro-batch id this sink already merged (crash
        recovery) = max over BOTH ledgers: the durable marker files (which
        survive `expire_snapshots`) and a one-time walk of the surviving
        snapshot manifests (which covers a crash between commit and marker
        publish). Batch ids of one streaming query are monotone, so one
        integer is enough."""
        best = -1
        spark = self.table.spark
        if hfs.exists(spark, self.marker_dir):
            for f in hfs.list_files(spark, self.marker_dir):
                name = f.rsplit("/", 1)[-1]
                if name.startswith("committed-"):
                    best = max(best, int(name.split("-", 1)[1]))
        prefix = f"{_OP_PREFIX}:{self.sink_id}:"
        for snap_id in self.table._snapshot_ids():
            op = self.table._read_manifest(snap_id).get("operation", "")
            if op.startswith(prefix):
                best = max(best, int(op[len(prefix):]))
        return best

    def _publish_marker(self, batch_id: int) -> None:
        """Durable high-water marker (ChangeFeed cursor protocol):
        create-exclusive publish, then best-effort GC of older markers so
        the dir stays O(1) files instead of O(epochs)."""
        spark = self.table.spark
        hfs.mkdirs(spark, self.marker_dir)
        tmp = self.marker_dir + f"/_tmp-{batch_id}"
        hfs.write_text(spark, tmp, str(batch_id))
        if not hfs.publish_without_overwrite(
            spark, tmp, self.marker_dir + "/" + _MARKER_FMT % batch_id
        ):
            hfs.delete(spark, tmp)  # re-delivered epoch already marked
        for f in hfs.list_files(spark, self.marker_dir):
            name = f.rsplit("/", 1)[-1]
            if name.startswith("committed-") and int(name.split("-", 1)[1]) < batch_id:
                hfs.delete(spark, f)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._max_committed is None:
            self._max_committed = self._recover_max_committed()
        if batch_id <= self._max_committed:
            return  # re-delivered epoch after a crash: already committed
        df = batch_df
        if self.key_cols:
            payload = [c for c in df.columns if c not in self.key_cols]
            # order_col first, then the PAYLOAD as tie-break (key cols are
            # constant within the group and break nothing) —
            # bit-deterministic under any partitioning even when
            # (key, order_col) collide. Columns containing a MapType
            # anywhere are not orderable in Spark, so they ride the
            # ordering as their canonical JSON text instead of raw.
            orderable = [
                c for c in payload if not _contains_map(df.schema[c].dataType)
            ]
            tie: list = [F.col(self.order_col)]
            tie += [F.col(c) for c in orderable]
            unorderable = [c for c in payload if c not in orderable]
            if unorderable:
                tie.append(
                    F.to_json(F.struct(*[F.col(c) for c in unorderable]))
                )
            df = (
                df.groupBy(*self.key_cols)
                .agg(
                    F.max_by(F.struct(*payload), F.struct(*tie)).alias("_row")
                )
                .select(
                    *self.key_cols,
                    *[F.col(f"_row.{c}").alias(c) for c in payload],
                )
            )
        batch, _, _cols = self.table._write_batch(df)
        self.table._commit(
            lambda entries, seq: entries
            + [{"batch": batch, "seq": seq, "columns": _cols}],
            f"{_OP_PREFIX}:{self.sink_id}:{batch_id}",
        )
        self._publish_marker(batch_id)
        self._max_committed = batch_id


def merge_stream(
    stream_df: DataFrame,
    table: SnapshotTable,
    sink_id: str,
    checkpoint_dir: str,
    key_cols: list[str] | None = None,
    order_col: str | None = None,
):
    """Start an AvailableNow streaming query that upserts `stream_df` into
    `table`. Returns the StreamingQuery; callers awaitTermination(). The
    checkpoint gives exactly-once offsets; the sink's batch-id ledger gives
    exactly-once COMMITS even when the epoch between offset-commit and
    sink-commit is re-delivered."""
    sink = StreamingMergeSink(table, sink_id, key_cols, order_col)
    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
