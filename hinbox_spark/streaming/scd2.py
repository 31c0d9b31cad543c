"""Streaming SCD-2 maintenance: keep temporal-validity intervals for a
time-varying (key → value) assertion stream current across micro-batches,
exactly-once.

The batch counterpart is `plans.queries.q_kg_temporal_validity` (SCD-2
reconstruction by full-history gaps-and-islands). A stream can't replay
full history per batch at 10^12 scale; this sink folds each micro-batch
into the stored intervals touching only the affected keys:

  table rows  (key, valid_from, value, valid_to, last_ts, n_assertions)
  identity    (key, valid_from, value) — one row per maximal run of equal
              value; the value is part of the identity because two
              same-timestamp changes are two distinct zero-duration runs
              sharing valid_from (adjacent runs always differ in value,
              and cross-batch valid_from strictly increases, so the
              triple is unique)
  open row    valid_to IS NULL   — at most one per key (the current value)

Per micro-batch (all set-oriented — joins + per-key windows, no pandas):
  1. read the affected keys' OPEN intervals (`read_resolved` scoped to the
     batch's keys — the snapshot store's point-lookup path, so store size
     never enters the per-batch cost);
  2. drop late assertions (ts ≤ the open interval's last_ts) — the same
     contract as watermarked windows: late data is counted, not reordered;
  3. gaps-and-islands WITHIN the batch (per-key window over (ts, value) —
     a total order, so same-ts conflicts resolve identically everywhere);
  4. stitch across the boundary: a first run continuing the open value
     EXTENDS the open row (same (key, valid_from) identity, n_assertions
     accumulates); a differing first run CLOSES it (valid_to set) and
     opens a new row; `lead(valid_from)` re-derives every touched row's
     valid_to in one pass;
  5. upsert the touched rows via SnapshotTable.merge — merge-on-read,
     O(touched rows) commit, no table rewrite.

Exactly-once: StreamingMergeSink's (sink_id, batch_id) ledger — manifest
operation strings + the durable high-water marker — is inherited verbatim,
so a re-delivered epoch after a crash is skipped without writing and the
ledger survives `expire_snapshots`.

Assertion-order contract: per key, event time must be non-decreasing
ACROSS batches (within a batch any order is fine — step 3 sorts). An
out-of-order assertion spanning batches is dropped and counted in
`late_dropped_total`, mirroring the reference pipeline's skip counters.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from hinbox_spark.streaming.upsert import _OP_PREFIX, StreamingMergeSink
from hinbox_spark.tables import SnapshotTable


class SCD2StreamSink(StreamingMergeSink):
    """Callable for `writeStream.foreachBatch(...)`: maintains SCD-2
    validity intervals in a SnapshotTable. Read the result with
    `read_resolved([key_col, "valid_from", "value"])` — the value
    joins the identity because two same-timestamp changes are two distinct
    (zero-duration) runs sharing valid_from, exactly as the batch
    reconstruction emits them."""

    def __init__(
        self,
        table: SnapshotTable,
        sink_id: str,
        key_col: str,
        value_col: str,
        ts_col: str,
    ):
        super().__init__(table, sink_id)
        self.key_col = key_col
        self.value_col = value_col
        self.ts_col = ts_col
        self.late_dropped_total = 0
        self.null_dropped_total = 0
        self._cached: list[DataFrame] = []

    # ── the per-batch fold ──

    def _segments(self, batch_df: DataFrame) -> DataFrame | None:
        k, v, ts = self.key_col, self.value_col, self.ts_col
        raw = batch_df.select(
            F.col(k).alias("key"), F.col(v).alias("value"),
            F.col(ts).alias("ts"),
        )
        # a NULL in any of the three columns is not an assertion: NULL
        # values would merge into adjacent runs (lag != NULL is NULL) and
        # defeat the o_value null-check the boundary stitch keys on —
        # dropped AND counted, like late data
        b = raw.filter(
            F.col("key").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )

        # 1. open intervals for the touched keys only (scoped point
        #    lookup); before the first commit there is nothing to read
        if self.table.latest_snapshot_id() is None:
            open_ = (
                b.select(
                    "key",
                    F.col("ts").alias("o_valid_from"),
                    F.col("value").alias("o_value"),
                    F.col("ts").alias("o_last_ts"),
                    F.lit(0).cast("long").alias("o_n"),
                ).limit(0)
            )
        else:
            scope = b.select(F.col("key").alias(self.key_col)).distinct()
            resolved = self.table.read_resolved(
                [self.key_col, "valid_from", "value"], scope=scope
            )
            open_ = resolved.filter(F.col("valid_to").isNull()).select(
                F.col(self.key_col).alias("key"),
                F.col("valid_from").alias("o_valid_from"),
                F.col("value").alias("o_value"),
                F.col("last_ts").alias("o_last_ts"),
                F.col("n_assertions").alias("o_n"),
            )

        # 2. late-data drop at the batch/store boundary
        joined = b.join(open_, "key", "left")
        live = joined.filter(
            F.col("o_last_ts").isNull() | (F.col("ts") > F.col("o_last_ts"))
        )
        # one action over the batch source for both drop counters
        counted = raw.agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.count(
                F.when(
                    F.col("key").isNotNull()
                    & F.col("ts").isNotNull()
                    & F.col("value").isNotNull(),
                    F.lit(1),
                )
            ).alias("n_valid"),
        ).first()
        self.null_dropped_total += counted["n_raw"] - counted["n_valid"]

        # 3. within-batch gaps-and-islands over the total order (ts, value)
        w = Window.partitionBy("key").orderBy("ts", "value")
        changed = F.when(
            F.lag("value").over(w).isNull()
            | (F.lag("value").over(w) != F.col("value")),
            1,
        ).otherwise(0)
        runs = (
            live.withColumn(
                "run",
                F.sum(changed).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .groupBy("key", "run")
            .agg(
                F.min("value").alias("value"),  # constant within a run
                F.min("ts").alias("run_from"),
                F.max("ts").alias("run_last"),
                F.count("*").alias("n"),
                F.min("o_valid_from").alias("o_valid_from"),
                F.min("o_value").alias("o_value"),
                F.min("o_last_ts").alias("o_last_ts"),
                F.min("o_n").alias("o_n"),
            )
        )
        # cache the fold: the lineage contains the scoped STORE read and
        # both windows — without this, the live-count action and the batch
        # write would each re-execute the store lookup
        runs = runs.persist()
        self._cached.append(runs)
        n_live = runs.agg(F.sum("n")).first()[0] or 0
        self.late_dropped_total += counted["n_valid"] - n_live
        if n_live == 0:
            return None

        # 4. boundary stitch
        first = (F.col("run") == 1) & F.col("o_value").isNotNull()
        extends = first & (F.col("value") == F.col("o_value"))
        segs_runs = runs.select(
            "key",
            # an extending first run keeps the open row's identity
            F.when(extends, F.col("o_valid_from"))
            .otherwise(F.col("run_from"))
            .alias("valid_from"),
            "value",
            F.col("run_last").alias("last_ts"),
            (F.col("n") + F.when(extends, F.col("o_n")).otherwise(F.lit(0)))
            .alias("n_assertions"),
        )
        closed_open = (
            runs.filter(first & (F.col("value") != F.col("o_value")))
            .select(
                "key",
                F.col("o_valid_from").alias("valid_from"),
                F.col("o_value").alias("value"),
                F.col("o_last_ts").alias("last_ts"),
                F.col("o_n").alias("n_assertions"),
            )
        )
        segments = segs_runs.unionByName(closed_open)
        # value joins the ordering: two same-timestamp zero-duration runs
        # share valid_from, and a bare-valid_from lead() would pick their
        # successor by partition order instead of the (ts, value) total
        # order the islands were built on
        wseg = Window.partitionBy("key").orderBy("valid_from", "value")
        return segments.select(
            F.col("key").alias(self.key_col),
            "valid_from",
            "value",
            F.lead("valid_from").over(wseg).alias("valid_to"),
            "last_ts",
            "n_assertions",
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._max_committed is None:
            self._max_committed = self._recover_max_committed()
        if batch_id <= self._max_committed:
            return  # re-delivered epoch: already folded
        try:
            segments = self._segments(batch_df)
            if segments is not None:
                batch, _, cols = self.table._write_batch(segments)
                self.table._commit(
                    lambda entries, seq: entries
                    + [{"batch": batch, "seq": seq, "columns": cols}],
                    # the base sink's ledger prefix: recovery scans for
                    # exactly this format, so it must have ONE owner
                    f"{_OP_PREFIX}:{self.sink_id}:{batch_id}",
                )
        finally:
            while self._cached:
                self._cached.pop().unpersist()
        # an all-late/empty epoch still advances the ledger: the epoch was
        # consumed, and re-delivering it must not re-count late drops
        self._publish_marker(batch_id)
        self._max_committed = batch_id


def scd2_as_of(
    table: SnapshotTable, key_col: str, ts
) -> DataFrame:
    """Point-in-time read: the (key, value) assertions valid at instant
    `ts` — the library counterpart of the `kg_snapshot_timeline` contract
    query. One resolved scan with a pushed-down residual filter. At most
    one row per key: intervals are [valid_from, valid_to), so a
    zero-duration run ([t, t)) matches NO probe — probing at a same-ts
    conflict instant returns only the run that survived it (the max value
    in the (ts, value) total order), exactly like probing the batch
    reconstruction with the same half-open rule."""
    iv = table.read_resolved([key_col, "valid_from", "value"])
    return iv.filter(
        (F.col("valid_from") <= F.lit(ts))
        & (F.col("valid_to").isNull() | (F.lit(ts) < F.col("valid_to")))
    ).select(key_col, "value", "valid_from", "valid_to")


def scd2_stream(
    stream_df: DataFrame,
    table: SnapshotTable,
    sink_id: str,
    checkpoint_dir: str,
    key_col: str,
    value_col: str,
    ts_col: str,
):
    """Start an AvailableNow streaming query maintaining SCD-2 intervals in
    `table`. Returns the StreamingQuery; callers awaitTermination()."""
    sink = SCD2StreamSink(table, sink_id, key_col, value_col, ts_col)
    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
