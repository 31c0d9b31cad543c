"""Change-feed consumer: batch-incremental tailing of a SnapshotTable.

`SnapshotTable.read_changes` answers "what entered between snapshots A and
B"; this adds the CONSUMER side — a durable cursor so a periodic job
(nightly delta processor, downstream index builder) picks up exactly the
not-yet-processed tail each run, across process restarts and crashes.

The cursor uses the same protocol as the store's own commits: one
create-exclusive marker file per consumed head snapshot
(`cursor-<id>`), position = max marker. Committing a position is
therefore atomic and idempotent (re-publishing an existing marker is a
no-op), and a consumer that crashes between processing and commit simply
re-receives the same window — at-least-once delivery, with `_seq` on
every row as the consumer-side dedup key (the standard CDC contract;
exactly-once needs the consumer's own write to be transactional with the
cursor, which is what `StreamingMergeSink`'s batch-id ledger does for the
store-to-store case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hinbox_spark import fs as hfs
from hinbox_spark.tables import SnapshotTable

_CURSOR_FMT = "cursor-%012d"


class ChangeFeed:
    """Tail a SnapshotTable's committed changes from a durable cursor."""

    def __init__(self, spark: SparkSession, table: SnapshotTable, cursor_dir: str):
        self.spark = spark
        self.table = table
        self.cursor_dir = cursor_dir.rstrip("/")

    def position(self) -> int | None:
        """Last committed (fully consumed) snapshot id, or None."""
        if not hfs.exists(self.spark, self.cursor_dir):
            return None
        ids = []
        for f in hfs.list_files(self.spark, self.cursor_dir):
            name = f.rsplit("/", 1)[-1]
            if name.startswith("cursor-"):
                ids.append(int(name.split("-", 1)[1]))
        return max(ids) if ids else None

    def poll(self):
        """Returns (changes_df, head_snapshot, commit) — the rows committed
        to the table after the cursor, up to the CURRENT head (pinned, so
        writers racing this consumer don't smear the window), plus a
        `commit()` to persist the new position after processing succeeds.
        Returns None when caught up (or the table is still empty)."""
        head = self.table.latest_snapshot_id()
        last = self.position()
        if head is None or (last is not None and head <= last):
            return None
        df: DataFrame = self.table.read_changes(last, head)

        def commit() -> None:
            hfs.mkdirs(self.spark, self.cursor_dir)
            tmp = self.cursor_dir + f"/_tmp-{head}"
            hfs.write_text(self.spark, tmp, str(head))
            if not hfs.publish_without_overwrite(
                self.spark, tmp, self.cursor_dir + "/" + _CURSOR_FMT % head
            ):
                hfs.delete(self.spark, tmp)  # another worker already did

        return df, head, commit
