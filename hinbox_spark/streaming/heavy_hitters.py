"""Streaming heavy hitters: maintain a count-min sketch across
micro-batches, exactly once.

The batch CMS (operators/sketches.py) is mergeable by cell-wise addition,
which makes it the right streaming accumulator: each micro-batch folds its
own bounded (depth × width) cell table into the published sketch — state
size is O(depth × width) forever, however many tokens stream past. This is
the streaming analog of `corpus_cms_heavy_hitters`: a crawl-tail loop can
keep corpus token frequencies current without ever re-scanning the corpus.

Exactly-once protocol (the StreamingMergeSink / ChangeFeed cursor
discipline): every committed batch id publishes a create-exclusive marker
file, and each sketch version is a complete parquet dir renamed into place
(`publish_dir_without_overwrite`). foreachBatch re-delivers an epoch after a
crash; the sink then either skips it (marker present) or recomputes the
SAME merged sketch (the merge is deterministic) and adopts the
already-published version dir. The sketch therefore never double-counts a
batch — pinned by the re-delivery test in tests/test_streaming_cms.py.

Scale shape per batch: the batch's tokens collapse map-side to ≤ tasks ×
depth × width cells before the one groupBy shuffle; the standing sketch
read back for the merge is depth × width rows (a few thousand) — the merge
cost is independent of both corpus size and stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hinbox_spark import fs as hfs
from hinbox_spark.operators.sketches import count_min_sketch, merge_sketches

_MARKER_FMT = "committed-%012d"


class StreamingCmsSink:
    """foreachBatch callable: fold each micro-batch's items into the
    persistent sketch at `sketch_dir`, exactly once per batch id."""

    def __init__(
        self,
        spark: SparkSession,
        sketch_dir: str,
        item_col: str,
        depth: int = 4,
        width: int = 2048,
    ):
        self.spark = spark
        self.sketch_dir = sketch_dir.rstrip("/")
        self.marker_dir = self.sketch_dir + "/_markers"
        self.item_col = item_col
        self.depth = depth
        self.width = width
        self._max_committed: int | None = None

    # ── ledger ──

    def _recover_max_committed(self) -> int:
        best = -1
        if hfs.exists(self.spark, self.marker_dir):
            for f in hfs.list_files(self.spark, self.marker_dir):
                name = f.rsplit("/", 1)[-1]
                if name.startswith("committed-"):
                    best = max(best, int(name.split("-", 1)[1]))
        return best

    def _publish_marker(self, batch_id: int) -> None:
        hfs.mkdirs(self.spark, self.marker_dir)
        tmp = self.marker_dir + f"/_tmp-{batch_id}"
        hfs.write_text(self.spark, tmp, str(batch_id))
        if not hfs.publish_without_overwrite(
            self.spark, tmp, self.marker_dir + "/" + _MARKER_FMT % batch_id
        ):
            hfs.delete(self.spark, tmp)  # re-delivered epoch already marked
        # GC: keep the ledger O(1) files and drop superseded sketch versions
        for f in hfs.list_files(self.spark, self.marker_dir):
            name = f.rsplit("/", 1)[-1]
            if name.startswith("committed-"):
                bid = int(name.split("-", 1)[1])
                if bid < batch_id:
                    hfs.delete(self.spark, f)
                    hfs.delete(
                        self.spark, f"{self.sketch_dir}/v-{bid}", recursive=True
                    )

    # ── sketch state ──

    def current_sketch(self) -> DataFrame | None:
        """The latest COMMITTED sketch version (None before the first
        commit). Versions without a marker are in-flight and invisible."""
        bid = (
            self._max_committed
            if self._max_committed is not None
            else self._recover_max_committed()
        )
        if bid < 0:
            return None
        return self.spark.read.parquet(f"{self.sketch_dir}/v-{bid}")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._max_committed is None:
            self._max_committed = self._recover_max_committed()
        if batch_id <= self._max_committed:
            return  # re-delivered epoch: already folded in
        batch_sketch = count_min_sketch(
            batch_df, self.item_col, depth=self.depth, width=self.width
        )
        prior = self.current_sketch()
        merged = (
            merge_sketches(prior, batch_sketch) if prior is not None
            else batch_sketch
        )
        final = f"{self.sketch_dir}/v-{batch_id}"
        tmp = f"{self.sketch_dir}/_staging-{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if not hfs.publish_dir_without_overwrite(self.spark, tmp, final):
            # crash replay raced us past the version publish: the existing
            # dir holds the identical deterministic merge — adopt it
            hfs.delete(self.spark, tmp, recursive=True)
        self._publish_marker(batch_id)
        self._max_committed = batch_id


def run_streaming_heavy_hitters(
    spark: SparkSession,
    items_dir: str,
    items_schema: str,
    item_col: str,
    sketch_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 2048,
    max_files_per_trigger: int | None = None,
) -> StreamingCmsSink:
    """AvailableNow driver: drain new item files into the standing sketch,
    then stop. Re-invoking with the same checkpoint continues the fold —
    the crawl-tail maintenance loop. Returns the sink (use
    `sink.current_sketch()` + `operators.sketches.cms_estimate` to query
    heavy hitters)."""
    reader = spark.readStream.schema(items_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(items_dir)
    sink = StreamingCmsSink(
        spark, sketch_dir, item_col, depth=depth, width=width
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink
