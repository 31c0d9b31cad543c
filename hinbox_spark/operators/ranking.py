"""Distributed global ranking — exact row_number/ntile over a total order
WITHOUT the single-task sort.

`Window.orderBy(...)` with no partitionBy plans as `Exchange
SinglePartition`: the entire dataset funnels into ONE task to be sorted —
the same mega-task anti-pattern the bucket caps and tournament top-k
exist to prevent, and a guaranteed OOM at 10¹² rows. Exact global ranks
don't need it:

  1. repartitionByRange(order) — the range partitioner samples the keys
     and assigns contiguous, ORDERED key ranges to partitions (balanced by
     sampling, skew split across partitions);
  2. sortWithinPartitions(order) — each partition sorts locally;
  3. one tiny metadata job counts rows per partition; the driver folds the
     counts into per-partition START OFFSETS (O(partitions) integers);
  4. rank = broadcast(offset)[pid] + local position, where the local
     position comes from a mapInPandas running counter — Arrow-batched,
     no extra shuffle, partition order preserved.

Two passes over the data (count + rank) and zero single-task stages; the
sort work is the same total comparisons a global sort costs, spread across
the cluster. ntile buckets derive from the exact rank with SQL ntile's
exact fill rule (first N mod k buckets take one extra row), so results are
bit-identical to the window ntile — pinned by tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def global_row_numbers(
    df: DataFrame,
    order_exprs: list[Column],
    num_partitions: int | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact 0-based global rank of every row under the given total order
    (make it total — include a unique tie-break column — or ties land in
    sampling-dependent positions like any sort). Adds `rank_col`."""
    ranked, _total = _ranked_with_total(df, order_exprs, num_partitions, rank_col)
    return ranked


def _ranked_with_total(
    df: DataFrame,
    order_exprs: list[Column],
    num_partitions: int | None,
    rank_col: str,
):
    parts = (
        df.repartitionByRange(num_partitions, *order_exprs)
        if num_partitions
        else df.repartitionByRange(*order_exprs)
    ).sortWithinPartitions(*order_exprs)
    # share the ranged+sorted layout between the counts job and the rank
    # pass instead of re-shuffling twice
    parts = parts.localCheckpoint(eager=False)

    sizes = (
        parts.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in sizes}
    offsets, acc = [], 0
    for pid in range(max(by_pid) + 1 if by_pid else 0):
        offsets.append((pid, acc))
        acc += by_pid.get(pid, 0)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets or [(0, 0)], "pid int, _offset long")

    # build a NEW StructType — StructType.add mutates in place, and
    # mutating parts.schema's cached object would make parts.columns lie
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(parts.schema.fields) + [StructField("_local", LongType())]
    )

    def _local_positions(it):
        n = 0
        for pdf in it:
            pdf = pdf.assign(_local=range(n, n + len(pdf)))
            n += len(pdf)
            yield pdf

    ranked = (
        parts.mapInPandas(_local_positions, schema=schema)
        .withColumn("pid", F.spark_partition_id())
        .join(F.broadcast(off_df), "pid")
        .withColumn(rank_col, (F.col("_offset") + F.col("_local")).cast("long"))
        .drop("pid", "_offset", "_local")
    )
    return ranked, acc


def global_running_counts(
    df: DataFrame,
    order_exprs: list[Column],
    flag_col: str,
    count_col: str = "n_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """For each row, the EXACT number of rows with `flag_col` = 1 strictly
    BEFORE it under the given total order — the primitive behind sweep-line
    counting (interval-overlap counts, rank-in-other-set, searchsorted).

    Same zero-single-task plan as `global_row_numbers`: range partition +
    local sort + an O(partitions) offset fold — except the folded quantity
    is the per-partition FLAG count rather than the row count, and the
    mapInPandas pass keeps an exclusive running flag-cumsum instead of a
    row counter. Adds `count_col` (long)."""
    parts = (
        df.repartitionByRange(num_partitions, *order_exprs)
        if num_partitions
        else df.repartitionByRange(*order_exprs)
    ).sortWithinPartitions(*order_exprs)
    parts = parts.localCheckpoint(eager=False)

    sizes = (
        parts.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum(F.col(flag_col).cast("long")).alias("n_flag"))
        .collect()
    )
    by_pid = {r["pid"]: r["n_flag"] or 0 for r in sizes}
    offsets, acc = [], 0
    for pid in range(max(by_pid) + 1 if by_pid else 0):
        offsets.append((pid, acc))
        acc += by_pid.get(pid, 0)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets or [(0, 0)], "pid int, _offset long")

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(parts.schema.fields) + [StructField("_local", LongType())]
    )

    def _local_flag_prefix(it):
        n = 0  # flagged rows seen so far in this partition
        for pdf in it:
            flags = pdf[flag_col].astype("int64")
            # exclusive prefix sum: count of flagged rows strictly before
            pdf = pdf.assign(_local=flags.cumsum() - flags + n)
            n += int(flags.sum())
            yield pdf

    return (
        parts.mapInPandas(_local_flag_prefix, schema=schema)
        .withColumn("pid", F.spark_partition_id())
        .join(F.broadcast(off_df), "pid")
        .withColumn(count_col, (F.col("_offset") + F.col("_local")).cast("long"))
        .drop("pid", "_offset", "_local")
    )


def distributed_ntile(
    df: DataFrame,
    k: int,
    order_exprs: list[Column],
    num_partitions: int | None = None,
    tile_col: str = "tile",
) -> DataFrame:
    """Exact SQL ntile(k) over a total order without a single-task sort.
    Fill rule matches the standard exactly: with N rows, the first N mod k
    buckets hold ceil(N/k) rows, the rest floor(N/k)."""
    ranked, n_total = _ranked_with_total(df, order_exprs, num_partitions, "_gr")
    q, r = divmod(n_total, k)
    big = q + 1  # size of each of the first r buckets
    tile = (
        F.when(F.col("_gr") < r * big, F.floor(F.col("_gr") / big))
        .otherwise(
            r + F.floor((F.col("_gr") - r * big) / q) if q else F.lit(r)
        )
        + 1
    )
    return ranked.withColumn(tile_col, tile.cast("int")).drop("_gr")
