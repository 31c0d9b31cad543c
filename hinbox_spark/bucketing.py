"""Storage-level bucketing — co-located joins without a shuffle.

The serve-side join pattern over the materialized graph (entities ⋈ edges
on the entity key, repeated by every downstream consumer) pays one shuffle
per query if the tables are plain parquet. Writing both sides bucketed on
the join key (`DataFrameWriter.bucketBy` — hash-partitioned files + bucket
metadata in the catalog) lets Spark plan the join as a zipped bucket scan:
no Exchange on either side, ever, for any number of downstream joins on
that key. With `sortBy` the per-bucket sort is also pre-paid, so the
sort-merge join needs neither Exchange NOR Sort — the scan is the join.

This is the standing-cost/recurring-cost trade: one bucketed write
(a full shuffle's worth of work, paid once) amortized over every future
join, the same reasoning as the snapshot store's sorted compaction. Bucket
count is the scale knob — set it so a bucket of the big table fits a task
(e.g. 100 TB of edges / 512 MB-target ≈ 200k buckets); both sides must
agree on (bucket columns, count) for the co-located plan.

Bucketed tables live in the session catalog (saveAsTable); `database` +
LOCATION keeps the data under an explicit path instead of the default
warehouse dir — on a cluster this is the metastore + object-store layout
Spark's bucketing already standardizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_database(spark: SparkSession, database: str, location: str) -> None:
    """Create (idempotently) a catalog database whose tables store their
    data under `location` — keeps bucketed-table files out of the default
    warehouse dir."""
    loc = location.replace("'", "")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} LOCATION '{loc}'")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed (optionally per-bucket-sorted) parquet
    table. `table` may be 'db.name'. Joins between tables bucketed on the
    same (cols, n_buckets) are planned without Exchange; with sort_cols ==
    the join key, without Sort either."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata rides along, so downstream joins on
    the bucket key skip their Exchange."""
    return spark.table(table)
