"""Storage bucketing: a join between two tables bucketed on the same key
must plan WITHOUT any Exchange (the 100-TB serve-side win this exists
for), sorted buckets also skip the Sort, and results equal the plain
shuffle join."""

import pyspark.sql.functions as F
import pytest

from hinbox_spark.bucketing import ensure_database, read_table, write_bucketed


@pytest.fixture
def bucketdb(spark, tmp_path):
    ensure_database(spark, "bucketdb", str(tmp_path / "warehouse"))
    # at test scale every table fits the broadcast threshold, and a
    # broadcast plan makes the planner disable bucketed scans entirely
    # ("Bucketed: false"); force the sort-merge path the fixture exists to
    # exercise — at 100 TB neither side would broadcast anyway
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield "bucketdb"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_has_no_exchange_and_matches_plain_join(spark, bucketdb):
    entities = spark.range(0, 400).select(
        F.concat(F.lit("e"), F.col("id")).alias("entity_id"),
        (F.col("id") % 7).alias("etype"),
    )
    edges = spark.range(0, 4000).select(
        F.concat(F.lit("e"), (F.col("id") % 400)).alias("entity_id"),
        F.col("id").alias("edge_id"),
    )
    write_bucketed(entities, f"{bucketdb}.entities", ["entity_id"], 8,
                   sort_cols=["entity_id"])
    write_bucketed(edges, f"{bucketdb}.edges", ["entity_id"], 8,
                   sort_cols=["entity_id"])

    joined = read_table(spark, f"{bucketdb}.entities").join(
        read_table(spark, f"{bucketdb}.edges"), "entity_id"
    )
    joined.collect()  # finalize AQE plan
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: neither side shuffles, and the pre-sorted buckets mean
    # the sort-merge join needs no Sort either
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan

    got = sorted(
        (r["entity_id"], r["edge_id"], r["etype"]) for r in joined.collect()
    )
    want = sorted(
        (r["entity_id"], r["edge_id"], r["etype"])
        for r in entities.join(edges, "entity_id").collect()
    )
    assert got == want and len(got) == 4000


def test_repeated_joins_amortize_without_reshuffle(spark, bucketdb):
    """The point of paying the bucketed write: a SECOND, different join on
    the same key is also Exchange-free (nothing is consumed by the first
    join)."""
    df = spark.range(0, 100).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    write_bucketed(df, f"{bucketdb}.a", ["k"], 4, sort_cols=["k"])
    write_bucketed(df.withColumn("v", F.col("v") * 2), f"{bucketdb}.b",
                   ["k"], 4, sort_cols=["k"])
    write_bucketed(df.withColumn("v", F.col("v") + 1), f"{bucketdb}.c",
                   ["k"], 4, sort_cols=["k"])
    j1 = read_table(spark, f"{bucketdb}.a").join(
        read_table(spark, f"{bucketdb}.b"), "k"
    )
    j2 = read_table(spark, f"{bucketdb}.a").join(
        read_table(spark, f"{bucketdb}.c"), "k"
    )
    for j in (j1, j2):
        j.collect()
        assert "Exchange" not in j._jdf.queryExecution().executedPlan().toString()


def test_mismatched_bucket_counts_still_correct(spark, bucketdb):
    """Different bucket counts can't co-locate — Spark falls back to a
    correct shuffle join (no silent wrong answers from the layout)."""
    df = spark.range(0, 50).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    write_bucketed(df, f"{bucketdb}.x4", ["k"], 4)
    write_bucketed(df.withColumn("v", F.col("v") * 10), f"{bucketdb}.x8",
                   ["k"], 8)
    j = read_table(spark, f"{bucketdb}.x4").join(
        read_table(spark, f"{bucketdb}.x8"), "k"
    )
    assert j.count() == 50
