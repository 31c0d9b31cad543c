"""AQE skew-join evidence: the session config (adaptive + skewJoin on,
session.py) must actually SPLIT a skewed sort-merge-join partition at
runtime — the safety net behind every 'a hot key means AQE skew-split
applies' claim in the operator docstrings. Thresholds are lowered to test
scale; the mechanism (skew=true in the finalized plan, more tasks than
shuffle partitions on the skewed side) is what production relies on."""

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join_partition(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.shuffle.partitions", "8")

        # one mega-key (0) holding ~97% of the left side, joined to a
        # uniform right side — the classic hot-entity shape
        left = spark.range(0, 60_000).select(
            F.when(F.col("id") < 58_000, F.lit(0))
            .otherwise(F.col("id") % 50)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pl"),
        )
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), F.col("id").alias("rv")
        )
        joined = left.join(right, "k")
        # collect, not count: count() prunes the payload column and the
        # pruned shuffle is too small to be skewed — the plan under test
        # must carry the real row weight
        assert len(joined.collect()) == 60_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # AQE marks the finalized sort-merge join and the skewed shuffle
        # reader; both must show the split actually happened
        assert "SortMergeJoin(skew=true)" in plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            conf.set(k, v)
