"""Bucketized range join: exactness vs the naive theta-join, boundary
inclusivity, and the no-nested-loop plan property it exists for."""

import pyspark.sql.functions as F

from hinbox_spark.operators.rangejoin import range_join


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_range_join_matches_naive_theta_join(spark):
    left = spark.createDataFrame(
        [(i, i % 3, f"2024-01-01 00:{i:02d}:00") for i in range(40)],
        "lid long, k long, lts string",
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [(100 + j, j % 3, f"2024-01-01 00:{j % 55:02d}:{(7 * j) % 60:02d}")
         for j in range(120)],
        "rid long, k long, rts string",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    got = range_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        lower_s=1, upper_s=300,
    )
    naive = left.join(right, "k").filter(
        (F.unix_timestamp("rts") >= F.unix_timestamp("lts") + 1)
        & (F.unix_timestamp("rts") <= F.unix_timestamp("lts") + 300)
    )
    cols = ["lid", "rid"]
    assert _rows(got, cols) == _rows(naive, cols)
    assert len(_rows(got, cols)) > 0


def test_range_join_boundaries_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 0, "2024-06-01 12:00:00")], "lid long, k long, lts string"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    # right rows at +0s, +1s (lower bound), +300s (upper bound), +301s
    right = spark.createDataFrame(
        [
            (10, 0, "2024-06-01 12:00:00"),
            (11, 0, "2024-06-01 12:00:01"),
            (12, 0, "2024-06-01 12:05:00"),
            (13, 0, "2024-06-01 12:05:01"),
        ],
        "rid long, k long, rts string",
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    got = range_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        lower_s=1, upper_s=300,
    )
    assert _rows(got, ["rid"]) == [(11,), (12,)]


def test_range_join_plan_has_no_nested_loop(spark):
    """The whole point: an inequality-window join that Catalyst would run
    as BroadcastNestedLoopJoin becomes an equi-join on (key, bucket)."""
    left = spark.createDataFrame(
        [(i, i % 5, f"2024-01-01 00:{i % 60:02d}:00") for i in range(200)],
        "lid long, k long, lts string",
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = left.select(
        F.col("lid").alias("rid"), "k", F.col("lts").alias("rts")
    )
    got = range_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        lower_s=1, upper_s=600,
    )
    got.count()  # finalize AQE plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    # the range predicate itself must NOT be the join condition — it is a
    # post-join filter over an equi-join keyed on (k, _rj_bucket)
    assert "Join" in plan
