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


def _iv(spark, rows):
    df = spark.createDataFrame(rows, "iid long, s string, e string")
    return df.withColumn("s", F.col("s").cast("timestamp")).withColumn(
        "e", F.col("e").cast("timestamp")
    )


def test_interval_overlap_join_matches_naive_theta_join(spark):
    """Exactness vs the naive non-equi self-join across a random-ish
    interval set spanning many cells (containment, partial overlap,
    disjoint, multi-cell overlaps all present)."""
    from hinbox_spark.operators.rangejoin import interval_overlap_join

    rows = [
        (i, f"2024-01-01 {(i * 3) % 24:02d}:{(i * 17) % 60:02d}:00",
         f"2024-01-01 {min(23, (i * 3) % 24 + (i % 4)):02d}:{(i * 29) % 60:02d}:59")
        for i in range(60)
    ]
    # keep only well-formed intervals (end >= start)
    left = _iv(spark, rows).filter(F.col("e") >= F.col("s"))
    right = (
        left.select(
            F.col("iid").alias("jid"),
            F.col("s").alias("s2"),
            F.col("e").alias("e2"),
        )
    )
    got = _rows(
        interval_overlap_join(
            left, right, on=[], left_start="s", left_end="e",
            right_start="s2", right_end="e2", bucket_s=1800,
        ),
        ["iid", "jid"],
    )
    want = _rows(
        left.crossJoin(right).filter(
            (F.col("s") <= F.col("e2")) & (F.col("s2") <= F.col("e"))
        ),
        ["iid", "jid"],
    )
    assert got == want and len(got) > len(rows)  # non-trivial overlap set


def test_interval_overlap_emitted_once_and_boundaries_inclusive(spark):
    """A pair sharing MANY cells appears exactly once; intervals touching
    at a single instant (end == start) do overlap (inclusive)."""
    from hinbox_spark.operators.rangejoin import interval_overlap_join

    left = _iv(spark, [
        (1, "2024-01-01 00:00:00", "2024-01-01 12:00:00"),  # spans 12 cells
        (2, "2024-01-01 20:00:00", "2024-01-01 21:00:00"),
    ])
    right = _iv(spark, [
        (10, "2024-01-01 01:00:00", "2024-01-01 11:00:00"),  # inside 1
        (11, "2024-01-01 12:00:00", "2024-01-01 13:00:00"),  # touches 1's end
        (12, "2024-01-01 21:00:00", "2024-01-01 22:00:00"),  # touches 2's end
        (13, "2024-01-01 13:00:01", "2024-01-01 14:00:00"),  # disjoint from 1
    ]).select(
        F.col("iid").alias("jid"), F.col("s").alias("s2"), F.col("e").alias("e2")
    )
    out = interval_overlap_join(
        left, right, on=[], left_start="s", left_end="e",
        right_start="s2", right_end="e2", bucket_s=3600,
    )
    pairs = [(r["iid"], r["jid"]) for r in out.collect()]
    assert sorted(pairs) == [(1, 10), (1, 11), (2, 12)]
    assert len(pairs) == len(set(pairs))  # exactly once despite 11 shared cells


def test_interval_overlap_join_plan_has_no_nested_loop(spark):
    from hinbox_spark.operators.rangejoin import interval_overlap_join

    left = _iv(spark, [(1, "2024-01-01 00:00:00", "2024-01-01 01:00:00")])
    right = left.select(
        F.col("iid").alias("jid"), F.col("s").alias("s2"), F.col("e").alias("e2")
    )
    out = interval_overlap_join(
        left, right, on=[], left_start="s", left_end="e",
        right_start="s2", right_end="e2", bucket_s=3600,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_respects_equality_keys(spark):
    """With `on` keys, overlapping intervals under DIFFERENT keys never
    pair — the cell join composes with the equality key."""
    from hinbox_spark.operators.rangejoin import interval_overlap_join

    left = spark.createDataFrame(
        [
            ("k1", 1, "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
            ("k2", 2, "2024-01-01 00:30:00", "2024-01-01 01:30:00"),
        ],
        "k string, iid long, s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn(
        "e", F.col("e").cast("timestamp")
    )
    right = left.select(
        "k", F.col("iid").alias("jid"),
        F.col("s").alias("s2"), F.col("e").alias("e2"),
    )
    out = interval_overlap_join(
        left, right, on=["k"], left_start="s", left_end="e",
        right_start="s2", right_end="e2", bucket_s=3600,
    )
    pairs = sorted((r["iid"], r["jid"]) for r in out.collect())
    # both intervals overlap in TIME, but only same-key self-pairs emit
    assert pairs == [(1, 1), (2, 2)]
