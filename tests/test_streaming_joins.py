"""Stream-stream interval join: the streaming output must equal the batch
`range_join` on identical input (two execution models, one semantics)."""

import pyspark.sql.functions as F


def _clicks_rows():
    # user u, clicks every 10 min starting 12:00
    return [
        (i, i % 4, f"2024-03-01 12:{(i * 10) % 60:02d}:00") for i in range(12)
    ]


def _purchase_rows():
    # purchases scattered around the clicks, same users
    return [
        (100 + j, j % 4, f"2024-03-01 12:{(j * 7) % 60:02d}:{(j * 13) % 60:02d}", 5.0 + j)
        for j in range(20)
    ]


def test_stream_interval_join_equals_batch_range_join(spark, tmp_path):
    from hinbox_spark.operators.rangejoin import range_join
    from hinbox_spark.streaming.joins import run_interval_join

    clicks = spark.createDataFrame(
        _clicks_rows(), "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    purchases = spark.createDataFrame(
        _purchase_rows(),
        "purchase_event_id long, user_id long, p_ts string, p_value double",
    ).withColumn("p_ts", F.col("p_ts").cast("timestamp"))

    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    clicks.write.parquet(cdir)
    purchases.write.parquet(pdir)

    run_interval_join(spark, cdir, pdir, out, ckpt, lower_s=1, upper_s=600)

    streamed = sorted(
        map(
            tuple,
            spark.read.parquet(out)
            .select("event_id", "purchase_event_id")
            .collect(),
        )
    )
    batch = sorted(
        map(
            tuple,
            range_join(
                clicks,
                purchases.withColumnRenamed("user_id", "p_user_id").withColumn(
                    "user_id", F.col("p_user_id")
                ).drop("p_user_id"),
                on=["user_id"],
                left_ts="ts",
                right_ts="p_ts",
                lower_s=1,
                upper_s=600,
            )
            .select("event_id", "purchase_event_id")
            .collect(),
        )
    )
    assert streamed == batch
    assert len(streamed) > 0


def test_stream_interval_join_joins_across_incremental_batches(spark, tmp_path):
    """Join state persists in the checkpoint: purchases arriving in a
    LATER drain still join against in-window clicks from the first."""
    from hinbox_spark.streaming.joins import run_interval_join

    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    clicks = spark.createDataFrame(
        [(1, 7, "2024-03-01 12:00:00")], "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    clicks.write.parquet(cdir)
    # first drain: no purchases yet (empty dir with schema-bearing file)
    spark.createDataFrame(
        [], "purchase_event_id long, user_id long, p_ts timestamp, p_value double"
    ).write.parquet(pdir)
    run_interval_join(spark, cdir, pdir, out, ckpt, lower_s=1, upper_s=600)
    assert spark.read.parquet(out).count() == 0

    # second drain: an in-window purchase arrives later
    spark.createDataFrame(
        [(500, 7, "2024-03-01 12:04:00", 9.99)],
        "purchase_event_id long, user_id long, p_ts string, p_value double",
    ).withColumn("p_ts", F.col("p_ts").cast("timestamp")).write.mode(
        "append"
    ).parquet(pdir)
    run_interval_join(spark, cdir, pdir, out, ckpt, lower_s=1, upper_s=600)
    got = spark.read.parquet(out)
    assert [tuple(r) for r in got.select("event_id", "purchase_event_id").collect()] == [
        (1, 500)
    ]
