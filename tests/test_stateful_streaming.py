"""applyInPandasWithState: running entity totals persist across
AvailableNow runs via the streaming checkpoint."""

import datetime

import pyspark.sql.functions as F

from hinbox_spark.streaming.stateful import run_running_counts


def _mentions(spark, rows):
    return spark.createDataFrame(
        rows, "url string, entity_type string, name string, warc_ts timestamp"
    )


def test_state_accumulates_across_runs(spark, tmp_path):
    mentions_dir = str(tmp_path / "mentions")
    out_dir = str(tmp_path / "totals")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 1, 2)

    _mentions(spark, [
        ("u1", "organizations", "FBI", t0),
        ("u2", "organizations", "FBI", t0),
        ("u3", "people", "Omar Khadr", t0),
    ]).write.mode("append").parquet(mentions_dir)
    run_running_counts(spark, mentions_dir, out_dir, ckpt)

    first = {
        (r["entity_type"], r["name"]): r["total_mentions"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert first[("organizations", "FBI")] == 2
    assert first[("people", "Omar Khadr")] == 1

    # second batch: state continues from the checkpoint
    _mentions(spark, [
        ("u4", "organizations", "FBI", t1),
        ("u5", "locations", "Guantanamo Bay", t1),
    ]).write.mode("append").parquet(mentions_dir)
    run_running_counts(spark, mentions_dir, out_dir, ckpt)

    latest = (
        spark.read.parquet(out_dir)
        .groupBy("entity_type", "name")
        .agg(F.max("total_mentions").alias("total"),
             F.min("first_seen").alias("fs"),
             F.max("last_seen").alias("ls"))
        .collect()
    )
    totals = {(r["entity_type"], r["name"]): r for r in latest}
    assert totals[("organizations", "FBI")]["total"] == 3  # 2 + 1 across runs
    assert totals[("locations", "Guantanamo Bay")]["total"] == 1
    assert totals[("organizations", "FBI")]["fs"] == t0
    assert totals[("organizations", "FBI")]["ls"] == t1
