"""Distributed global ranking (operators/ranking.py): exact equivalence
with the window row_number/ntile on a total order, the absent
Exchange SinglePartition that is the operator's reason to exist, and the
exact ntile fill rule on awkward N/k splits."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from hinbox_spark.operators.ranking import distributed_ntile, global_row_numbers


def _scored(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 101).alias("score"),  # heavy ties
    )


def test_global_row_numbers_match_window_row_number(spark):
    df = _scored(spark, 500).repartition(13)
    order = [F.desc("score"), F.asc("doc_id")]
    got = {
        r["doc_id"]: r["rank"]
        for r in global_row_numbers(df, order, num_partitions=7).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["doc_id"]: r["rn"] - 1
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_distributed_ntile_matches_window_ntile_exactly(spark):
    order = [F.desc("score"), F.asc("doc_id")]
    for n, k in [(500, 4), (501, 4), (503, 7), (6, 4), (3, 4)]:
        df = _scored(spark, n).repartition(9)
        got = {
            r["doc_id"]: r["tile"]
            for r in distributed_ntile(df, k, order, num_partitions=5).collect()
        }
        want = {
            r["doc_id"]: r["nt"]
            for r in df.withColumn(
                "nt", F.ntile(k).over(Window.orderBy(*order))
            ).collect()
        }
        assert got == want, (n, k)


def test_no_single_partition_exchange(spark):
    """The whole point: the window ntile plans Exchange SinglePartition;
    the distributed one must not."""
    df = _scored(spark, 200)
    order = [F.desc("score"), F.asc("doc_id")]
    window_plan = (
        df.withColumn("nt", F.ntile(4).over(Window.orderBy(*order)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" in window_plan  # the anti-pattern, for contrast
    dist_plan = (
        distributed_ntile(df, 4, order, num_partitions=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in dist_plan
