"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship document-analytics query on sf0.001;
`queries()` / `oracle_sql()` expose the operator registry in
hinbox_spark/plans/queries.py (one entry per SURVEY.md §2 operator family,
each checked against its DuckDB oracle at sf0.01).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hinbox_spark.plans.queries import ORACLE_QUERIES, SPARK_QUERIES

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-language document profile — token stats + duplicate
    fingerprint groups + quality bucket spread (exercises scan, JVM
    higher-order functions, aggregation, join)."""
    docs = spark.read.parquet(f"{_SF0001}/documents.parquet")
    toks = F.size(F.split(F.col("text"), " "))
    fp = F.md5(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8)))
    stop_ratio = F.expr(
        "size(filter(split(text, ' '), x -> x IN ('the', 'a'))) "
        "/ CAST(size(split(text, ' ')) AS DOUBLE)"
    )

    per_doc = docs.select(
        "doc_id",
        "lang",
        toks.alias("n_tokens"),
        fp.alias("fingerprint"),
        stop_ratio.alias("stop_ratio"),
    )
    dup_groups = (
        per_doc.groupBy("fingerprint")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .select("fingerprint", F.lit(True).alias("is_dup_group"))
    )
    return (
        per_doc.join(F.broadcast(dup_groups), "fingerprint", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.sum(
                F.when(F.col("is_dup_group"), 1).otherwise(0)
            ).alias("docs_in_dup_groups"),
            F.round(F.avg("stop_ratio"), 4).alias("avg_stop_ratio"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry."""
    return dict(ORACLE_QUERIES)
