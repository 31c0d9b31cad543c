"""Incremental ingest: the reference's checkpoint/skip-if-unchanged
semantics (processing_status.json + content-hash skip,
/root/reference/src/process_and_extract.py:545-565,
src/utils/processing_status.py:17-93) re-expressed two ways:

1. batch resume (`unprocessed_pages`): anti-join new pages against the
   articles checkpoint on (url, content_hash) — the core primitive every
   stage reuses. Unchanged pages are skipped; changed pages reprocess.
2. a Structured Streaming skin (`stream_extract_mentions`): readStream over
   the pages directory → the same extraction UDFs → writeStream with
   Trigger.AvailableNow + checkpointLocation. Exactly-once per file via the
   streaming file-source log; drained batches stop the query (the
   reference is incremental-batch, so AvailableNow is the honest trigger).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hinbox_spark.functions.ner import Gazetteer
from hinbox_spark.operators.extraction import extract_articles, extract_mentions

PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def unprocessed_pages(pages: DataFrame, prior_articles: DataFrame | None) -> DataFrame:
    """Resume filter (F2): keep pages that are new OR whose extracted-text
    content hash changed since the checkpoint. prior_articles is the
    articles stage table (url, content_hash)."""
    if prior_articles is None:
        return pages
    extracted = extract_articles(pages)
    prior = prior_articles.select(
        "url", F.col("content_hash").alias("prior_hash")
    )
    return (
        extracted.join(prior, "url", "left")
        .filter(
            F.col("prior_hash").isNull()
            | (F.col("prior_hash") != F.col("content_hash"))
        )
        .drop("prior_hash")
    )


def stream_extract_mentions(
    spark: SparkSession,
    pages_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gazetteer: Gazetteer,
) -> None:
    """Structured Streaming ingest: pages parquet dir → mentions table.

    Trigger.AvailableNow drains everything present, then stops — rerunning
    later picks up only files the checkpoint hasn't seen (exactly-once per
    input file). New files appearing between runs are the incremental unit,
    matching the reference's article-batch semantics.
    """
    pages = (
        spark.readStream.schema(PAGES_SCHEMA_DDL).parquet(pages_dir)
    )
    articles = extract_articles(pages)
    mentions = extract_mentions(articles, gazetteer)

    q = (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
