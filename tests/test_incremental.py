"""Incremental semantics: content-hash resume + streaming AvailableNow."""

import os

import pyspark.sql.functions as F

from hinbox_spark.functions.ner import default_gazetteer
from hinbox_spark.operators.extraction import extract_articles
from hinbox_spark.sources.pages_gen import pages_dataframe
from hinbox_spark.streaming.incremental import (
    stream_extract_mentions, unprocessed_pages,
)


def test_unprocessed_pages_skips_unchanged(spark):
    pages, _ = pages_dataframe(spark, 40, 42)
    articles = extract_articles(pages)

    # everything processed → nothing to do
    assert unprocessed_pages(pages, articles).count() == 0

    # a changed page (different html → different hash) must reprocess
    changed = pages.limit(1).withColumn(
        "html", F.lit(b"<article><h1>X</h1><p>Fresh content.</p></article>")
    )
    out = unprocessed_pages(changed, articles)
    assert out.count() == 1


def test_streaming_available_now_incremental(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "mentions")
    ckpt = str(tmp_path / "ckpt")
    gaz = default_gazetteer()

    pages, _ = pages_dataframe(spark, 30, 42)
    pages.write.mode("append").parquet(pages_dir)
    stream_extract_mentions(spark, pages_dir, out_dir, ckpt, gaz)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # rerun with no new files: nothing is reprocessed (exactly-once)
    stream_extract_mentions(spark, pages_dir, out_dir, ckpt, gaz)
    assert spark.read.parquet(out_dir).count() == n1

    # new files appear → only they are processed
    more, _ = pages_dataframe(spark, 60, 42)
    more.filter(F.col("url") > "https://news.example.com/2024/000029").write.mode(
        "append"
    ).parquet(pages_dir)
    stream_extract_mentions(spark, pages_dir, out_dir, ckpt, gaz)
    n3 = spark.read.parquet(out_dir).count()
    assert n3 > n1
