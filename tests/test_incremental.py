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


def test_resume_from_pre_is_relevant_checkpoint(spark, tmp_path):
    """ADVICE r2: an articles checkpoint written before the is_relevant
    column existed must not wedge a resumed run — the pipeline stamps the
    column on the fly."""
    import pyspark.sql.functions as F

    from hinbox_spark.pipeline import run_pipeline
    from hinbox_spark.sources.pages_gen import pages_dataframe

    out = str(tmp_path / "out")
    pages, _ = pages_dataframe(spark, 30, 42)
    t1 = run_pipeline(spark, pages, out, resume=False)
    n_edges = t1["edges"].count()

    # rewrite the articles checkpoint WITHOUT is_relevant (old layout) and
    # delete everything downstream, then resume
    import shutil

    arts = spark.read.parquet(f"{out}/articles").drop("is_relevant").collect()
    schema = spark.read.parquet(f"{out}/articles").drop("is_relevant").schema
    for stage in ["mentions", "entities", "edges", "profiles", "review",
                  "decisions", "metrics"]:
        shutil.rmtree(f"{out}/{stage}", ignore_errors=True)
    shutil.rmtree(f"{out}/articles", ignore_errors=True)
    spark.createDataFrame(arts, schema).write.parquet(f"{out}/articles")

    t2 = run_pipeline(spark, pages, out, resume=True)
    assert t2["edges"].count() == n_edges
