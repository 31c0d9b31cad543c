"""Extraction cache table semantics (S8 — mirrors reference
tests/test_extraction_cache.py: hit skips recompute, version invalidates,
duplicate content costs one extraction)."""

import pyspark.sql.functions as F

from hinbox_spark.functions.ner import default_gazetteer
from hinbox_spark.operators.extraction import (
    extract_articles, extract_mentions_cached,
)
from hinbox_spark.sources.pages_gen import pages_dataframe


def test_cache_roundtrip_and_dedup(spark, tmp_path):
    cache = str(tmp_path / "cache")
    gaz = default_gazetteer()
    pages, _ = pages_dataframe(spark, 50, 42)
    articles = extract_articles(pages).cache()

    m1 = extract_mentions_cached(articles, gaz, cache, version=1)
    n1 = m1.count()
    assert n1 > 0

    # cache stores one row-set per distinct content hash (dups share)
    cached = spark.read.parquet(cache)
    n_hashes = cached.select("content_hash").distinct().count()
    n_distinct_articles = articles.select("content_hash").distinct().count()
    assert n_hashes == n_distinct_articles
    # the corpus contains duplicate pages → fewer hashes than articles
    assert n_distinct_articles < articles.count()

    # second run: pure cache hits, identical output
    m2 = extract_mentions_cached(articles, gaz, cache, version=1)
    assert m2.count() == n1
    assert spark.read.parquet(cache).count() == cached.count()

    # version bump invalidates: recompute, cache grows
    m3 = extract_mentions_cached(articles, gaz, cache, version=2)
    assert m3.count() == n1
    assert spark.read.parquet(cache).count() == 2 * cached.count()


def test_cache_hits_equal_direct_extraction(spark, tmp_path):
    from hinbox_spark.operators.extraction import extract_mentions

    cache = str(tmp_path / "cache2")
    gaz = default_gazetteer()
    pages, _ = pages_dataframe(spark, 30, 42)
    articles = extract_articles(pages).cache()

    direct = {
        (r["url"], r["entity_type"], r["name"])
        for r in extract_mentions(articles, gaz).collect()
    }
    cached = {
        (r["url"], r["entity_type"], r["name"])
        for r in extract_mentions_cached(articles, gaz, cache).collect()
    }
    assert direct == cached
