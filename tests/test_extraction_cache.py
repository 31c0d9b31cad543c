"""Extraction cache table semantics (S8 — mirrors reference
tests/test_extraction_cache.py: hit skips recompute, version invalidates,
duplicate content costs one extraction, crash-safe batch commits)."""

import os
import shutil

from hinbox_spark.functions.ner import default_gazetteer
from hinbox_spark.operators.extraction import (
    extract_articles, extract_mentions_cached, read_extraction_cache,
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
    cached = read_extraction_cache(spark, cache, 1)
    n_hashes = cached.select("content_hash").distinct().count()
    n_distinct_articles = articles.select("content_hash").distinct().count()
    assert n_hashes == n_distinct_articles
    # the corpus contains duplicate pages → fewer hashes than articles
    assert n_distinct_articles < articles.count()

    # second run: pure cache hits, identical output, no new committed rows
    m2 = extract_mentions_cached(articles, gaz, cache, version=1)
    assert m2.count() == n1
    assert read_extraction_cache(spark, cache, 1).count() == cached.count()

    # version bump invalidates: recompute into the v2 subdirectory; v1 rows
    # are untouched and can never mix into a v2 read (schema isolation)
    m3 = extract_mentions_cached(articles, gaz, cache, version=2)
    assert m3.count() == n1
    assert read_extraction_cache(spark, cache, 2).count() == cached.count()
    assert read_extraction_cache(spark, cache, 1).count() == cached.count()


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
    # the cached path returns the MENTION_QC_SCHEMA shape — mentions only
    # is the qc_flag IS NULL slice
    cached = {
        (r["url"], r["entity_type"], r["name"])
        for r in extract_mentions_cached(articles, gaz, cache)
        .filter("qc_flag IS NULL").collect()
    }
    assert direct == cached


def test_partial_append_is_invisible_and_reextracted(spark, tmp_path):
    """Crash-safety: a batch directory left WITHOUT _SUCCESS (run killed
    mid-commit) must be ignored by the next read — its hashes re-extract
    and the final mention set is exactly-once per hash, no dupes/missing."""
    cache = str(tmp_path / "cache3")
    gaz = default_gazetteer()
    pages, _ = pages_dataframe(spark, 30, 42)
    articles = extract_articles(pages).cache()

    baseline = extract_mentions_cached(articles, gaz, cache, version=1)
    expected = sorted(
        (r["url"], r["entity_type"], r["name"]) for r in baseline.collect()
    )

    # simulate a crashed append: clone a committed batch, strip _SUCCESS
    vdir = os.path.join(cache, "v1")
    batches = [d for d in os.listdir(vdir) if d.startswith("batch-")]
    assert batches
    orphan = os.path.join(vdir, "batch-orphan")
    shutil.copytree(os.path.join(vdir, batches[0]), orphan)
    os.remove(os.path.join(orphan, "_SUCCESS"))

    # the orphan's rows must not surface: committed count is unchanged and
    # a rerun still yields exactly the baseline mentions (no duplicates
    # from the orphan part-files, nothing missing)
    again = extract_mentions_cached(articles, gaz, cache, version=1)
    got = sorted(
        (r["url"], r["entity_type"], r["name"]) for r in again.collect()
    )
    assert got == expected


def test_fully_cached_rerun_writes_no_batch(spark, tmp_path):
    """A rerun with zero cache misses must not add a batch dir: the batch
    count in the version dir is unchanged (previously every run appended a
    garbage empty dir, and reads list/open every dir — O(runs) cost)."""
    cache = str(tmp_path / "cache5")
    gaz = default_gazetteer()
    pages, _ = pages_dataframe(spark, 30, 42)
    articles = extract_articles(pages).cache()

    extract_mentions_cached(articles, gaz, cache, version=1).count()
    vdir = os.path.join(cache, "v1")
    n_before = len([d for d in os.listdir(vdir) if d.startswith("batch-")])
    assert n_before >= 1

    # rerun over the same corpus: all hits — with and without stats
    stats = {}
    extract_mentions_cached(articles, gaz, cache, version=1, stats_out=stats).count()
    assert stats["misses"] == 0
    extract_mentions_cached(articles, gaz, cache, version=1).count()
    n_after = len([d for d in os.listdir(vdir) if d.startswith("batch-")])
    assert n_after == n_before


def test_compaction_folds_batches_preserving_rows(spark, tmp_path):
    """compact_extraction_cache folds the committed batches into one dir;
    the deduped row set read back is identical, an uncommitted orphan dir
    is left alone (a concurrent writer may own it), and a second compact
    is a no-op."""
    from hinbox_spark.operators.extraction import compact_extraction_cache

    cache = str(tmp_path / "cache6")
    gaz = default_gazetteer()
    pages_a, _ = pages_dataframe(spark, 20, 42)
    pages_b, _ = pages_dataframe(spark, 20, 7)

    extract_mentions_cached(extract_articles(pages_a), gaz, cache, version=1).count()
    extract_mentions_cached(extract_articles(pages_b), gaz, cache, version=1).count()
    vdir = os.path.join(cache, "v1")
    committed = [d for d in os.listdir(vdir) if d.startswith("batch-")]
    assert len(committed) == 2

    # plant an uncommitted orphan (crashed writer) — must survive compaction
    orphan = os.path.join(vdir, "batch-orphan")
    shutil.copytree(os.path.join(vdir, committed[0]), orphan)
    os.remove(os.path.join(orphan, "_SUCCESS"))

    key = lambda r: tuple(r[c] for c in
                          ("content_hash", "entity_type", "name", "type", "start_date"))
    before = sorted(map(key, read_extraction_cache(spark, cache, 1).collect()))

    assert compact_extraction_cache(spark, cache, version=1) == 2
    after_dirs = [d for d in os.listdir(vdir) if d.startswith("batch-")]
    assert len(after_dirs) == 2  # one folded batch + the untouched orphan
    assert "batch-orphan" in after_dirs
    after = sorted(map(key, read_extraction_cache(spark, cache, 1).collect()))
    assert after == before

    assert compact_extraction_cache(spark, cache, version=1) == 0


def test_old_flat_layout_cannot_poison_new_version(spark, tmp_path):
    """Schema-change safety (ADVICE r2 medium): rows written by an older
    extractor version live in their own subdirectory — a v3 read never
    touches them even when the old schema lacks columns (e.g. match_key)."""
    cache = str(tmp_path / "cache4")
    gaz = default_gazetteer()
    pages, _ = pages_dataframe(spark, 20, 42)
    articles = extract_articles(pages).cache()

    # old-version batch with a REDUCED schema (simulating pre-match_key rows)
    old = extract_mentions_cached(articles, gaz, cache, version=2)
    old.count()
    v2dir = os.path.join(cache, "v2")
    batches = [d for d in os.listdir(v2dir) if d.startswith("batch-")]
    assert batches

    m = extract_mentions_cached(articles, gaz, cache, version=3)
    assert "match_key" in m.columns
    assert m.filter("match_key IS NULL").count() == 0
