"""North-rule input side: the pipeline consuming its pages from an
Iceberg-shaped SnapshotTable instead of raw parquet — a re-crawl is a
MERGE on url (merge-on-read last-wins by warc_ts within the batch), the
pipeline reads `read_resolved(["url"])`, and the incremental content-hash
skip does only the delta work. This pins the full loop the reference
operates (crawl store → extract → merge into entity store) with the pages
store itself versioned: time travel to the pre-recrawl snapshot reproduces
the old corpus bit-for-bit."""

import pyspark.sql.functions as F

from hinbox_spark.pipeline import run_pipeline
from hinbox_spark.sources.pages_gen import pages_dataframe
from hinbox_spark.streaming.incremental import unprocessed_pages
from hinbox_spark.tables import SnapshotTable


def test_pipeline_over_snapshot_pages_store(spark, tmp_path):
    pages, _gold = pages_dataframe(spark, 40, 7)
    store = SnapshotTable(spark, str(tmp_path / "pages_store"))
    store.merge(pages, stats_col="url")
    snap1 = store.latest_snapshot_id()

    out1 = str(tmp_path / "run1")
    t1 = run_pipeline(
        spark, store.read_resolved(["url"]), out1, resume=False
    )
    entities1 = {
        (r["entity_type"], r["canonical_name"])
        for r in t1["entities"].collect()
    }
    assert entities1  # pipeline ran end-to-end off the store

    # identical to running straight off the raw frame (the store is a
    # transparent source, not a semantics change)
    out_raw = str(tmp_path / "run_raw")
    t_raw = run_pipeline(spark, pages, out_raw, resume=False)
    assert entities1 == {
        (r["entity_type"], r["canonical_name"])
        for r in t_raw["entities"].collect()
    }

    # re-crawl: one url's html changes (new warc_ts), one brand-new url
    sample = pages.orderBy("url").limit(1).collect()[0]
    recrawl = spark.createDataFrame(
        [
            (
                sample["url"],
                sample["warc_ts"],
                b"<html><body><article><h1>Updated</h1>"
                b"<p>Alice Rivera met with the World Health Organization "
                b"in Geneva.</p></article></body></html>",
                None,
                "en",
            ),
            (
                "https://example.org/new-page",
                sample["warc_ts"],
                b"<html><body><article><h1>New</h1>"
                b"<p>Brand new page about Alice Rivera.</p>"
                b"</article></body></html>",
                None,
                "en",
            ),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    store.merge(recrawl, stats_col="url")

    resolved = store.read_resolved(["url"])
    assert resolved.count() == 41  # 40 urls, one updated in place, one new

    # the content-hash skip scopes the next run to the 2 changed urls
    prior_articles = spark.read.parquet(out1 + "/articles")
    delta = unprocessed_pages(resolved, prior_articles)
    delta_urls = {r["url"] for r in delta.select("url").collect()}
    assert delta_urls == {sample["url"], "https://example.org/new-page"}

    # time travel: the pre-recrawl snapshot still reproduces run 1's corpus
    old = store.read_resolved(["url"], snapshot_id=snap1)
    assert old.count() == 40
    old_html = old.filter(F.col("url") == sample["url"]).first()["html"]
    assert bytes(old_html) == bytes(sample["html"])
