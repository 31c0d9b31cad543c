"""The full operational loop the engine is built for, composed from its
own pieces: pages live in a SnapshotTable (the crawl store), a ChangeFeed
cursor tails it, each poll's changed urls become an incremental KG delta
(`run_incremental`), and the feed commit advances only after the delta
applied — so a crash between apply and commit re-delivers a window whose
re-application is a no-op (content-hash skip)."""

import dataclasses

import pyspark.sql.functions as F

from hinbox_spark.config import get_default_config
from hinbox_spark.incremental import run_incremental
from hinbox_spark.pipeline import run_pipeline
from hinbox_spark.sources.pages_gen import pages_dataframe
from hinbox_spark.streaming.cdc import ChangeFeed
from hinbox_spark.tables import SnapshotTable


def test_change_feed_drives_incremental_kg_updates(spark, tmp_path):
    # the 52/18-of-70 split test_incremental_store.py pins as
    # field-identical between incremental and batch modes; other splits
    # can legitimately diverge where a store-store merge defers to the
    # review queue (bridge disputes are never automatic, by design)
    pages, _ = pages_dataframe(spark, 70, 7)
    urls = sorted(r.url for r in pages.select("url").collect())
    crawl_a = pages.filter(F.col("url").isin(set(urls[:52])))
    crawl_b = pages.filter(F.col("url").isin(set(urls[52:])))

    crawl = SnapshotTable(spark, str(tmp_path / "crawl"))
    crawl.merge(crawl_a, stats_col="url")

    kg_store = str(tmp_path / "kg")
    cfg = dataclasses.replace(get_default_config(), snapshot_store_path=kg_store)
    feed = ChangeFeed(spark, crawl, str(tmp_path / "cursor"))

    # bootstrap the KG from the first feed window (batch mode)
    df, head, commit = feed.poll()
    seed_urls = df.select("url").dropDuplicates(["url"])
    seed_pages = crawl.read_resolved(["url"], scope=seed_urls)
    run_pipeline(spark, seed_pages, str(tmp_path / "boot"), cfg=cfg, resume=False)
    commit()
    assert feed.poll() is None  # caught up

    # a new crawl batch lands; the tail loop applies it as a delta
    crawl.merge(crawl_b, stats_col="url")
    df, head, commit = feed.poll()
    delta_urls = df.select("url").dropDuplicates(["url"])
    delta_pages = crawl.read_resolved(["url"], scope=delta_urls)
    assert delta_pages.count() == 18
    run_incremental(spark, delta_pages, str(tmp_path / "inc1"), cfg=cfg)

    # crash BEFORE commit: the same window re-delivers; re-applying it is
    # a store no-op (content-hash skip) and the loop then commits
    ent = SnapshotTable(spark, kg_store + "/entities")
    head_after = ent.latest_snapshot_id()
    df2, head2, commit2 = feed.poll()
    redelivered = crawl.read_resolved(
        ["url"], scope=df2.select("url").dropDuplicates(["url"])
    )
    run_incremental(spark, redelivered, str(tmp_path / "inc2"), cfg=cfg)
    assert ent.latest_snapshot_id() == head_after  # no-op re-application
    commit2()
    assert feed.poll() is None

    # the tailed KG equals a from-scratch batch over the full crawl
    full_cfg = dataclasses.replace(
        get_default_config(), snapshot_store_path=str(tmp_path / "kg_full")
    )
    full = run_pipeline(
        spark,
        crawl.read_resolved(["url"]),
        str(tmp_path / "full"),
        cfg=full_cfg,
        resume=False,
    )
    tailed = {
        (r["entity_type"], r["canonical_name"])
        for r in ent.read_resolved(["entity_id"]).collect()
    }
    batch = {
        (r["entity_type"], r["canonical_name"])
        for r in full["entities"].collect()
    }
    assert tailed == batch and tailed
