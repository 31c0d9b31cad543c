"""SnapshotTable — the Iceberg-shaped entity store (SURVEY §1.3): atomic
optimistic commits, snapshot isolation / time travel, merge-on-read upsert,
crash invisibility. Mirrors the reference's atomic-rewrite requirement
(src/utils/file_ops.py:292-303) with snapshot semantics on top."""

import json
import os

import pyspark.sql.functions as F
import pytest

from hinbox_spark.tables import CommitConflict, SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "entity_id string, name string, v int")


def test_append_read_roundtrip_and_union(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.append(_df(spark, [("a", "Alpha", 1), ("b", "Beta", 1)]))
    s2 = t.append(_df(spark, [("c", "Gamma", 1)]))
    assert (s1, s2) == (1, 2)
    assert t.read().count() == 3
    got = {r["entity_id"] for r in t.read().collect()}
    assert got == {"a", "b", "c"}


def test_time_travel_and_snapshot_isolation(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]))
    t.overwrite(_df(spark, [("z", "Zeta", 9)]))
    # latest sees only the overwrite; snapshot 1 still reads the old data
    assert {r["entity_id"] for r in t.read().collect()} == {"z"}
    assert {r["entity_id"] for r in t.read(snapshot_id=1).collect()} == {"a"}


def test_merge_is_last_writer_wins_on_read(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1), ("b", "Beta", 1)]))
    t.merge(_df(spark, [("a", "Alpha Prime", 2), ("c", "Gamma", 1)]))
    resolved = {
        r["entity_id"]: (r["name"], r["v"])
        for r in t.read_resolved(["entity_id"]).collect()
    }
    assert resolved == {
        "a": ("Alpha Prime", 2),  # upserted
        "b": ("Beta", 1),          # untouched
        "c": ("Gamma", 1),         # inserted
    }
    # raw read still shows both versions of 'a' (merge-on-read, no rewrite)
    assert t.read().filter(F.col("entity_id") == "a").count() == 2


def test_compact_folds_delta_chain(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]))
    t.merge(_df(spark, [("a", "Alpha2", 2)]))
    t.compact(["entity_id"])
    manifest = t._read_manifest(t.latest_snapshot_id())
    assert manifest["operation"] == "compact"
    assert len(manifest["entries"]) == 1
    assert t.read().count() == 1
    assert t.read().first()["name"] == "Alpha2"


def test_uncommitted_batch_is_invisible(spark, tmp_path):
    """Crash atomicity: a data batch without a committed manifest must not
    surface; a torn temp manifest must not surface either."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]))
    # simulate a crashed writer: orphan batch dir + torn temp manifest
    orphan = _df(spark, [("x", "Ghost", 1)])
    orphan.write.mode("overwrite").parquet(t.data_dir + "/batch-orphan")
    with open(os.path.join(str(tmp_path / "t"), "snapshots", "_tmp-dead.json"), "w") as f:
        f.write('{"id": 99, "entries": [{"batch": "batch-orphan"')  # torn
    assert {r["entity_id"] for r in t.read().collect()} == {"a"}
    assert t.latest_snapshot_id() == 1


def test_optimistic_commit_retries_past_a_racing_writer(spark, tmp_path):
    """If another writer claims the next snapshot id first, the commit must
    retry on top of the new head, not clobber or fail."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]))
    # a "racing writer" pre-claims snapshot id 2 referencing no batches
    racing = {"id": 2, "parent": 1, "operation": "append", "entries": []}
    with open(os.path.join(str(tmp_path / "t"), "snapshots",
                           "snapshot-%012d.json" % 2), "w") as f:
        json.dump(racing, f)
    sid = t.append(_df(spark, [("b", "Beta", 1)]))
    assert sid == 3  # landed after the racer
    # the committed manifest builds on the racer's (empty) entry list
    assert {r["entity_id"] for r in t.read().collect()} == {"b"}


def test_commit_conflict_after_exhausted_retries(spark, tmp_path, monkeypatch):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]))
    from hinbox_spark import fs as hfs

    monkeypatch.setattr(hfs, "publish_without_overwrite", lambda *_a, **_k: False)
    with pytest.raises(CommitConflict):
        t.append(_df(spark, [("b", "Beta", 1)]))


def test_publish_without_overwrite_is_create_exclusive(spark, tmp_path):
    """ADVICE r3: the commit publish on file: is a hard link (atomic
    create-exclusive in the kernel), not an exists()-precheck rename — a
    pre-existing destination loses cleanly and the temp file survives for
    the caller to clean up; a winning publish removes the temp."""
    from hinbox_spark import fs as hfs

    src = str(tmp_path / "tmp-manifest.json")
    dst = str(tmp_path / "snapshot-1.json")
    with open(src, "w") as f:
        f.write('{"id": 1}')
    with open(dst, "w") as f:
        f.write('{"id": "other writer"}')
    assert hfs.publish_without_overwrite(spark, src, dst) is False
    assert os.path.exists(src)  # loser keeps its temp (caller deletes)
    with open(dst) as f:
        assert "other writer" in f.read()  # winner untouched

    dst2 = str(tmp_path / "snapshot-2.json")
    assert hfs.publish_without_overwrite(spark, src, dst2) is True
    assert not os.path.exists(src)  # temp consumed on success
    with open(dst2) as f:
        assert f.read() == '{"id": 1}'


def test_expire_snapshots_gc(spark, tmp_path):
    """expire_snapshots drops old manifests, deletes the batches only they
    referenced, keeps every batch the head still needs, and GCs aged
    orphan batches (crashed writers) under the grace window."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]))
    t.merge(_df(spark, [("a", "Alpha2", 2)]))
    t.compact(["entity_id"])  # head now references ONE folded batch

    # plant an aged orphan batch (crashed writer, never committed)
    _df(spark, [("x", "Ghost", 1)]).write.mode("overwrite").parquet(
        t.data_dir + "/batch-orphan"
    )
    old = 1_000_000_000  # epoch seconds, far older than any manifest
    os.utime(t.data_dir + "/batch-orphan", (old, old))

    stats = t.expire_snapshots(keep_last=1, orphan_grace_ms=0)
    assert stats == {
        "snapshots_removed": 2, "batches_removed": 2, "orphans_removed": 1,
    }
    # table still reads correctly from the kept snapshot
    assert t.latest_snapshot_id() == 3
    assert {(r["entity_id"], r["name"]) for r in
            t.read_resolved(["entity_id"]).collect()} == {("a", "Alpha2")}
    # on disk: exactly the head's batch remains
    batches = [d for d in os.listdir(os.path.join(str(tmp_path / "t"), "data"))]
    head_batches = {e["batch"] for e in t._read_manifest(3)["entries"]}
    assert set(batches) == head_batches


def test_expire_snapshots_spares_fresh_orphans(spark, tmp_path):
    """A just-written orphan (an in-flight writer's batch) survives the
    grace window."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]))
    _df(spark, [("x", "InFlight", 1)]).write.mode("overwrite").parquet(
        t.data_dir + "/batch-inflight"
    )
    stats = t.expire_snapshots(keep_last=1, orphan_grace_ms=60_000)
    assert stats["orphans_removed"] == 0
    assert os.path.isdir(t.data_dir.replace("file:", "") + "/batch-inflight")


def test_expire_interrupted_mid_delete_leaves_table_readable(
    spark, tmp_path, monkeypatch
):
    """Crash safety: manifests are deleted before their batches, so an
    expiry that dies mid-way leaves the head snapshot fully readable and a
    re-run finishes the GC."""
    from hinbox_spark import fs as hfs

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]))
    t.merge(_df(spark, [("a", "Alpha2", 2)]))
    t.compact(["entity_id"])

    real_delete = hfs.delete
    calls = {"n": 0}

    def _dying_delete(spark_, path, recursive=False):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("interrupted mid-expiry")
        return real_delete(spark_, path, recursive)

    monkeypatch.setattr(hfs, "delete", _dying_delete)
    with pytest.raises(RuntimeError, match="interrupted mid-expiry"):
        t.expire_snapshots(keep_last=1)
    monkeypatch.undo()

    # head is untouched and resolves correctly after the partial expiry
    assert t.latest_snapshot_id() == 3
    assert {(r["entity_id"], r["name"]) for r in
            t.read_resolved(["entity_id"]).collect()} == {("a", "Alpha2")}
    # re-running completes the GC
    t.expire_snapshots(keep_last=1)
    head_batches = {e["batch"] for e in t._read_manifest(3)["entries"]}
    batches = set(os.listdir(os.path.join(str(tmp_path / "t"), "data")))
    assert batches == head_batches


def test_review_queue_is_append_only_across_runs(spark, tmp_path):
    """Reference parity (append-only dispute queue): two pipeline runs over
    different corpora into one snapshot store accumulate BOTH runs' review
    rows in the review_queue table, each attributed to its run, while the
    per-run review tables keep their overwrite semantics."""
    from hinbox_spark.config import DomainConfig
    from hinbox_spark.pipeline import run_pipeline
    from hinbox_spark.sources.pages_gen import pages_dataframe

    store = str(tmp_path / "store")
    cfg = DomainConfig(snapshot_store_path=store)
    pages_a, _ = pages_dataframe(spark, 60, 7)
    pages_b, _ = pages_dataframe(spark, 60, 13)

    t1 = run_pipeline(spark, pages_a, str(tmp_path / "o1"), cfg=cfg, resume=False)
    t2 = run_pipeline(spark, pages_b, str(tmp_path / "o2"), cfg=cfg, resume=False)
    n1, n2 = t1["review"].count(), t2["review"].count()
    assert n1 > 0 and n2 > 0

    q = SnapshotTable(spark, store + "/review_queue").read()
    assert q.count() == n1 + n2
    assert q.select("run_id").distinct().count() == 2
    # every queued row keeps its decision payload
    assert {r["decision"] for r in q.select("decision").distinct().collect()} <= {
        "merge", "skip", "defer"
    }


def test_pipeline_publishes_entity_snapshots(spark, tmp_path):
    """snapshot_store_path wiring: each pipeline run commits its entities
    as one snapshot; re-processing upserts by entity_id (no duplicates in
    the resolved view), and older snapshots remain time-travelable."""
    from hinbox_spark.config import DomainConfig
    from hinbox_spark.pipeline import run_pipeline
    from hinbox_spark.sources.pages_gen import pages_dataframe

    store = str(tmp_path / "store")
    cfg = DomainConfig(snapshot_store_path=store)
    pages, _ = pages_dataframe(spark, 30, 42)

    t1 = run_pipeline(spark, pages, str(tmp_path / "o1"), cfg=cfg, resume=False)
    t2 = run_pipeline(spark, pages, str(tmp_path / "o2"), cfg=cfg, resume=False)
    n_entities = t1["entities"].count()

    t = SnapshotTable(spark, store + "/entities")
    assert t.latest_snapshot_id() == 2
    resolved = t.read_resolved(["entity_id"])
    assert resolved.count() == n_entities            # upsert, not duplicate
    assert t.read(snapshot_id=1).count() == n_entities  # time travel intact


def test_compact_sort_by_clusters_file_layout(spark, tmp_path):
    """Sorted compaction (rewrite-with-sort-order): after
    compact(sort_by=[key]), each parquet file of the compacted batch
    covers a disjoint key range (file-level min/max don't overlap), so
    min/max pruning serves point lookups from one file; resolved content
    is identical to an unsorted compact."""
    import glob

    import pyarrow.parquet as pq

    t = SnapshotTable(spark, str(tmp_path / "t"))
    rows = [("e%04d" % i, "N%d" % i, i % 3) for i in range(400)]
    t.append(_df(spark, rows))
    t.merge(_df(spark, [("e0001", "Renamed", 9)]))
    before = {(r["entity_id"], r["name"])
              for r in t.read_resolved(["entity_id"]).collect()}
    t.compact(["entity_id"], sort_by=["entity_id"], sort_partitions=4)
    after = {(r["entity_id"], r["name"])
             for r in t.read_resolved(["entity_id"]).collect()}
    assert after == before  # layout change only, same table

    manifest = t._read_manifest(t.latest_snapshot_id())
    batch_dir = t.data_dir + "/" + manifest["entries"][0]["batch"]
    ranges = []
    for f in glob.glob(batch_dir.replace("file:", "") + "/part-*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # entity_id is first
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) > 1  # actually split across files
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint key ranges across files


def test_catalog_create_load_list_drop(spark, tmp_path):
    """Filesystem catalog: atomic create (second create of the same name
    raises), load/list see only committed tables, drop unregisters before
    deleting data."""
    from hinbox_spark.tables import Catalog, CommitConflict

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("kg", "entities")
    t.append(_df(spark, [("a", "Alpha", 1)]))
    with pytest.raises(CommitConflict):
        cat.create_table("kg", "entities")
    assert cat.list_tables("kg") == ["entities"]
    assert cat.table_exists("kg", "entities")
    assert cat.load_table("kg", "entities").read().count() == 1

    # a bare directory without a marker (crashed create) is invisible
    import os
    os.makedirs(str(tmp_path / "wh" / "kg" / "ghost"))
    assert cat.list_tables("kg") == ["entities"]
    with pytest.raises(FileNotFoundError):
        cat.load_table("kg", "ghost")

    assert cat.drop_table("kg", "entities") is True
    assert cat.list_tables("kg") == []
    assert cat.drop_table("kg", "entities") is False
    with pytest.raises(ValueError):
        cat.create_table("kg", "bad/name")


def test_read_resolved_scope_prunes_before_resolution(spark, tmp_path):
    """`scope` restricts merge-on-read resolution to the given keys via a
    broadcast semi-join BEFORE the resolve shuffle — the incremental
    point-lookup path. Result == unscoped resolve filtered afterwards."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.createDataFrame(
        [("a", "u1", 1), ("a", "u2", 2), ("b", "u1", 3)],
        "k string, u string, v int"))
    t.merge(spark.createDataFrame(
        [("a", "u1", 10), ("c", "u9", 9)], "k string, u string, v int"))

    scope = spark.createDataFrame([("a",)], "k string")
    scoped = t.read_resolved(["k", "u"], scope=scope)
    full = t.read_resolved(["k", "u"]).filter(F.col("k") == "a")
    assert sorted(map(tuple, scoped.collect())) == sorted(map(tuple, full.collect()))
    # last-writer-wins survives the scoping
    assert {(r.u, r.v) for r in scoped.collect()} == {("u1", 10), ("u2", 2)}
    # the scope join is broadcast (no shuffle of the raw table for the
    # filter) and the non-prefix misuse is rejected
    assert "BroadcastHashJoin" in scoped._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(AssertionError):
        t.read_resolved(["k", "u"], scope=spark.createDataFrame([("u1",)], "u string"))


def test_rollback_to_unpublishes_later_batches(spark, tmp_path):
    """rollback_to commits a new snapshot with the historical entry list:
    later batches disappear from reads, history stays for time travel;
    rollback_to(None) restores the empty pre-creation state."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.append(spark.createDataFrame([("a", 1)], "k string, v int"))
    t.append(spark.createDataFrame([("b", 2)], "k string, v int"))
    t.rollback_to(s1)
    assert {r.k for r in t.read().collect()} == {"a"}
    # time travel still sees the rolled-back state
    assert {r.k for r in t.read(snapshot_id=2).collect()} == {"a", "b"}
    t.rollback_to(None)
    assert t.n_batches() == 0


def test_schema_evolution_add_column_reads_null_backfill(spark, tmp_path):
    """Iceberg add-column semantics: batches written before a column
    existed read it as NULL; no committed data is rewritten. Works in both
    directions (old batch missing the new column, late batch missing an
    original one)."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]))
    # evolved writer: adds a 'score' column
    t.merge(
        spark.createDataFrame(
            [("b", "Beta", 1, 0.5)],
            "entity_id string, name string, v int, score double",
        )
    )
    # narrow late writer: misses 'v' entirely
    t.append(
        spark.createDataFrame([("c", "Gamma")], "entity_id string, name string")
    )
    rows = {r["entity_id"]: r for r in t.read().collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["score"] is None and rows["b"]["score"] == 0.5
    assert rows["c"]["v"] is None and rows["c"]["score"] is None
    resolved = {
        r["entity_id"]: r for r in t.read_resolved(["entity_id"]).collect()
    }
    assert resolved["b"]["score"] == 0.5 and resolved["a"]["score"] is None


def test_manifest_stats_prune_batches_from_scoped_reads(spark, tmp_path):
    """Batches carry their key range in the manifest (stats_col); a scoped
    read_resolved never scans a batch whose range excludes every scope key
    — visible in the physical plan as the absent batch path. Batches
    without stats are conservatively kept."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.merge(_df(spark, [("a1", "A1", 1), ("b1", "B1", 1)]), stats_col="entity_id")
    t.merge(_df(spark, [("m1", "M1", 1), ("n1", "N1", 1)]), stats_col="entity_id")
    t.merge(_df(spark, [("x1", "X1", 1), ("z1", "Z1", 1)]), stats_col="entity_id")
    manifest_entries = t._read_manifest(t.latest_snapshot_id())["entries"]
    assert all("stats" in e for e in manifest_entries)
    by_seq = {e["seq"]: e["batch"] for e in manifest_entries}

    scope = spark.createDataFrame([("m1",)], "entity_id string")
    scoped = t.read_resolved(["entity_id"], scope=scope)
    files = "\n".join(scoped.inputFiles())
    assert by_seq[2] in files          # the batch holding m1 is scanned
    assert by_seq[1] not in files      # [a1, b1] pruned via manifest range
    assert by_seq[3] not in files      # [x1, z1] pruned via manifest range
    assert {r["entity_id"] for r in scoped.collect()} == {"m1"}

    # a stats-less batch (older writer) is always scanned
    t.merge(_df(spark, [("q1", "Q1", 1)]))  # no stats_col
    scoped2 = t.read_resolved(["entity_id"], scope=scope)
    files2 = "\n".join(scoped2.inputFiles())
    new_batch = t._read_manifest(t.latest_snapshot_id())["entries"][-1]["batch"]
    assert new_batch in files2
    assert {r["entity_id"] for r in scoped2.collect()} == {"m1"}

    # scope outside EVERY batch range: zero rows, nothing breaks
    none_scope = spark.createDataFrame([("zzzz",)], "entity_id string")
    out = t.read_resolved(["entity_id"], scope=none_scope)
    assert out.count() == 0


def test_pruned_and_unpruned_scoped_reads_agree(spark, tmp_path):
    """Pruning is an optimization, never a semantics change: resolved rows
    for a scope match the unpruned resolution filtered to the scope —
    including when the winning row for a key lives in a later batch."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.merge(_df(spark, [("k1", "old", 1), ("k2", "old", 1)]), stats_col="entity_id")
    t.merge(_df(spark, [("k1", "new", 2)]), stats_col="entity_id")
    scope = spark.createDataFrame([("k1",)], "entity_id string")
    scoped = {
        r["entity_id"]: (r["name"], r["v"])
        for r in t.read_resolved(["entity_id"], scope=scope).collect()
    }
    full = {
        r["entity_id"]: (r["name"], r["v"])
        for r in t.read_resolved(["entity_id"]).collect()
        if r["entity_id"] == "k1"
    }
    assert scoped == full == {"k1": ("new", 2)}


def test_delete_is_merge_on_read_and_revivable(spark, tmp_path):
    """Row-level delete commits only key tombstones: the deleted key
    vanishes from read_resolved, raw read keeps the tombstone row as an
    event, a later merge revives the key, and compaction folds tombstones
    away entirely."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.merge(_df(spark, [("a", "Alpha", 1), ("b", "Beta", 1)]))
    t.delete(spark.createDataFrame([("a",)], "entity_id string"))

    resolved = {r["entity_id"] for r in t.read_resolved(["entity_id"]).collect()}
    assert resolved == {"b"}
    # "_tombstone" is an internal marker, never in resolved output
    assert "_tombstone" not in t.read_resolved(["entity_id"]).columns

    raw = t.read().collect()
    tombs = [r for r in raw if r["_tombstone"]]
    assert len(raw) == 3 and len(tombs) == 1 and tombs[0]["entity_id"] == "a"
    assert tombs[0]["name"] is None  # schema-reconciled null payload

    # revive: a later merge outranks the tombstone
    t.merge(_df(spark, [("a", "Alpha2", 2)]))
    rows = {r["entity_id"]: r["name"] for r in t.read_resolved(["entity_id"]).collect()}
    assert rows == {"a": "Alpha2", "b": "Beta"}

    # delete again, then compact: tombstones fold away physically
    t.delete(spark.createDataFrame([("a",)], "entity_id string"))
    t.compact(["entity_id"])
    assert t.n_batches() == 1
    final = t.read().collect()
    assert {r["entity_id"] for r in final} == {"b"}
    assert "_tombstone" not in spark.read.parquet(
        t.data_dir + "/" + t._read_manifest(t.latest_snapshot_id())["entries"][0]["batch"]
    ).columns


def test_read_changes_feeds_cdc_consumers(spark, tmp_path):
    """Incremental read between snapshots returns exactly the batches that
    entered in that window, tagged with operation lineage — including
    delete tombstones as events; from==head yields an empty frame."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.merge(_df(spark, [("a", "Alpha", 1)]))
    s2 = t.merge(_df(spark, [("b", "Beta", 1), ("a", "Alpha2", 2)]))
    t.delete(spark.createDataFrame([("a",)], "entity_id string"))
    s3 = t.latest_snapshot_id()

    full = t.read_changes(None)
    assert full.count() == 4  # 1 + 2 + 1 tombstone

    win = t.read_changes(s1, s3).collect()
    assert len(win) == 3
    ops = {(r["entity_id"], r["_operation"], bool(r["_tombstone"])) for r in win}
    assert ops == {
        ("b", "merge", False),
        ("a", "merge", False),
        ("a", "delete", True),
    }

    upto = t.read_changes(s1, s2)
    assert upto.count() == 2 and {r["_operation"] for r in upto.collect()} == {"merge"}

    assert t.read_changes(s3).count() == 0  # caught-up consumer


def test_diff_reports_added_removed_changed(spark, tmp_path):
    """Snapshot diff over resolved states: upsert → changed, new key →
    added, tombstoned key → removed, untouched key absent; a column added
    between snapshots with only-null values does not flag unchanged keys."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    s1 = t.merge(_df(spark, [("a", "Alpha", 1), ("b", "Beta", 1), ("c", "Gamma", 1)]))
    t.merge(_df(spark, [("a", "Alpha2", 2)]))                   # changed
    t.merge(
        spark.createDataFrame(
            [("d", "Delta", 1, None)],
            "entity_id string, name string, v int, score double",
        )
    )                                                           # added (+ evolved col)
    t.delete(spark.createDataFrame([("c",)], "entity_id string"))  # removed

    got = {
        r["entity_id"]: r["change_type"]
        for r in t.diff(["entity_id"], s1).collect()
    }
    assert got == {"a": "changed", "d": "added", "c": "removed"}  # b untouched

    # from None: everything currently visible is 'added'
    base = {r["entity_id"]: r["change_type"] for r in t.diff(["entity_id"], None).collect()}
    assert base == {"a": "added", "b": "added", "d": "added"}


def test_merge_into_conditional_actions_one_atomic_commit(spark, tmp_path):
    """Full MERGE INTO: matched+condition → tombstone, matched otherwise →
    update, unmatched → insert, untouched keys not rewritten — all in ONE
    snapshot; a scoped read proves only changed rows entered the batch."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.merge(
        _df(spark, [("a", "Alpha", 1), ("b", "Beta", 1), ("c", "Gamma", 1)]),
        stats_col="entity_id",
    )
    head_before = t.latest_snapshot_id()

    source = _df(spark, [
        ("a", "Alpha2", 2),      # matched, update
        ("b", "RETIRED", 0),     # matched, delete condition fires (v=0)
        ("d", "Delta", 1),       # unmatched, insert
    ])
    t.merge_into(
        source, ["entity_id"],
        when_matched_delete=(F.col("s.v") == 0),
        stats_col="entity_id",
    )
    assert t.latest_snapshot_id() == head_before + 1  # ONE commit
    assert t.n_batches() == 2                          # ONE new batch

    resolved = {
        r["entity_id"]: (r["name"], r["v"])
        for r in t.read_resolved(["entity_id"]).collect()
    }
    assert resolved == {
        "a": ("Alpha2", 2),   # updated
        "c": ("Gamma", 1),    # untouched, NOT rewritten
        "d": ("Delta", 1),    # inserted
    }
    # the merge batch holds exactly the 3 changed rows (2 writes + 1 tombstone)
    new_batch = t._read_manifest(t.latest_snapshot_id())["entries"][-1]["batch"]
    rows = spark.read.parquet(t.data_dir + "/" + new_batch).collect()
    assert len(rows) == 3
    assert {r["entity_id"] for r in rows if r["_tombstone"]} == {"b"}


def test_merge_into_insert_only_and_update_only_modes(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.merge(_df(spark, [("a", "Alpha", 1)]))

    # insert-only (WHEN NOT MATCHED THEN INSERT, no matched action)
    t.merge_into(
        _df(spark, [("a", "SHOULD_NOT_APPLY", 9), ("b", "Beta", 1)]),
        ["entity_id"], when_matched_update=False,
    )
    resolved = {r["entity_id"]: r["name"]
                for r in t.read_resolved(["entity_id"]).collect()}
    assert resolved == {"a": "Alpha", "b": "Beta"}

    # update-only (no insert)
    t.merge_into(
        _df(spark, [("a", "Alpha2", 2), ("z", "NOPE", 1)]),
        ["entity_id"], when_not_matched_insert=False,
    )
    resolved = {r["entity_id"]: r["name"]
                for r in t.read_resolved(["entity_id"]).collect()}
    assert resolved == {"a": "Alpha2", "b": "Beta"}

    import pytest as _pytest
    with _pytest.raises(ValueError):
        t.merge_into(_df(spark, [("a", "x", 1)]), ["entity_id"],
                     when_matched_update=False, when_not_matched_insert=False)


def test_compact_zorder_gives_multi_column_pruning_ranges(spark, tmp_path):
    """Z-order compaction: per-file min/max footer ranges are narrow on
    BOTH clustered columns (multi-column data skipping), where a plain
    single-column sort leaves the second column's per-file range at full
    width; resolved content identical."""
    import glob

    import pyarrow.parquet as pq

    # independent 64×64 grid: x and y carry no mutual information, so a
    # single-column sort CANNOT narrow the other column's file ranges
    rows = [
        ("e%05d" % i, "N", 0, i % 64, (i // 64) % 64) for i in range(4096)
    ]
    df = spark.createDataFrame(
        rows, "entity_id string, name string, v int, x int, y int"
    )

    def file_ranges(t, col_index):
        manifest = t._read_manifest(t.latest_snapshot_id())
        batch_dir = t.data_dir + "/" + manifest["entries"][0]["batch"]
        widths = []
        for f in glob.glob(batch_dir.replace("file:", "") + "/part-*.parquet"):
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_index).statistics
                mins.append(st.min)
                maxs.append(st.max)
            widths.append(max(maxs) - min(mins))
        return widths

    tz = SnapshotTable(spark, str(tmp_path / "tz"))
    tz.append(df)
    before = {r["entity_id"] for r in tz.read_resolved(["entity_id"]).collect()}
    tz.compact(["entity_id"], zorder_by=["x", "y"], sort_partitions=16)
    assert {r["entity_id"] for r in tz.read_resolved(["entity_id"]).collect()} == before

    # x is column 3, y is column 4 (schema order)
    x_widths, y_widths = file_ranges(tz, 3), file_ranges(tz, 4)
    assert len(x_widths) >= 8
    # every z-ordered file covers a small hyper-rectangle: BOTH columns'
    # per-file ranges well under the 63-wide global range
    assert sum(x_widths) / len(x_widths) < 0.55 * 63
    assert sum(y_widths) / len(y_widths) < 0.55 * 63

    # contrast: sort_by x alone — y stays full-width per file
    ts = SnapshotTable(spark, str(tmp_path / "ts"))
    ts.append(df)
    ts.compact(["entity_id"], sort_by=["x"], sort_partitions=16)
    y_sorted = file_ranges(ts, 4)
    assert sum(y_sorted) / len(y_sorted) > 0.9 * 63


def test_read_changes_skips_compact_snapshots(spark, tmp_path):
    """A compact() snapshot is a REWRITE of already-emitted rows, not new
    data: the CDC feed must skip it entirely (Iceberg's incremental append
    scan skips REPLACE snapshots), or every routine compaction would replay
    the whole resolved table and downstream delta consumers double-count."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]))        # snap 1
    t.merge(_df(spark, [("a", "Alpha2", 2)]))        # snap 2
    t.compact(["entity_id"])                         # snap 3 — rewrite only
    t.append(_df(spark, [("b", "Beta", 1)]))         # snap 4
    rows = t.read_changes(1).collect()               # window 2..4
    assert {(r["entity_id"], r["v"]) for r in rows} == {("a", 2), ("b", 1)}
    assert {r["_operation"] for r in rows} == {"merge", "append"}

    # a cursor sitting ON the compact snapshot still sees only later deltas
    rows3 = t.read_changes(3).collect()
    assert {(r["entity_id"], r["v"]) for r in rows3} == {("b", 1)}


def test_read_changes_after_expire_snapshots(spark, tmp_path):
    """expire_snapshots GCs old manifests; read_changes with a cursor below
    the surviving history must fail LOUDLY (a silent partial feed would
    double-count downstream), while cursor=None treats the oldest surviving
    manifest's full entry set as the complete remaining history."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]))    # snap 1
    t.append(_df(spark, [("b", "Beta", 1)]))     # snap 2
    t.append(_df(spark, [("c", "Gamma", 1)]))    # snap 3
    t.expire_snapshots(keep_last=2)              # drops manifest 1

    # snap 2's parent manifest (1) is gone → cursor=1 raises, not partial
    with pytest.raises(FileNotFoundError, match="expired"):
        t.read_changes(1)

    # cursor inside the surviving window still works
    assert {r["entity_id"] for r in t.read_changes(2).collect()} == {"c"}

    # from the beginning: full replay of everything still visible
    got = {r["entity_id"] for r in t.read_changes(None).collect()}
    assert got == {"a", "b", "c"}


def test_all_pruned_read_keeps_union_schema(spark, tmp_path):
    """When manifest pruning eliminates every batch, the empty frame must
    carry the UNION schema of the snapshot's batches — a delete() tombstone
    batch at the head (key + _tombstone only) must not silently drop the
    payload columns schema-dependent callers select."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]), stats_col="entity_id")
    t.delete(
        spark.createDataFrame([("a",)], "entity_id string"),
        stats_col="entity_id",
    )
    out = t.read(prune_keys=("entity_id", ["zzz"]))  # prunes every batch
    assert out.count() == 0
    assert {"entity_id", "name", "v", "_tombstone", "_seq"} <= set(out.columns)

    # same guarantee on the read_changes empty-window path
    head = t.latest_snapshot_id()
    feed = t.read_changes(head, head)
    assert feed.count() == 0
    assert {"entity_id", "name", "v", "_tombstone", "_seq", "_operation"} <= set(
        feed.columns
    )


def test_read_resolved_oversize_scope_skips_prune_collect(
    spark, tmp_path, monkeypatch
):
    """read_resolved(scope=...) must not collect an unbounded scope to the
    driver: above _SCOPE_PRUNE_CAP the bounded probe skips manifest pruning
    (an optimization, never the correctness path) and resolution goes
    through the semi-join alone — same answer, no driver-side key list."""
    import hinbox_spark.tables as tables_mod

    monkeypatch.setattr(tables_mod, "_SCOPE_PRUNE_CAP", 2)
    collected = []
    orig = SnapshotTable.read

    def spy_read(self, snapshot_id=None, prune_keys=None):
        collected.append(prune_keys)
        return orig(self, snapshot_id, prune_keys)

    monkeypatch.setattr(SnapshotTable, "read", spy_read)

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(
        _df(spark, [("a", "Alpha", 1), ("b", "Beta", 1)]), stats_col="entity_id"
    )
    t.merge(
        _df(spark, [("c", "Gamma", 1), ("d", "Delta", 1)]), stats_col="entity_id"
    )

    big_scope = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "entity_id string"
    )  # 3 keys > cap 2
    out = t.read_resolved(["entity_id"], scope=big_scope)
    assert {r["entity_id"] for r in out.collect()} == {"a", "b", "c"}
    assert collected[-1] is None  # prune path skipped above the cap

    small_scope = spark.createDataFrame([("d",)], "entity_id string")
    out2 = t.read_resolved(["entity_id"], scope=small_scope)
    assert {r["entity_id"] for r in out2.collect()} == {"d"}
    assert collected[-1] is not None  # point lookup still prunes


def test_all_pruned_schema_is_metadata_only(spark, tmp_path):
    """Manifests record each batch's columns, so the all-pruned empty frame
    comes from manifest JSON alone — proven by deleting the data files
    from disk: the footer-merging fallback would crash, the metadata path
    must not notice (the point-lookup MISS on a table with thousands of
    batches reads zero files)."""
    import shutil

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]), stats_col="entity_id")
    t.delete(
        spark.createDataFrame([("a",)], "entity_id string"),
        stats_col="entity_id",
    )
    head = t._read_manifest(t.latest_snapshot_id())
    assert all("columns" in e for e in head["entries"])
    shutil.rmtree(t.data_dir)  # no data files left — metadata must suffice
    out = t.read(prune_keys=("entity_id", ["zzz"]))
    assert out.count() == 0
    assert {"entity_id", "name", "v", "_tombstone", "_seq"} <= set(out.columns)


def test_read_changes_corrupt_parent_manifest_propagates(spark, tmp_path):
    """Only a verifiably ABSENT parent manifest means 'history expired'; a
    corrupt (present but unreadable) one must raise, not silently reset
    parent_batches and double-count the feed."""
    from hinbox_spark.tables import _SNAP_FMT

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [("a", "Alpha", 1)]))
    t.append(_df(spark, [("b", "Beta", 1)]))
    # corrupt snapshot 1 (parent of 2) in place
    p = os.path.join(str(tmp_path / "t"), "snapshots", _SNAP_FMT % 1)
    with open(p, "w") as f:
        f.write("{ not json")
    with pytest.raises(Exception):
        t.read_changes(None).collect()
