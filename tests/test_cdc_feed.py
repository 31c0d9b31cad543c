"""ChangeFeed (streaming/cdc.py): a durable cursor over
SnapshotTable.read_changes — each poll returns exactly the unconsumed
tail, a crash before commit re-delivers the same window (at-least-once),
commit is idempotent, and a pinned head keeps racing writers out of an
in-flight window."""

from hinbox_spark.streaming.cdc import ChangeFeed
from hinbox_spark.tables import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "entity_id string, name string, v int")


def test_change_feed_tail_commit_and_redelivery(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "t"))
    feed = ChangeFeed(spark, table, str(tmp_path / "cursor"))
    assert feed.poll() is None  # empty table

    table.merge(_df(spark, [("a", "Alpha", 1)]))
    table.merge(_df(spark, [("b", "Beta", 1)]))

    out = feed.poll()
    assert out is not None
    df, head, commit = out
    assert {r["entity_id"] for r in df.collect()} == {"a", "b"}
    assert head == 2

    # crash before commit: the SAME window is re-delivered
    df2, head2, commit2 = feed.poll()
    assert head2 == 2 and df2.count() == 2

    commit2()
    assert feed.position() == 2
    assert feed.poll() is None  # caught up

    # new commits resume from the cursor; deletes ride along as events
    table.merge(_df(spark, [("c", "Gamma", 1)]))
    table.delete(spark.createDataFrame([("a",)], "entity_id string"))
    df3, head3, commit3 = feed.poll()
    rows = df3.collect()
    assert head3 == 4 and len(rows) == 2
    assert {(r["entity_id"], bool(r["_tombstone"])) for r in rows} == {
        ("c", False), ("a", True),
    }
    commit3()
    # idempotent double-commit of the same head is harmless
    commit3()
    assert feed.position() == 4


def test_change_feed_pins_head_against_racing_writers(spark, tmp_path):
    """A write that lands AFTER poll() pinned its head is not smeared into
    the in-flight window — it arrives in the next poll."""
    table = SnapshotTable(spark, str(tmp_path / "t"))
    feed = ChangeFeed(spark, table, str(tmp_path / "cursor"))
    table.merge(_df(spark, [("a", "Alpha", 1)]))
    df, head, commit = feed.poll()
    table.merge(_df(spark, [("z", "Late", 1)]))  # racing writer
    assert {r["entity_id"] for r in df.collect()} == {"a"}  # window unchanged
    commit()
    df2, head2, commit2 = feed.poll()
    assert {r["entity_id"] for r in df2.collect()} == {"z"}
    commit2()
    assert feed.poll() is None
