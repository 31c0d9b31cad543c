"""Streaming SCD-2 maintainer (streaming/scd2.py): micro-batch folds must
reconstruct exactly the intervals the batch gaps-and-islands query derives
from the full history — across drain boundaries, through run extension,
under re-delivered epochs (fresh sink instance), and with late assertions
dropped and counted."""

import datetime

from hinbox_spark.streaming.scd2 import SCD2StreamSink, scd2_stream
from hinbox_spark.tables import SnapshotTable

SCHEMA = "entity_id string, status string, at timestamp"


def _ts(m):
    return datetime.datetime(2024, 3, 1, 9, m)


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _intervals(table):
    """(key, value, valid_from-minute, valid_to-minute|None, n) set."""
    out = set()
    for r in table.read_resolved(["entity_id", "valid_from", "value"]).collect():
        out.add((
            r["entity_id"], r["value"], r["valid_from"].minute,
            None if r["valid_to"] is None else r["valid_to"].minute,
            r["n_assertions"],
        ))
    return out


def _batch_reference(assertions):
    """Independent per-key SCD-2 fold in pure Python over the FULL
    history — what q_kg_temporal_validity computes set-orientedly."""
    by_key = {}
    for k, v, ts in sorted(assertions, key=lambda r: (r[0], r[2], r[1])):
        by_key.setdefault(k, []).append((v, ts))
    out = set()
    for k, seq in by_key.items():
        runs = []
        for v, ts in seq:
            if runs and runs[-1][0] == v:
                runs[-1][2] += 1
            else:
                runs.append([v, ts, 1])
        for i, (v, ts, n) in enumerate(runs):
            nxt = runs[i + 1][1].minute if i + 1 < len(runs) else None
            out.add((k, v, ts.minute, nxt, n))
    return out


def test_scd2_matches_batch_reconstruction_across_drains(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    table = SnapshotTable(spark, str(tmp_path / "store"))

    b1 = [("e1", "new", _ts(0)), ("e1", "new", _ts(2)), ("e1", "open", _ts(4)),
          ("e2", "new", _ts(1))]
    b2 = [("e1", "open", _ts(6)),          # extends the open run
          ("e2", "closed", _ts(7)),        # closes e2's open run
          ("e3", "new", _ts(7))]           # new key mid-stream
    b3 = [("e1", "closed", _ts(9)), ("e1", "reopened", _ts(11)),
          ("e3", "new", _ts(10))]          # two changes + an extension

    history = []
    for batch in (b1, b2, b3):
        _rows(spark, batch).write.mode("append").parquet(src)
        q = scd2_stream(
            spark.readStream.schema(SCHEMA).parquet(src),
            table, "scd2", ckpt,
            key_col="entity_id", value_col="status", ts_col="at",
        )
        q.awaitTermination()
        history += batch
        assert _intervals(table) == _batch_reference(history)

    # exactly one open interval per key, and it carries the latest value
    final = {k: [] for k in ("e1", "e2", "e3")}
    for k, v, _f, t, _n in _intervals(table):
        if t is None:
            final[k].append(v)
    assert final == {"e1": ["reopened"], "e2": ["closed"], "e3": ["new"]}


def test_scd2_redelivered_epoch_is_idempotent(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "store"))
    sink = SCD2StreamSink(table, "s", "entity_id", "status", "at")
    sink(_rows(spark, [("e1", "a", _ts(0)), ("e1", "b", _ts(2))]), 0)
    sink(_rows(spark, [("e1", "c", _ts(4))]), 1)
    before = _intervals(table)
    head = table.latest_snapshot_id()

    # crash between sink commit and offset commit: batch 1 re-delivered to
    # a FRESH sink that must recover the ledger from manifests/marker
    sink2 = SCD2StreamSink(table, "s", "entity_id", "status", "at")
    sink2(_rows(spark, [("e1", "c", _ts(4))]), 1)
    assert table.latest_snapshot_id() == head  # no new snapshot
    assert _intervals(table) == before

    # the next real epoch still applies
    sink2(_rows(spark, [("e1", "d", _ts(6))]), 2)
    assert ("e1", "d", 6, None, 1) in _intervals(table)


def test_scd2_late_assertions_dropped_and_counted(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "store"))
    sink = SCD2StreamSink(table, "s", "entity_id", "status", "at")
    sink(_rows(spark, [("e1", "a", _ts(5))]), 0)

    # ts ≤ the open interval's last_ts → dropped, counted, state unchanged
    before = _intervals(table)
    sink(_rows(spark, [("e1", "b", _ts(3)), ("e1", "b", _ts(5))]), 1)
    assert sink.late_dropped_total == 2
    assert _intervals(table) == before

    # mixed batch: late row dropped, live row folds
    sink(_rows(spark, [("e1", "b", _ts(2)), ("e1", "b", _ts(8))]), 2)
    assert sink.late_dropped_total == 3
    assert _intervals(table) == {
        ("e1", "a", 5, 8, 1), ("e1", "b", 8, None, 1),
    }


def test_scd2_within_batch_multi_change_and_same_ts_determinism(spark, tmp_path):
    """A single batch containing several value changes for one key islands
    correctly, and two assertions sharing (key, ts) resolve by the (ts,
    value) total order — identically under any partitioning."""
    table = SnapshotTable(spark, str(tmp_path / "store"))
    sink = SCD2StreamSink(table, "s", "entity_id", "status", "at")
    rows = [("e1", "a", _ts(0)), ("e1", "b", _ts(1)), ("e1", "a", _ts(2)),
            # same-ts conflict: 'x' < 'y' in the total order, so the run
            # sequence is ... a, x, y
            ("e1", "y", _ts(3)), ("e1", "x", _ts(3))]
    sink(_rows(spark, rows).repartition(7), 0)
    assert _intervals(table) == {
        ("e1", "a", 0, 1, 1), ("e1", "b", 1, 2, 1), ("e1", "a", 2, 3, 1),
        ("e1", "x", 3, 3, 1), ("e1", "y", 3, None, 1),
    }


def test_scd2_as_of_point_in_time_read(spark, tmp_path):
    """AS-OF reads over the maintained store return exactly the value in
    force at the probe instant — before, between, at, and after changes."""
    from hinbox_spark.streaming.scd2 import scd2_as_of

    table = SnapshotTable(spark, str(tmp_path / "store"))
    sink = SCD2StreamSink(table, "s", "entity_id", "status", "at")
    sink(_rows(spark, [("e1", "a", _ts(2)), ("e2", "x", _ts(3))]), 0)
    sink(_rows(spark, [("e1", "b", _ts(6))]), 1)

    def at(minute):
        return {
            (r["entity_id"], r["value"])
            for r in scd2_as_of(table, "entity_id", _ts(minute)).collect()
        }

    assert at(1) == set()                          # before history
    assert at(2) == {("e1", "a")}                  # inclusive valid_from
    assert at(4) == {("e1", "a"), ("e2", "x")}
    assert at(6) == {("e1", "b"), ("e2", "x")}     # exclusive valid_to
    assert at(9) == {("e1", "b"), ("e2", "x")}     # open intervals persist


def test_scd2_null_assertions_dropped_and_counted(spark, tmp_path):
    """NULL in key, value, or ts is not an assertion: dropped (it would
    merge into adjacent runs and defeat the open-row stitch) and counted
    separately from late data."""
    table = SnapshotTable(spark, str(tmp_path / "store"))
    sink = SCD2StreamSink(table, "s", "entity_id", "status", "at")
    sink(_rows(spark, [("e1", "a", _ts(0)), ("e1", None, _ts(1)),
                       (None, "b", _ts(2)), ("e1", "b", None),
                       ("e1", "b", _ts(3))]), 0)
    assert sink.null_dropped_total == 3
    assert sink.late_dropped_total == 0
    assert _intervals(table) == {
        ("e1", "a", 0, 3, 1), ("e1", "b", 3, None, 1),
    }
    # an open row survives a later all-null epoch untouched
    sink(_rows(spark, [("e1", None, _ts(9))]), 1)
    assert sink.null_dropped_total == 4
    assert _intervals(table) == {
        ("e1", "a", 0, 3, 1), ("e1", "b", 3, None, 1),
    }
