"""Watermarked windowed aggregation: windows finalize exactly once when the
watermark passes, and data later than the watermark is dropped (§2.11)."""

import datetime

from hinbox_spark.streaming.windows import run_windowed_counts


def _mentions(spark, rows):
    return spark.createDataFrame(
        rows, "url string, entity_type string, name string, warc_ts timestamp"
    )


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def test_windows_finalize_once_and_drop_late_data(spark, tmp_path):
    mentions_dir = str(tmp_path / "mentions")
    out_dir = str(tmp_path / "windows")
    ckpt = str(tmp_path / "ckpt")

    def read_out():
        rows = spark.read.parquet(out_dir).collect()
        return sorted(
            (r["window_start"].hour, r["entity_type"], r["n"]) for r in rows
        )

    # run 1: two rows in the 10:00 window + one at 13:00 that advances the
    # watermark to 12:30 at end-of-run. Nothing is emitted yet (the batch
    # itself ran with the initial watermark).
    _mentions(spark, [
        ("u1", "organizations", "FBI", _ts(10, 5)),
        ("u2", "organizations", "FBI", _ts(10, 15)),
        ("u3", "organizations", "FBI", _ts(13, 0)),
    ]).write.mode("append").parquet(mentions_dir)
    run_windowed_counts(spark, mentions_dir, out_dir, ckpt)

    # run 2: a LATE row for the 10:00 window (behind the 12:30 watermark →
    # dropped) plus a 15:00 row. The 10:00 window (end 11:00 < 12:30)
    # finalizes in this run — with count 2, not 3.
    _mentions(spark, [
        ("u4", "organizations", "FBI", _ts(10, 20)),  # too late, dropped
        ("u5", "organizations", "FBI", _ts(15, 0)),
    ]).write.mode("append").parquet(mentions_dir)
    run_windowed_counts(spark, mentions_dir, out_dir, ckpt)
    out2 = read_out()
    # the late row was dropped: the 10:00 window finalized with 2, not 3,
    # and exactly once (AvailableNow may emit later windows in the same
    # run — it splits into micro-batches and advances the watermark
    # between them — so only the 10:00 facts are pinned here)
    assert [e for e in out2 if e[0] == 10] == [(10, "organizations", 2)]

    # run 3: advances the watermark past every open window → 13:00 window
    # present with its exact count; nothing re-emitted (exactly-once).
    _mentions(spark, [
        ("u6", "people", "Omar Khadr", _ts(17, 0)),
    ]).write.mode("append").parquet(mentions_dir)
    run_windowed_counts(spark, mentions_dir, out_dir, ckpt)
    out3 = read_out()
    assert [e for e in out3 if e[0] == 10] == [(10, "organizations", 2)]
    assert [e for e in out3 if e[0] == 13] == [(13, "organizations", 1)]
    # no window emitted twice
    assert len({(h, t) for h, t, _ in out3}) == len(out3)


def test_session_windows_merge_and_finalize(spark, tmp_path):
    """Native session_window: events within the gap merge into one session
    (its end extends), a gap closes the session exactly once when the
    watermark passes, and sessions for different users are independent."""
    import datetime

    from hinbox_spark.streaming.windows import run_session_counts

    def _events(rows):
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )

    def _t(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    # run 1: u1 has two events 10 min apart (one session, 30-min gap);
    # u2 one event. An 18:00 row pushes the watermark far past both.
    _events([
        (1, _t(10, 0), 1, "view", 0.0, "{}"),
        (2, _t(10, 10), 1, "click", 0.0, "{}"),
        (3, _t(10, 5), 2, "view", 0.0, "{}"),
        (4, _t(18, 0), 9, "view", 0.0, "{}"),
    ]).write.mode("append").parquet(events_dir)
    run_session_counts(spark, events_dir, out_dir, ckpt, gap="30 minutes")
    # second drain with a later row finalizes anything still open
    _events([
        (5, _t(23, 0), 9, "view", 0.0, "{}"),
    ]).write.mode("append").parquet(events_dir)
    run_session_counts(spark, events_dir, out_dir, ckpt, gap="30 minutes")

    rows = {
        (r["user_id"], r["session_start"]): r
    for r in spark.read.parquet(out_dir).collect()}
    u1 = rows[(1, _t(10, 0))]
    # session end = last event + gap; both events merged
    assert u1["n_events"] == 2
    assert u1["session_end"] == _t(10, 40)
    u2 = rows[(2, _t(10, 5))]
    assert u2["n_events"] == 1 and u2["session_end"] == _t(10, 35)
    # exactly-once: no duplicate (user, start) rows
    all_rows = spark.read.parquet(out_dir).collect()
    assert len(all_rows) == len(rows)
