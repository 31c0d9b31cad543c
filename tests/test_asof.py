"""As-of join operator: inclusive ≤ semantics, tie-breaks, null payloads,
no-match rows, and the one-shuffle plan shape."""

import datetime

import pyspark.sql.functions as F
import pytest

from hinbox_spark.operators.asof import asof_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", _ts(5), "L1"),
            ("u1", _ts(10), "L2"),
            ("u1", _ts(2), "L0"),   # before any right row
            ("u2", _ts(7), "L3"),
        ],
        "key string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(3), 100, 1.0),
            ("u1", _ts(5), 200, 2.0),    # equal ts → matches L1 (inclusive)
            ("u1", _ts(8), 300, 3.0),
            ("u2", _ts(6), 400, None),   # null payload field still wins
        ],
        "key string, rts timestamp, rid int, rval double",
    )
    return left, right


def test_asof_semantics(frames):
    left, right = frames
    out = {
        r["tag"]: (r["rid"], r["rval"])
        for r in asof_join(
            left, right, on=["key"], left_ts="ts", right_ts="rts",
            payload_cols=["rid", "rval"], tiebreak="rid",
        ).collect()
    }
    assert out["L0"] == (None, None)      # nothing at or before t=2
    assert out["L1"] == (200, 2.0)        # equal-ts right row matches
    assert out["L2"] == (300, 3.0)        # greatest rts ≤ 10
    assert out["L3"] == (400, None)       # winning row's null field kept


def test_asof_tiebreak_and_struct_consistency(spark):
    """Two right rows at the winning timestamp: the largest tiebreak wins,
    and the payload fields come from ONE row (never mixed across rows —
    the struct-carry regression case)."""
    left = spark.createDataFrame(
        [("k", _ts(9), "L")], "key string, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            ("k", _ts(4), 1, None),     # null field on the tie winner below
            ("k", _ts(4), 2, None),
            ("k", _ts(1), 0, 99.0),     # older row with a non-null field
        ],
        "key string, rts timestamp, rid int, rval double",
    )
    row = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="rts",
        payload_cols=["rid", "rval"], tiebreak="rid",
    ).first()
    assert row["rid"] == 2
    # rval must be the winner's null, NOT the older row's 99.0
    assert row["rval"] is None


def test_asof_single_shuffle_plan(frames):
    """The union-tag + carry-forward plan shuffles exactly once (on the
    key) — no range/nested-loop join, no second exchange."""
    left, right = frames
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="rts",
        payload_cols=["rid"], tiebreak="rid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matches_duckdb_asof_join(spark):
    """Cross-engine parity on the driver-contract query shape: DuckDB's
    native ASOF JOIN (a different algorithm) returns the same rows."""
    import duckdb

    from hinbox_spark.plans.queries import ORACLE_QUERIES, SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["event_id"], r["user_id"], r["purchase_event_id"],
         r["purchase_value"])
        for r in SPARK_QUERIES["click_asof_purchase"](spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(ORACLE_QUERIES["click_asof_purchase"]).fetchall())
    )
    assert got == want
