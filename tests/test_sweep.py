"""Sweep-line overlap counting (`operators/sweep.py` +
`ranking.global_running_counts`): brute-force equivalence, tie semantics,
the hot-hour fixture the pair plan could not survive, and the O(n)
shuffle-volume claim."""

import random

import pyspark.sql.functions as F

from hinbox_spark.operators.ranking import global_running_counts
from hinbox_spark.operators.sweep import count_interval_overlaps


def _brute_overlaps(rows):
    """O(n²) reference: rows = [(key, start, end)], inclusive bounds."""
    out = {}
    for k, s, e in rows:
        out[k] = sum(
            1 for k2, s2, e2 in rows if k2 != k and s <= e2 and s2 <= e
        )
    return out


def test_global_running_counts_vs_window(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50), rng.randint(0, 1)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, val long, flag int").repartition(7)
    got = {
        r["id"]: r["n_before"]
        for r in global_running_counts(
            df, [F.col("val"), F.col("id")], "flag", num_partitions=5
        ).collect()
    }
    # reference: exclusive running sum of flag under the same total order
    ordered = sorted(rows, key=lambda t: (t[1], t[0]))
    acc, want = 0, {}
    for i, _v, f in ordered:
        want[i] = acc
        acc += f
    assert got == want


def test_count_overlaps_matches_brute_force(spark):
    rng = random.Random(13)
    rows = []
    for i in range(300):
        s = rng.randint(0, 1000)
        rows.append((i, s, s + rng.randint(0, 60)))
    df = spark.createDataFrame(rows, "id long, s long, e long").repartition(6)
    got = {
        r["id"]: r["n_overlapping"]
        for r in count_interval_overlaps(df, ["id"], "s", "e").collect()
    }
    assert got == _brute_overlaps(rows)


def test_count_overlaps_tie_semantics(spark):
    # touching endpoints overlap (inclusive); adjacent-by-1 do not;
    # identical intervals count each other; a fully isolated one counts 0
    rows = [
        (1, 0, 10),
        (2, 10, 20),   # touches 1 at t=10 -> overlaps
        (3, 21, 30),   # starts 1 after 2 ends -> no overlap with 2
        (4, 0, 10),    # identical to 1
        (5, 100, 100), # isolated point
    ]
    df = spark.createDataFrame(rows, "id long, s long, e long")
    got = {
        r["id"]: r["n_overlapping"]
        for r in count_interval_overlaps(df, ["id"], "s", "e").collect()
    }
    assert got == {1: 2, 2: 2, 3: 0, 4: 2, 5: 0}


def test_hot_hour_stays_linear(spark):
    """50k sessions all inside ONE hour: the pair plan's single time cell
    would hold ~50k² = 2.5e9 pair candidates; the sweep touches exactly
    2n tagged point rows per pass and still answers exactly."""
    n = 50_000
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 3600).alias("s"),
        (F.col("id") % 3600 + 30).alias("e"),
    )
    out = count_interval_overlaps(base, ["id"], "s", "e")
    # shuffle volume evidence: each pass's union frame is exactly 2n rows
    # (n point rows + n probe rows) — nothing pair-shaped ever exists.
    # Reconstruct one pass's input the way the operator builds it:
    union_rows = (
        base.select(F.col("s").alias("val")).unionByName(
            base.select(F.col("e").alias("val"))
        )
    ).count()
    assert union_rows == 2 * n

    # exactness on the hot fixture, verified analytically: with starts at
    # k = id % 3600 and ends k+30, interval at offset k overlaps intervals
    # at offsets within [k-30, k+30] (clipped to [0, 3599]); each offset
    # bucket holds ceil/floor(n/3600) intervals.
    per_offset = [n // 3600 + (1 if k < n % 3600 else 0) for k in range(3600)]
    prefix = [0]
    for c in per_offset:
        prefix.append(prefix[-1] + c)

    def expect(k):
        lo, hi = max(0, k - 30), min(3599, k + 30)
        return prefix[hi + 1] - prefix[lo] - 1

    sample = {
        r["id"]: r["n_overlapping"]
        for r in out.filter(F.col("id").isin([0, 1, 1800, 3599, 49999])).collect()
    }
    for i, got in sample.items():
        assert got == expect(i % 3600), i


def test_no_single_partition_exchange(spark):
    df = spark.createDataFrame(
        [(i, i, i + 5) for i in range(50)], "id long, s long, e long"
    )
    plan = (
        count_interval_overlaps(df, ["id"], "s", "e")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


def test_null_keys_are_kept(spark):
    """Rows whose key columns contain NULL must not vanish: the final
    pass-A/pass-B join is null-safe (regression: a plain equi-join
    dropped them, where the pair-join plan this operator replaces
    returned them with count 0)."""
    from hinbox_spark.operators.sweep import count_interval_overlaps

    rows = [
        ("s1", 0, 10),
        ("s2", 5, 15),
        (None, 20, 30),  # overlaps nothing, must still appear
    ]
    df = spark.createDataFrame(rows, "sid string, t0 int, t1 int")
    out = count_interval_overlaps(df, ["sid"], "t0", "t1").collect()
    got = {r["sid"]: r["n_overlapping"] for r in out}
    assert got == {"s1": 1, "s2": 1, None: 0}


def test_null_bounds_rows_count_zero_and_corrupt_nothing(spark):
    """A NULL start or end must behave like the pair-join semantics: that
    row overlaps nothing (count 0) and is INVISIBLE to every other row —
    an unsplit null point would sort to one end of the global order and
    shift every probe's running count."""
    rows = [
        (1, 0, 10), (2, 5, 15),          # overlap each other
        (3, 50, None), (4, None, 60),    # null-bounded: count 0
        (5, 100, 110),                   # overlaps nothing
    ]
    df = spark.createDataFrame(rows, "id long, s long, e long")
    got = {
        r["id"]: r["n_overlapping"]
        for r in count_interval_overlaps(df, ["id"], "s", "e").collect()
    }
    assert got == {1: 1, 2: 1, 3: 0, 4: 0, 5: 0}
