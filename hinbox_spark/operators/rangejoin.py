"""Bucketized range (interval) join — the time-window companion to the
as-of join (`operators/asof.py`).

Spark has no native range-join optimization: an inequality-only join
condition falls back to BroadcastNestedLoopJoin (quadratic work, one
task per broadcast partition), and even with an equality key the range
predicate is applied post-join on the full per-key cross product. Both
shapes die at 10¹²-row scale when a key is hot.

This operator re-expresses `right_ts ∈ [left_ts + lower, left_ts + upper]`
as an EQUI-join Catalyst can shuffle/sort-merge:

  bucket width  w = upper - lower  (the window length)
  left explodes to the two candidate buckets
      floor((left_ts+lower)/w) and floor((left_ts+upper)/w)
  right computes one bucket floor(right_ts/w)
  join on (on..., bucket)  →  exact range filter on the survivors

Any right row inside the window lands in one of the two left buckets
(a window of length w overlaps at most two w-aligned bucket cells), so
the result is EXACT; the bucket join bounds the candidate set to ~2×
the window density instead of the per-key cross product. All arithmetic
is integer seconds, JVM-side — no UDFs, no driver collect.

Scale shape: one shuffle per side on (on..., bucket); AQE's skew-join
splitting applies to the bucket join like any other sort-merge join,
and a hot (key, bucket) cell means a genuinely hot time window — the
physics of the query, not an artifact of the plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Inner-join `left` to every `right` row with the same `on` keys and
    `right_ts` within `[left_ts + lower_s, left_ts + upper_s]` (seconds,
    inclusive both ends). `lower_s < upper_s` required; columns of both
    frames are carried through, so right-side payload columns must not
    collide with left column names (alias first, as with asof_join).
    """
    if not upper_s > lower_s:
        raise ValueError("range_join requires lower_s < upper_s")
    w = upper_s - lower_s

    l_epoch = F.unix_timestamp(F.col(left_ts))
    r_epoch = F.unix_timestamp(F.col(right_ts))

    lo = left.withColumn("_rj_lo", l_epoch + F.lit(lower_s)).withColumn(
        "_rj_hi", l_epoch + F.lit(upper_s)
    )
    # the window [lo, hi] has length w, so it intersects at most the two
    # w-aligned cells floor(lo/w) and floor(hi/w); explode to both and
    # de-dup the (rare) equal case with array_distinct
    l_b = lo.withColumn(
        "_rj_bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.col("_rj_lo") / w), F.floor(F.col("_rj_hi") / w)
                )
            )
        ),
    )
    r_b = right.withColumn("_rj_repoch", r_epoch).withColumn(
        "_rj_bucket", F.floor(F.col("_rj_repoch") / w)
    )
    out = l_b.join(r_b, [*on, "_rj_bucket"]).filter(
        (F.col("_rj_repoch") >= F.col("_rj_lo"))
        & (F.col("_rj_repoch") <= F.col("_rj_hi"))
    )
    return out.drop("_rj_lo", "_rj_hi", "_rj_bucket", "_rj_repoch")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_s: int,
) -> DataFrame:
    """Interval × interval overlap join (inclusive): pairs where
    `[left_start, left_end]` and `[right_start, right_end]` intersect and
    the `on` keys match — the companion to `range_join` (point-in-window)
    for two interval sets (sessions × sessions, outages × deploys).

    Same bucketization idea, extended to intervals on BOTH sides: each
    interval explodes to every `bucket_s`-aligned cell it touches and the
    pair joins on (on..., cell). A pair overlapping across several shared
    cells must be emitted ONCE, so instead of a dropDuplicates shuffle the
    join keeps only the canonical cell — the one containing
    max(left_start, right_start), which for an overlapping pair is covered
    by BOTH intervals by definition. Exact, no dedup pass, no UDFs.

    `bucket_s` trades fan-out for candidate density: each side replicates
    ×(len/bucket_s + 1), so pick bucket_s ≈ the typical interval length
    (fan-out ~2). Long outlier intervals only add replicas of themselves,
    never quadratic work; a hot cell means genuinely many concurrent
    intervals — the physics of the query, as with range_join.

    Preconditions: end ≥ start on every row (sequence() would otherwise
    run descending), and the two frames' column names must not collide —
    alias one side first, as with asof_join/range_join."""
    w = int(bucket_s)
    if w <= 0:
        raise ValueError("bucket_s must be positive")

    def _cells(start_col: str, end_col: str):
        s = F.unix_timestamp(F.col(start_col))
        e = F.unix_timestamp(F.col(end_col))
        return F.explode(F.sequence(F.floor(s / w), F.floor(e / w)))

    l_b = left.withColumn("_io_cell", _cells(left_start, left_end))
    r_b = right.withColumn("_io_cell", _cells(right_start, right_end))
    ls, rs = F.unix_timestamp(F.col(left_start)), F.unix_timestamp(F.col(right_start))
    out = (
        l_b.join(r_b, [*on, "_io_cell"])
        # the exact overlap test compares the RAW timestamp columns —
        # unix_timestamp truncates to seconds, which would admit
        # sub-second near-misses; cells may truncate (they only need to
        # COVER the interval), the predicate may not
        .filter(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
        )
        # canonical-cell filter: emit the pair only from the cell holding
        # the later of the two starts (covered by both sides, so the pair
        # is guaranteed to meet there exactly once); second truncation is
        # consistent with the covering cells, so exactly one cell matches
        .filter(F.col("_io_cell") == F.floor(F.greatest(ls, rs) / w))
    )
    return out.drop("_io_cell")
