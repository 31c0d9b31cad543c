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
