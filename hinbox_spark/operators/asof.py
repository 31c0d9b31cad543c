"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For each left row, attach the right row with the greatest right timestamp
≤ the left row's timestamp within the same key group (the temporal-join
primitive behind point-in-time feature lookup, trade/quote matching, and
slowly-changing-dimension reads).

Scale shape — the union-tag + carry-forward window, not a range join:
tag both sides, union them, shuffle ONCE on the key, sort each key group
by (ts, side), and carry the last-seen right payload forward with
last(..., ignorenulls=True). Cost is one shuffle + one per-key sort —
no inequality cross-join (which Spark plans as BroadcastNestedLoop or a
full range-explode) and no per-key driver loop. A key's rows must fit a
single window task; as-of keys are natural entities (user, instrument,
entity_id) whose per-key history is bounded — for a truly unbounded key,
pre-bucket the timeline (e.g. by day) and run the join per bucket with
the previous bucket's last right row carried in.

DuckDB's ASOF JOIN executes the same semantics and serves as the
independent oracle in the driver contract (`click_asof_purchase`).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus `payload_cols` from the right
    row with the greatest `right_ts` ≤ `left_ts` sharing the `on` keys
    (null payload when no right row precedes). A right row at exactly
    `left_ts` matches. When several right rows share the winning
    timestamp, `tiebreak` (a right column, ascending — the LAST one wins)
    makes the choice deterministic.

    `payload_cols` must be disjoint from the left frame's column names
    (alias the right side first), since the output carries both.
    """
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_asof_{c}")
          for c in payload_cols],
        F.lit(None).cast(
            right.schema[tiebreak].dataType if tiebreak else "long"
        ).alias("_asof_tb"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        *[F.col(c).alias(f"_asof_{c}") for c in payload_cols],
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_asof_tb"),
    ).select(*l_tagged.columns)  # align column order for the union

    # right rows sort BEFORE the left row at an equal timestamp (inclusive
    # ≤ semantics) and among themselves by the tiebreak — the carried
    # payload is then exactly "greatest right_ts ≤ left_ts, last tiebreak"
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_ts").asc(), F.col("_asof_side").desc(),
                 F.col("_asof_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the payload is carried as ONE struct (non-null for every right row,
    # even when its fields are null) so the winning row's fields can never
    # mix with an older row's — per-column ignorenulls carries would
    # disagree whenever a winning field is null
    payload_struct = F.when(
        F.col("_asof_side") == 1,
        F.struct(*[F.col(f"_asof_{c}").alias(c) for c in payload_cols]),
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *[F.col(c) for c in left.columns],
        F.col("_asof_side").alias("_side"),
        F.last(payload_struct, ignorenulls=True).over(w).alias("_match"),
    )
    return carried.filter(F.col("_side") == 0).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_match.{c}").alias(c) for c in payload_cols],
    )
