"""Sweep-line interval counting — overlap COUNTS without pair rows.

`rangejoin.interval_overlap_join` emits one row per overlapping PAIR; for a
count-only consumer that is the wrong plan at scale: a peak hour holding s
concurrent sessions materializes ~s² pair candidates inside one time cell
just to be counted and thrown away. The classic sweep identity needs no
pairs at all (intervals inclusive on both ends):

    overlaps(i) = |{j : start_j <= end_i}| - |{j : end_j < start_i}| - 1

— every interval NOT overlapping i either starts after i ends or ends
before i starts; the -1 removes i itself. Both set sizes are global
"count of rows before me" questions, answered by
`ranking.global_running_counts` over a union of tagged point rows:
O(n log n) comparisons spread across the cluster, shuffle volume 2n rows
per pass, zero single-task stages, zero pair materialization.

Tie handling is encoded in the sort order of (val, typ):
  - pass A counts starts <= end_i  (inclusive): start points sort BEFORE
    probe points at equal val (typ 0 < 1);
  - pass B counts ends   <  start_i (strict):   probe points sort BEFORE
    end points at equal val (typ 0 < 1).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hinbox_spark.operators.ranking import global_running_counts


def count_interval_overlaps(
    intervals: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    out_col: str = "n_overlapping",
) -> DataFrame:
    """For each interval, the number of OTHER intervals in the same frame
    that overlap it in time ([start, end] inclusive; the row itself is
    excluded, any other row — including one sharing key columns — counts).
    Returns `key_cols + [out_col]`, one row per input row.

    `key_cols` must uniquely identify rows (they are the probe tie-break
    and the output key). Input is traversed twice (pass A / pass B), so
    hand in a checkpointed frame if it is expensive to recompute.

    Rows with a NULL start or end match the pair-join semantics this
    operator replaces: they overlap nothing (count 0) and are invisible
    to every other row. They must be SPLIT OUT before the sweep — a null
    point would sort to one end of the global order and shift every
    probe's running count by one, corrupting all counts, not just its
    own row's.
    """
    has_bounds = F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    null_rows = intervals.filter(~has_bounds).select(
        *key_cols, F.lit(0).cast("long").alias(out_col)
    )
    intervals = intervals.filter(has_bounds)
    probe_keys = [F.col(c) for c in key_cols]
    null_keys = [
        F.lit(None).cast(intervals.schema[c].dataType).alias(c)
        for c in key_cols
    ]

    def _pass(point_col: str, point_typ: int, probe_col: str) -> DataFrame:
        points = intervals.select(
            F.col(point_col).alias("val"),
            F.lit(point_typ).alias("typ"),
            F.lit(1).alias("is_point"),
            *null_keys,
        )
        probes = intervals.select(
            F.col(probe_col).alias("val"),
            F.lit(1 - point_typ).alias("typ"),
            F.lit(0).alias("is_point"),
            *probe_keys,
        )
        counted = global_running_counts(
            points.unionByName(probes),
            [F.col("val"), F.col("typ")] + probe_keys,
            flag_col="is_point",
            count_col="_n",
        )
        return counted.filter(F.col("is_point") == 0).select(*key_cols, "_n")

    # A: starts <= end_i  (start typ=0 sorts before probe typ=1 at ties)
    a = _pass(start_col, 0, end_col).withColumnRenamed("_n", "_a")
    # B: ends < start_i   (probe typ=0 sorts before end typ=1 at ties)
    b = _pass(end_col, 1, start_col).withColumnRenamed("_n", "_b")
    # null-safe equi-join: a plain `join(b, key_cols)` would silently DROP
    # rows whose key columns contain NULL (NULL != NULL), where the
    # pair-join plan this operator replaces kept them with count 0
    b = b.select(
        *[F.col(c).alias(f"_k_{c}") for c in key_cols], "_b"
    )
    cond = None
    for c in key_cols:
        eq = a[c].eqNullSafe(b[f"_k_{c}"])
        cond = eq if cond is None else (cond & eq)
    swept = a.join(b, cond).select(
        *[a[c] for c in key_cols],
        (F.col("_a") - F.col("_b") - F.lit(1)).cast("long").alias(out_col),
    )
    return swept.unionByName(null_rows)
