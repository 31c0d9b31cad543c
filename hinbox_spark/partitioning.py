"""Compute-spreading helper (optimization guide §2.2/§4.4).

A small input read from one parquet split executes ALL of its pre-shuffle
per-row CPU work — pandas-UDF signature passes, banded levenshtein probes
of a broadcast join — in a single task: the 180 KB `part` table at sf0.1
is one split, so the ~2M-probe levenshtein pass of part_name_edit_pairs
ran on one core (r6 measurement: 4.3 s wall for ~1 task-second × 32 idle
cores; the MinHash signature pass over `documents` was 1.4 s serial the
same way).

`spread_for_compute` rebalances such inputs to the session's default
parallelism BEFORE the compute: a row-preserving exchange of the (tiny)
input that converts serial seconds into parallel milliseconds.

Scale safety: the rebalance is GATED on the input's current partition
count — at production scale the same scan splits into thousands of tasks,
the gate sees current ≥ target, and the helper is a no-op (it never
reduces parallelism and never adds an exchange that isn't buying CPU
spread). The explicit numPartitions keeps AQE from re-coalescing the
byte-tiny/CPU-heavy partitions (same rationale as the kge SGD repartition,
r6 notes). Hash-partitioning on a key column (when given) avoids the
local sort that round-robin repartition performs for retry determinism.

Only call this on scan/project frames (no upstream exchanges): accessing
``df.rdd`` for the partition-count gate finalizes the physical plan, and
under AQE a frame with shuffle stages could execute them eagerly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Repartition `df` to the session's default parallelism iff it
    currently has fewer partitions; identity otherwise. `cols` selects
    hash partitioning on those columns (deterministic, sort-free)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    current = df.rdd.getNumPartitions()
    if current >= target:
        return df
    if cols:
        return df.repartition(target, *[df[c] for c in cols])
    return df.repartition(target)
