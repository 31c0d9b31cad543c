"""Count-min sketch as DATA: the sketch is a tiny (depth × width) count
table, built in one scan and mergeable by cell-wise addition — the
heavy-hitter companion to the HLL reach sketches (plans/queries.py
copurchase_reach_hll) and the GK percentile sketch
(events_percentiles_sketch).

Scale shape: each item expands to `depth` (row, bucket) cells MAP-SIDE
(an explode feeding a partially-aggregated groupBy), so a task emits at
most depth × width cells into the shuffle no matter how many items it
scanned — the shuffle volume is O(tasks × depth × width), independent of
|items|, which is the whole point at 10¹² tokens. Merging shards (daily
corpora, per-source sketches) is unionByName + one more cell-sum: CMS
merge is EXACT, pinned in tests. Estimation broadcasts the sketch (a few
thousand rows) against any candidate stream — in production the
candidates come from skew.bounded_topk's tournament, never a full vocab
sort.

Guarantees (Cormode & Muthukrishnan 2005): estimate ≥ true count always
(counters only over-count on collisions), and estimate ≤ true + εN with
probability ≥ 1-δ for width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉. Hashing is
Spark's xxhash64 seeded by the sketch row — deterministic across runs
and partitionings, so the sketch itself is reproducible data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_min_sketch(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """One CMS over `items[item_col]` → (r, b, cnt) cell table with
    depth × width rows (absent cells are zero). Weighted items: pre-expand
    or sum a weight column instead of count(*) — counts here because the
    corpus use case is token frequency."""
    cells = items.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {depth - 1}), i -> struct("
                f"i AS r, pmod(xxhash64({item_col}, i), {width}) AS b))"
            )
        ).alias("c")
    ).select(F.col("c.r").alias("r"), F.col("c.b").alias("b"))
    return cells.groupBy("r", "b").agg(F.count("*").alias("cnt"))


def merge_sketches(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape sketches — CMS merge is exact: the
    merged sketch is bit-identical to one built over the concatenated
    input (pinned in tests/test_sketches.py)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, item_col: str, depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-estimate each candidate's count: min over the sketch's rows
    of the candidate's cell. The sketch is broadcast (≤ depth × width
    rows); candidates keep all their columns and gain `est_cnt`."""
    keyed = candidates.select(
        "*",
        F.explode(
            F.expr(
                f"transform(sequence(0, {depth - 1}), i -> struct("
                f"i AS r, pmod(xxhash64({item_col}, i), {width}) AS b))"
            )
        ).alias("c"),
    ).select("*", F.col("c.r").alias("r"), F.col("c.b").alias("b")).drop("c")
    joined = keyed.join(F.broadcast(sketch), ["r", "b"], "left").fillna(
        0, subset=["cnt"]
    )
    group_cols = [c for c in candidates.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.min("cnt").alias("est_cnt"))
    )
