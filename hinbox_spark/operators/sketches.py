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

Shape discipline: build and estimate MUST use the same (depth, width) —
the one-sided guarantee dies otherwise. `cms_estimate` verifies what the
cell table itself can prove (exact depth via max(r); buckets in range),
which catches a depth mismatch and a sketch built wider than queried; a
sketch built NARROWER than queried is indistinguishable from sparse data,
so callers that persist sketches should persist (depth, width) beside
them (streaming/heavy_hitters.py pins them in the sink config).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cells_expr(item_col: str, depth: int, width: int):
    """The (row, bucket) cell array for one item — ONE owner for the hash
    layout: build and estimate must stay bit-identical, so they both call
    this. `item_col` is backtick-quoted (any column name works)."""
    safe = item_col.replace("`", "``")
    return F.explode(
        F.expr(
            f"transform(sequence(0, {depth - 1}), i -> struct("
            f"i AS r, pmod(xxhash64(`{safe}`, i), {width}) AS b))"
        )
    )


def count_min_sketch(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """One CMS over `items[item_col]` → (r, b, cnt) cell table with
    depth × width rows (absent cells are zero). Weighted items: pre-expand
    or sum a weight column instead of count(*) — counts here because the
    corpus use case is token frequency."""
    cells = items.select(
        _cells_expr(item_col, depth, width).alias("c")
    ).select(F.col("c.r").alias("r"), F.col("c.b").alias("b"))
    return cells.groupBy("r", "b").agg(F.count("*").alias("cnt"))


def merge_sketches(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape sketches — CMS merge is exact: the
    merged sketch is bit-identical to one built over the concatenated
    input (pinned in tests/test_sketches.py). Shards must share
    (depth, width); summing differently-shaped tables is meaningless
    (see the module's shape-discipline note)."""
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
    rows); candidates keep all their columns and gain `est_cnt`.

    Internal join keys are prefixed (`_cms_*`) so candidate columns named
    r/b/cnt can't collide, and the sketch's shape is verified against the
    queried (depth, width): a mismatch would silently return zeros via
    the missing-cell fill, destroying the ≥-true-count guarantee."""
    hdr = sketch.agg(
        F.max("r").alias("max_r"), F.max("b").alias("max_b")
    ).first()
    if hdr["max_r"] is not None:
        if hdr["max_r"] != depth - 1:
            raise ValueError(
                f"sketch depth mismatch: table has rows 0..{hdr['max_r']}, "
                f"queried with depth={depth}"
            )
        if hdr["max_b"] >= width:
            raise ValueError(
                f"sketch width mismatch: table has bucket {hdr['max_b']}, "
                f"queried with width={width}"
            )
    sk = sketch.select(
        F.col("r").alias("_cms_r"), F.col("b").alias("_cms_b"),
        F.col("cnt").alias("_cms_cnt"),
    )
    keyed = candidates.select(
        "*", _cells_expr(item_col, depth, width).alias("_cms_c")
    ).select(
        "*",
        F.col("_cms_c.r").alias("_cms_r"),
        F.col("_cms_c.b").alias("_cms_b"),
    ).drop("_cms_c")
    joined = keyed.join(
        F.broadcast(sk), ["_cms_r", "_cms_b"], "left"
    ).fillna(0, subset=["_cms_cnt"])
    group_cols = [c for c in candidates.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.min("_cms_cnt").alias("est_cnt"))
    )
