"""Skew-handling primitives (SURVEY §4 physical strategies).

AQE's skew-join splitting handles post-shuffle partition skew
automatically; these helpers cover the two cases it can't:

- `salted_aggregate`: two-phase aggregation for hot GROUP BY keys — salt
  the key, partial-aggregate per (key, salt), then final-aggregate per key.
  Catalyst already does partial aggregation for algebraic functions; this
  is for aggregations whose intermediate state per key is huge
  (collect_list-style), where one reducer would hold the whole hot key.
- `salted_self_join_keys`: replicate-one-side salting for joining a skewed
  key column against itself (the 'Guantanamo mega-key' case in blocking).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, factor: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from the full row content (xxhash64 mod
    factor) — no RNG, stable across retries/partitionings."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(factor))
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    factor: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → partial_aggs, then
    groupBy(keys) → final_aggs over the partials.

    Example (hot-key distinct-count):
        salted_aggregate(df, ["k"],
            [F.collect_set("v").alias("vs")],
            [F.array_distinct(F.flatten(F.collect_list("vs"))).alias("vs")])
    """
    salted = with_salt(df, factor)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def skewed_keys(df: DataFrame, keys: list[str], threshold: int) -> DataFrame:
    """Identify hot keys (count > threshold) — broadcast this to route rows
    down a salted path while the long tail takes the direct path."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > threshold)
        .select(*keys)
    )


def bounded_topk(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    k: int,
    salt_expr: Column,
    n_salts: int = 64,
) -> DataFrame:
    """EXACT per-key top-k without a per-key global sort (hot-key guard).

    `row_number().over(Window.partitionBy(hot_key).orderBy(...)) <= k` puts
    every row of a mega-key into ONE task to sort, then discards all but k —
    the classic skew-killer. This tournament computes the identical result
    in two bounded rounds:

      1. top-k within (keys, salt)  — a mega-key is spread over `n_salts`
         tasks, each sorting ~1/n_salts of it;
      2. top-k of the ≤ n_salts*k survivors per key — bounded fan-in.

    Exact because the global top-k is a subset of the union of per-salt
    top-ks. `order_by` must be a total order within a key (break ties!) for
    deterministic output; `salt_expr` must be a deterministic function of
    the row (no RNG) so retries/re-runs agree.
    """
    from pyspark.sql import Window

    salted = df.withColumn("_tk_salt", F.pmod(salt_expr, F.lit(n_salts)))
    w1 = Window.partitionBy(*keys, "_tk_salt").orderBy(*order_by)
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        salted.withColumn("_tk_rn", F.row_number().over(w1))
        .filter(F.col("_tk_rn") <= k)
        .withColumn("_tk_rn", F.row_number().over(w2))
        .filter(F.col("_tk_rn") <= k)
        .drop("_tk_rn", "_tk_salt")
    )


def salted_self_join_keys(
    df: DataFrame, key: str, id_col: str, factor: int = 16
) -> DataFrame:
    """Skew-tolerant within-key pairing: instead of one bucket per hot key
    (quadratic in one task), rows are salted into `factor` sub-buckets and
    paired (a) within each sub-bucket and (b) across sub-bucket
    representatives — an approximation used only above the hot threshold;
    exact pairing remains the default path below it."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(factor))
    )
    a, b = salted.alias("a"), salted.alias("b")
    within = a.join(
        b,
        (F.col(f"a.{key}") == F.col(f"b.{key}"))
        & (F.col("a._salt") == F.col("b._salt"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("src"), F.col(f"b.{id_col}").alias("dst")
    )
    # representatives: min id per (key, salt) joined across salts — keeps
    # the components connected so downstream union-find closes the cluster
    reps = salted.groupBy(key, "_salt").agg(F.min(id_col).alias(id_col))
    ra, rb = reps.alias("ra"), reps.alias("rb")
    across = ra.join(
        rb,
        (F.col(f"ra.{key}") == F.col(f"rb.{key}"))
        & (F.col(f"ra.{id_col}") < F.col(f"rb.{id_col}")),
    ).select(
        F.col(f"ra.{id_col}").alias("src"), F.col(f"rb.{id_col}").alias("dst")
    )
    return within.unionByName(across).dropDuplicates(["src", "dst"])
