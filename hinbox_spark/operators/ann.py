"""Approximate nearest-neighbor search over an embedding column.

Two tiers (SURVEY training-data ops):
- `brute_force_topk`: exact cosine top-k via broadcast of the query set —
  the correctness baseline (oracle-checked in plans/queries.py knn_top5).
- `lsh_topk`: random-hyperplane LSH — signatures are JVM-free numpy in a
  pandas UDF, bucketing + multiprobe (flip one bit) keeps recall high while
  candidate generation scales with bucket sizes instead of N×Q.

Hyperplanes are derived deterministically from a fixed seed so results are
reproducible across runs and executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

LSH_SEED = 0x5EED


def _hyperplanes(n_planes: int, dim: int) -> np.ndarray:
    rng = np.random.RandomState(LSH_SEED)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × all vectors, JVM-side dot,
    window top-k with deterministic tie-break.

    queries: (query_id, qvec array<float>). Returns
    (query_id, rank, neighbor_id, cos_sim)."""
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    dot = F.expr(
        "aggregate(zip_with(qvec, embedding, (a, b) ->"
        " CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )
    nq = F.expr(
        "sqrt(aggregate(qvec, 0.0D, (acc,x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))"
    )
    nc = F.expr(
        "sqrt(aggregate(embedding, 0.0D, (acc,x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    # zero-norm guard: embed_text returns a zero vector for empty text; its
    # cosine is NaN and Spark sorts NaN above all doubles desc, so without
    # the filter a zero vector would rank as everyone's top-1 neighbor
    return (
        F.broadcast(queries.filter(nq > 0))
        .crossJoin(cand.filter(nc > 0))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", dot / (nq * nc))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos_sim"))
    )


def lsh_signatures(
    emb: DataFrame, n_planes: int = 16, dim: int = 64,
    vec_col: str = "embedding", out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane signature: bucket = sign-bit pattern of `n_planes`
    fixed hyperplane projections (an int)."""
    planes = _hyperplanes(n_planes, dim)

    @F.pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float32)
        proj = mat @ planes.T  # (batch, n_planes)
        bits = (proj > 0).astype(np.int64)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(bits @ weights)

    return emb.withColumn(out_col, _sig(F.col(vec_col)))


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    dim: int = 64,
    multiprobe_bits: int = 4,
) -> DataFrame:
    """ANN top-k: candidates share the query's LSH bucket or any one-bit
    flip of its first `multiprobe_bits` bits (multiprobe raises recall
    without widening buckets). Exact cosine re-rank on candidates only."""
    cand = lsh_signatures(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        n_planes, dim,
    )
    q = lsh_signatures(
        queries.select("query_id", F.col("qvec").alias("embedding")),
        n_planes, dim,
    ).withColumnRenamed("embedding", "qvec")

    probes = q.select(
        "query_id",
        "qvec",
        F.explode(
            F.expr(
                f"array_union(array(bucket), transform(sequence(0, {multiprobe_bits - 1}),"
                f" b -> CAST(bucket ^ shiftleft(1, b) AS LONG)))"
            )
        ).alias("bucket"),
    )

    joined = probes.join(cand, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    dot = F.expr(
        "aggregate(zip_with(qvec, embedding, (a, b) ->"
        " CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )
    nq = F.expr(
        "sqrt(aggregate(qvec, 0.0D, (acc,x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))"
    )
    nc = F.expr(
        "sqrt(aggregate(embedding, 0.0D, (acc,x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    # zero-norm guard (see brute_force_topk): NaN cosine sorts above all
    # doubles, so zero vectors must not enter the ranking
    return (
        joined.dropDuplicates(["query_id", "neighbor_id"])
        .filter((nq > 0) & (nc > 0))
        .withColumn("cos", dot / (nq * nc))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos_sim"))
    )
