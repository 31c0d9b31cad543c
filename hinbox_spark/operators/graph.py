"""Distributed BFS — k-hop shortest-path distances from a source set.

The graph-serving query family over the materialized entity/edge tables
(degrees, 2-hop reach, connected components, PageRank live next to this in
plans/queries.py + operators/clustering.py); BFS distance is the
neighborhood primitive behind "everything within k hops of X" expansions.

Scale shape per hop: ONE equi shuffle (frontier ⋈ edges on src) plus an
anti-join against the visited set, both map-side combinable aggregations
around them; the frontier and visited sets carry ONLY (node_id[, dist]) —
no payload rides the iteration. Each round localCheckpoints its outputs so
the lineage and physical plan stay O(1) in the hop count (the same
discipline as connected_components' pointer jumping and PageRank's rank
chain). The visited anti-join is the inherent cost of BFS on a shuffle
engine — it is O(|reached|) per hop and partitions on node_id like every
other stage, so no single task ever holds the whole reached set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 100,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Matula & Beck 1983;
    the distributed formulation follows the Pregel-style peel loop):
    repeatedly delete every node whose degree in the SURVIVING subgraph
    is < k, until a fixpoint. Returns (node, core_deg) for the nodes of
    the k-core, core_deg = their degree within it — the densest-region
    primitive web-graph pipelines run for spam/community seeds.

    Input is treated as undirected: pass each edge once in either
    direction; it is symmetrized (and self-loop/dup-cleaned) here.

    Scale shape per round: ONE degree shuffle (groupBy src, map-side
    combinable) + two semi-join filters of the edge list against the
    survivor set — all partition on node keys, nothing collects, and the
    edge set only ever SHRINKS. The only driver traffic per round is the
    survivor COUNT (the fixpoint test, one scalar). Eager
    localCheckpoints keep the plan O(1) in rounds. Round count is the
    peeling depth, bounded by `max_rounds` (degeneracy-ordered graphs
    converge in a handful of rounds; the loop exits as soon as no node
    is dropped)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    live = (
        sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = -1
    for _ in range(max_rounds):
        deg = live.groupBy("a").agg(F.count("*").alias("core_deg"))
        keep = deg.filter(F.col("core_deg") >= k).localCheckpoint(eager=True)
        n = keep.count()
        if n == n_prev or n == 0:
            return keep.select(F.col("a").alias("node"), "core_deg")
        n_prev = n
        survivors = keep.select("a")
        live = (
            live.join(survivors, "a", "left_semi")
            .join(survivors.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    deg = live.groupBy("a").agg(F.count("*").alias("core_deg"))
    return deg.filter(F.col("core_deg") >= k).select(
        F.col("a").alias("node"), "core_deg"
    )


def bfs_distances(
    edges: DataFrame, sources: DataFrame, max_hops: int
) -> DataFrame:
    """edges(src, dst) directed (pass both directions for an undirected
    walk), sources(node_id) → (node_id, dist) for every node reachable in
    ≤ max_hops, dist = exact hop distance (0 for the sources themselves).
    Early-exits when a frontier drains before max_hops."""
    edges = edges.select("src", "dst")
    visited = (
        sources.select("node_id")
        .dropDuplicates(["node_id"])
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node_id")
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier.node_id == edges.src)
            .select(F.col("dst").alias("node_id"))
            .dropDuplicates(["node_id"])
            .join(visited.select("node_id"), "node_id", "left_anti")
            .withColumn("dist", F.lit(hop).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node_id")
    return visited
