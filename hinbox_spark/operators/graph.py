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
