"""Stage 4: connected components over accepted same-entity edges.

Replaces the reference's order-dependent sequential merge loop
(/root/reference/src/engine/mergers.py:808-1234, single merge actor at
process_and_extract.py:10-17) with order-free iterative label propagation:
every node starts labeled with its own node_id; each round, a node takes the
min label among itself and its neighbors; fixpoint in O(log n) rounds for
typical entity-alias graphs (diameter is tiny). This is the explicit
transitive-closure semantics SURVEY §2 J11 calls for.

Scale notes: each round is one shuffle on node_id. localCheckpoint() every
round truncates lineage (plan growth is the classic failure of iterative
Spark jobs). Label propagation via small-diameter min-label converges in
≤ `max_iters`; the loop stops early when an `observe`d change-count hits 0
— no driver-side collect of data rows, only the aggregated metric.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iters: int = 20
) -> DataFrame:
    """nodes(node_id), edges(src, dst) → (node_id, cluster_id).

    cluster_id = min node_id in the component (content hash → deterministic
    across runs and partitionings).
    """
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=True)
    )

    labels = nodes.select("node_id", F.col("node_id").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iters):
        neighbor_labels = (
            sym.join(labels, sym.a == labels.node_id)
            .select(F.col("b").alias("node_id"), "cluster_id")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)
        if changed == 0:
            break

    return labels
