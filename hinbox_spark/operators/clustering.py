"""Stage 4: connected components over accepted same-entity edges.

Replaces the reference's order-dependent sequential merge loop
(/root/reference/src/engine/mergers.py:808-1234, single merge actor at
process_and_extract.py:10-17) with order-free iterative label propagation:
every node starts labeled with its own node_id; each round, a node takes the
min label among itself and its neighbors; fixpoint in O(log n) rounds for
typical entity-alias graphs (diameter is tiny). This is the explicit
transitive-closure semantics SURVEY §2 J11 calls for.

Scale design:
- only nodes incident to an edge enter the loop — isolated nodes (the vast
  majority in entity linking) are emitted directly, so per-iteration state
  is proportional to the linked subgraph, not the vocabulary;
- each round is one shuffle on node_id; localCheckpoint() truncates lineage
  (the classic failure of iterative Spark jobs);
- convergence is detected with an order-insensitive label checksum on the
  already-materialized checkpoint (one cheap aggregate; no extra join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


# below this many edges the linked subgraph is collected and solved with
# driver-side union-find (one job instead of ~10) — the same adaptive
# small-side decision AQE makes for broadcast joins. Above it, the
# distributed label-propagation loop runs.
DRIVER_UNION_FIND_MAX_EDGES = 500_000


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iters: int = 20
) -> DataFrame:
    """nodes(node_id), edges(src, dst) → (node_id, cluster_id).

    cluster_id = min node_id in the component (content hash → deterministic
    across runs and partitionings). Adaptive: small edge sets (bounded by
    DRIVER_UNION_FIND_MAX_EDGES — pair generation already caps per-key
    candidates, so this is the common case) are solved with driver-side
    union-find; larger ones with distributed min-label propagation.
    """
    if edges is None:
        return _driver_union_find(nodes, [])
    # cheap cardinality probe first: limit(N+1).count() moves no row data to
    # the driver; the (bounded) collect happens ONLY when the driver path is
    # actually taken, so choosing the distributed path never materializes
    # rows driver-side
    edges = edges.localCheckpoint(eager=False)  # probe + solve share one plan
    n_edges = edges.limit(DRIVER_UNION_FIND_MAX_EDGES + 1).count()
    if n_edges <= DRIVER_UNION_FIND_MAX_EDGES:
        return _driver_union_find(nodes, edges.collect())
    return _distributed_components(nodes, edges, max_iters)


def _driver_union_find(nodes: DataFrame, pair_rows) -> DataFrame:
    """Union-find over collected edges; only nodes in edges get a mapping
    row — everything else keeps its own id via a broadcast left join."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for r in pair_rows:
        a, b = find(r["src"]), find(r["dst"])
        if a != b:
            # min root wins → same labels as min-label propagation
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo

    mapping = [(x, find(x)) for x in parent]
    spark = nodes.sparkSession
    if not mapping:
        return nodes.select("node_id", F.col("node_id").alias("cluster_id"))
    map_df = spark.createDataFrame(mapping, "node_id string, cluster_id string")
    return (
        nodes.join(F.broadcast(map_df), "node_id", "left")
        .select(
            "node_id",
            F.coalesce("cluster_id", "node_id").alias("cluster_id"),
        )
    )


def _distributed_components(
    nodes: DataFrame, edges: DataFrame, max_iters: int = 20
) -> DataFrame:
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=True)
    )

    edge_nodes = (
        sym.select(F.col("a").alias("node_id")).dropDuplicates(["node_id"])
    )
    isolated = nodes.join(edge_nodes, "node_id", "left_anti").select(
        "node_id", F.col("node_id").alias("cluster_id")
    )

    labels = edge_nodes.select("node_id", F.col("node_id").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)
    prev_sig = None

    for _ in range(max_iters):
        neighbor_labels = (
            sym.join(labels, sym.a == labels.node_id)
            .select(F.col("b").alias("node_id"), "cluster_id")
        )
        stepped = (
            labels.unionByName(neighbor_labels)
            .groupBy("node_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        # pointer jumping (path doubling): follow the label's own label so a
        # chain of length L converges in O(log L) rounds, not O(L) — labels
        # are always node ids, so the self-join resolves
        parents = stepped.select(
            F.col("node_id").alias("cluster_id"),
            F.col("cluster_id").alias("grand"),
        )
        new_labels = (
            stepped.join(parents, "cluster_id", "left")
            .select(
                "node_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("grand", "cluster_id")
                ).alias("cluster_id"),
            )
        )
        labels = new_labels.localCheckpoint(eager=True)
        sig = labels.agg(
            F.sum(
                F.xxhash64("node_id", "cluster_id").cast("decimal(28,0)")
            ).alias("s")
        ).first()["s"]
        if sig == prev_sig:
            break
        prev_sig = sig

    return labels.unionByName(isolated)
