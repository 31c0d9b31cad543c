"""Distributed graph operators over the materialized entity/edge tables:
BFS k-hop distances, k-core peeling, neighbor-Jaccard link prediction
(dense GEMM path + packed-pair join fallback), and deterministic label
propagation. (Degrees, 2-hop reach, connected components, and PageRank
live in plans/queries.py + operators/clustering.py.)

Shared scale discipline — every iterative operator here follows it:
ONE equi shuffle per round on node/edge keys, map-side combinable
aggregations around it, iteration state carrying only ids + a few
scalars (no payload rides the loop), and per-round eager
localCheckpoints so the lineage and physical plan stay O(1) in the
round count (the same discipline as connected_components' pointer
jumping). Per-operator notes:

* BFS: the visited anti-join is the inherent cost of BFS on a shuffle
  engine — O(|reached|) per hop, partitioned on node_id, so no single
  task ever holds the whole reached set.
* k-core: the edge set only shrinks; driver traffic is one fixpoint
  scalar per round.
* neighbor-Jaccard: a distributed size probe runs BEFORE any collect;
  under the caps the incidence matrix rides one broadcast and per-block
  GEMMs emit |blocks|·k candidate rows; over the caps the packed-pair
  counting join takes over (correct at any scale; prefer MinHash
  candidates at web scale).
* label propagation: one node-keyed join + one counting groupBy per
  round, min-label ties for determinism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Iteration-state frames (ranks / labels / frontiers / survivor sets) are
# node-sized, while the edge list they join is orders of magnitude larger.
# Below this many state rows the loops hint a broadcast join so the EDGE
# side is never exchanged per round (guide §3.1 — the checkpointed-RDD
# inputs defeat the planner's size estimates, so every round otherwise
# plans a SortMergeJoin that shuffles the edges; observed in the r6 plan
# audit). Above it the shuffle join stands — at 10^9 nodes the state no
# longer broadcasts and partition-reuse is the right shape. The gate is
# always fed by a count the loop already pays (fixpoint/frontier checks)
# or one cheap count of the checkpointed state.
BROADCAST_STATE_MAX_ROWS = 2_000_000


def _bc_if(df: DataFrame, n_rows: int | None) -> DataFrame:
    """Broadcast-hint `df` when its known row count is under the state
    cap; pass it through untouched (shuffle join) otherwise."""
    if n_rows is not None and n_rows <= BROADCAST_STATE_MAX_ROWS:
        return F.broadcast(df)
    return df


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
    Early-exits when a frontier drains before max_hops. The single-source
    walk is the degenerate case of the tagged multi-source loop — one
    shared implementation, one place to fix."""
    tagged = sources.select("node_id").withColumn("tag", F.lit(0))
    return bfs_distances_multi(edges, tagged, max_hops).drop("tag")


def sssp_bounded(
    edges: DataFrame, sources: DataFrame, max_hops: int
) -> DataFrame:
    """Hop-bounded weighted single-source shortest paths (Bellman-Ford
    with a delta frontier). edges(src, dst, w) directed — pass both
    directions for an undirected graph; sources(node_id) start at 0.
    Returns (node_id, dist) where dist = MIN total weight over any path
    of ≤ max_hops edges — exactly the k-round Bellman-Ford invariant, so
    the result is a pure function of the edge multiset (no RNG, no
    scheduling dependence) and is value-checkable against a recursive-CTE
    oracle.

    Scale shape per round: ONE frontier⋈edges shuffle on src + one
    map-side-combinable min groupBy for the candidates, one min-merge
    groupBy with the running best, and an improvement filter that keeps
    the next frontier to just-improved nodes (a drained frontier
    early-exits the loop). Iteration state is (node_id, dist) only;
    per-round eager localCheckpoints keep the plan O(1) in rounds —
    the bfs_distances discipline with weights."""
    edges = edges.select("src", "dst", "w")
    best = (
        sources.select("node_id")
        .dropDuplicates(["node_id"])
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = best
    n_front = best.count()
    n_best = n_front
    for _ in range(max_hops):
        # frontier and best are node-sized state (counts known from the
        # previous round's fixpoint bookkeeping) — broadcast them so the
        # edge list is never exchanged inside the loop
        cand = (
            _bc_if(frontier, n_front)
            .join(edges, frontier.node_id == edges.src)
            .select(
                F.col("dst").alias("node_id"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            .groupBy("node_id")
            .agg(F.min("dist").alias("dist"))
        )
        merged = (
            best.unionByName(cand)
            .groupBy("node_id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        frontier = (
            merged.join(
                _bc_if(
                    best.select("node_id", F.col("dist").alias("old")),
                    n_best,
                ),
                "node_id",
                "left",
            )
            .filter(F.col("old").isNull() | (F.col("dist") < F.col("old")))
            .select("node_id", "dist")
            .localCheckpoint(eager=True)
        )
        best = merged
        n_best = merged.count()
        n_front = frontier.count()
        if n_front == 0:
            break
    return best


def neighbor_jaccard_topk(
    edges: DataFrame,
    key_col: str,
    item_col: str,
    k: int = 15,
    dense_cap_cells: int = 200_000_000,
    edge_cap: int = 5_000_000,
    n_blocks: int | None = None,
    probe_bounds: tuple[int, int, int] | None = None,
) -> DataFrame:
    """Exact top-k key pairs by Jaccard similarity of their item
    neighborhoods (common-neighbors link prediction over a bipartite
    graph). Returns (key_a, key_b, n_shared, deg_a, deg_b, jaccard),
    globally ordered by (jaccard desc, key_a, key_b), ≤ k rows.

    Plan shape: n_shared(a,b) is the Gram matrix A·Aᵀ of the 0/1
    key × item incidence matrix, so the Σ deg² pair-counting shuffle the
    naive per-item self-join pays (172M pair rows at sf0.1) collapses to
    a BROADCAST-BLOCK GEMM: the incidence matrix rides one broadcast
    (uint8, |keys|·|items| cells — 15 MB where the pair stream is GBs),
    each task multiplies one contiguous key-block against it in float32
    BLAS (exact for integer counts < 2²⁴), keeps its LOCAL top-k under
    the composite order, and only |blocks|·k candidate rows ever cross
    the network for the final global top-k. Zero pair shuffle, zero
    join. Every true global top-k pair is in some block's local top-k
    under the same total order, so the merge is exact.

    Above `dense_cap_cells` incidence cells (or `edge_cap` edge rows —
    the driver collect bound) the matrix no longer broadcasts and the
    operator falls back to the per-item broadcast/shuffle self-join with
    packed 64-bit pair keys — correct at any scale; at web scale prefer
    MinHash candidate generation (dedup.neighbor_minhash_candidates)
    with this exact form as the bounded re-rank. The size probe is ONE
    cheap distributed aggregate (count + two count-distincts) run BEFORE
    anything is collected, so an over-cap graph never touches the
    driver.

    Requires distinct (key, item) rows and non-negative int ids; pairs
    with zero shared items are excluded (matching the inner-join SQL
    formulation).

    `probe_bounds` = caller-known UPPER bounds (n_edges, n_keys, n_items)
    — e.g. base-table counts before the join that derives `edges`. When
    the bounds already clear both caps the exact probe (a full pass over
    the derived edge list with a 3-way count-distinct expand) is skipped
    entirely; bounds can only over-estimate, so the dense path is taken
    only when it is provably safe. Bounds over the caps fall back to the
    exact probe, never directly to the join path."""
    import numpy as np

    spark = edges.sparkSession
    e = edges.select(F.col(key_col).alias("k"), F.col(item_col).alias("i"))
    if probe_bounds is not None and (
        probe_bounds[1] * probe_bounds[2] <= dense_cap_cells
        and probe_bounds[0] <= edge_cap
    ):
        pass  # provably under the caps — no exact probe pass needed
    else:
        probe = e.agg(
            F.count("*").alias("n_edges"),
            F.countDistinct("k").alias("n_keys"),
            F.countDistinct("i").alias("n_items"),
        ).first()
        if (
            probe["n_keys"] * probe["n_items"] > dense_cap_cells
            or probe["n_edges"] > edge_cap
        ):
            return _neighbor_jaccard_topk_join(edges, key_col, item_col, k)

    pdf = e.toPandas()
    keys = np.sort(pdf["k"].unique())
    items_idx = {v: j for j, v in enumerate(pdf["i"].unique())}
    n_keys, n_items = len(keys), len(items_idx)
    key_idx = {v: j for j, v in enumerate(keys)}
    A = np.zeros((n_keys, n_items), dtype=np.uint8)
    A[
        pdf["k"].map(key_idx).to_numpy(),
        pdf["i"].map(items_idx).to_numpy(),
    ] = 1
    deg = A.sum(axis=1).astype(np.int64)
    bc = spark.sparkContext.broadcast((keys.astype(np.int64), A, deg))
    import uuid as _uuid

    cache_token = _uuid.uuid4().hex  # one per broadcast, rides the closure
    if n_blocks:
        blocks = n_blocks
    else:
        # two bounds on the block row count: parallelism (2 blocks/core)
        # AND a per-task MEMORY cap — each block materializes
        # (block_rows × n_keys) float64 score/mask arrays, and at the
        # default 2·cores blocks the ~3.5M-cell (~110 MB/task) arrays
        # churned the Python allocator into a within-session degradation
        # (A/B r6: 64 blocks read 5.8→11.7 s across rounds, 128 blocks
        # stable 3.7-4.3 s, identical output). ≤2M cells ≈ 64 MB peak
        # per task keeps the block pool allocator-friendly at any scale.
        bs_par = -(-n_keys // min(
            max(spark.sparkContext.defaultParallelism * 2, 1),
            max(n_keys, 1),
        ))
        bs_mem = max(1, 2_000_000 // max(n_keys, 1))
        blocks = -(-n_keys // max(1, min(bs_par, bs_mem)))
    bs = -(-n_keys // blocks)

    def block_topk(batches):
        import pandas as _pd

        ids, A8, dg = bc.value
        # float32 promotion (BLAS needs it) ONCE PER PYTHON WORKER, not
        # per task: workers are reused across tasks, and a per-task
        # astype would allocate a fresh 4× copy of the matrix every time
        # a block is scheduled (measurable churn near the dense cap).
        # The uint8 matrix stays the broadcast payload — shipping float32
        # would cost 4× the transfer for the same per-worker footprint.
        cache = globals().setdefault("_njt_f32_cache", {})
        if cache_token not in cache:  # token is unique per broadcast
            cache.clear()  # at most one matrix cached per worker
            cache[cache_token] = A8.astype(np.float32)
        Af = cache[cache_token]
        n = len(ids)
        dgf = dg.astype(np.float64)
        cols = np.arange(n)[None, :]
        for b in batches:
            for blk in b["id"].to_numpy():
                lo = int(blk) * bs
                hi = min(n, lo + bs)
                if lo >= hi:
                    continue
                S = Af[lo:hi] @ Af.T  # float32 GEMM, exact int counts
                # jaccard on the whole block in float64 (division of the
                # SAME exact integers as before — identical values), with
                # non-candidates (lower triangle / zero shared) masked to
                # -1, then a partition-select of the kth-largest value.
                # This replaces extracting EVERY candidate pair
                # (~2.6M/block at sf0.1) and lexsorting it (~0.5 s/block
                # measured) with O(cells) vectorized ops + an O(k+ties)
                # lexsort — same result: every composite-order top-k pair
                # has jaccard >= the kth-largest jaccard, so the
                # threshold superset always contains it, and the final
                # lexsort applies the identical total order.
                Sd = S.astype(np.float64)
                jac = Sd / (dgf[lo:hi, None] + dgf[None, :] - Sd)
                valid = (cols > np.arange(lo, hi)[:, None]) & (S >= 1.0)
                jac[~valid] = -1.0
                flat = jac.ravel()
                nv = int(valid.sum())
                if nv == 0:
                    continue
                kk = min(k, nv)
                thr = np.partition(flat, flat.size - kk)[flat.size - kk]
                sel = np.nonzero(flat >= thr)[0]
                ai, bi = np.unravel_index(sel, jac.shape)
                nsh = S[ai, bi].astype(np.int64)
                ga = lo + ai
                da, db = dg[ga], dg[bi]
                jv = flat[sel]
                top = np.lexsort((ids[bi], ids[ga], -jv))[:k]
                yield _pd.DataFrame(
                    {
                        "key_a": ids[ga][top],
                        "key_b": ids[bi][top],
                        "n_shared": nsh[top],
                        "deg_a": da[top],
                        "deg_b": db[top],
                        "jaccard": jv[top],
                    }
                )

    cand = spark.range(0, blocks, 1, blocks).mapInPandas(
        block_topk,
        "key_a long, key_b long, n_shared long, deg_a long, deg_b long,"
        " jaccard double",
    )
    return cand.orderBy(
        F.desc("jaccard"), F.asc("key_a"), F.asc("key_b")
    ).limit(k)


def _neighbor_jaccard_topk_join(
    edges: DataFrame, key_col: str, item_col: str, k: int
) -> DataFrame:
    """Shuffle fallback for neighbor_jaccard_topk past the dense cap: the
    per-item self-join with packed 64-bit pair keys (one 8-byte key per
    pair through the counting shuffle), broadcast degrees, global top-k
    via TakeOrdered. Σ deg² shuffle — correct anywhere, but prefer the
    MinHash candidate path at web scale.

    The 32|32 bit pack requires ids in [0, 2³²): verified by one O(|E|)
    aggregate up front (trivial next to the Σ deg² join). Ids outside the
    range — or IntegerType columns, whose shiftleft would silently mask
    the shift amount to 5 bits — fall back to the two-column counting
    key: same plan, 16-byte keys."""
    e = edges.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(item_col).alias("item"),
    )
    rng = e.agg(F.min("key").alias("lo"), F.max("key").alias("hi")).first()
    packable = (
        rng["lo"] is not None
        and rng["lo"] >= 0
        and rng["hi"] < (1 << 32)
    )
    deg = e.groupBy("key").agg(F.count("*").alias("deg"))
    a = e.select(F.col("key").alias("key_a"), "item")
    b = e.select(F.col("key").alias("key_b"), "item")
    pairs = a.join(b, "item").filter(F.col("key_a") < F.col("key_b"))
    if packable:
        shared = (
            pairs.select(
                (F.shiftleft(F.col("key_a"), 32) + F.col("key_b"))
                .alias("pair")
            )
            .groupBy("pair")
            .agg(F.count("*").alias("n_shared"))
            .select(
                F.shiftright("pair", 32).alias("key_a"),
                F.col("pair").bitwiseAND(F.lit(0xFFFFFFFF)).alias("key_b"),
                "n_shared",
            )
        )
    else:
        shared = (
            pairs.groupBy("key_a", "key_b")
            .agg(F.count("*").alias("n_shared"))
        )
    da = F.broadcast(
        deg.select(F.col("key").alias("key_a"), F.col("deg").alias("deg_a"))
    )
    db = F.broadcast(
        deg.select(F.col("key").alias("key_b"), F.col("deg").alias("deg_b"))
    )
    jac = F.col("n_shared") / (
        F.col("deg_a") + F.col("deg_b") - F.col("n_shared")
    ).cast("double")
    return (
        shared.join(da, "key_a")
        .join(db, "key_b")
        .withColumn("jaccard", jac)
        .orderBy(F.desc("jaccard"), F.asc("key_a"), F.asc("key_b"))
        .select("key_a", "key_b", "n_shared", "deg_a", "deg_b", "jaccard")
        .limit(k)
    )


def transitive_closure(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """Semi-naive transitive closure of a directed relation — the datalog
    evaluation step behind RDFS entailment (`subClassOf`⁺, `subPropertyOf`⁺)
    and owl:TransitiveProperty reasoning. Returns the set of (src, dst)
    pairs with dst reachable from src by ≥1 edge, deduplicated.

    Semi-naive discipline (Bancilhon 1985; every production datalog engine
    does this): each round joins only the DELTA from the previous round
    against the base relation — never known×known — and anti-joins the
    accumulated closure so a fact is derived exactly once. Rounds needed =
    longest path, and the loop early-exits the round a delta drains.

    Scale shape: intended for SCHEMA-sized relations (class / property
    hierarchies — thousands of rows even when the instance data is 10¹²
    triples). Instance-level entailment then becomes ONE broadcast join of
    the closed hierarchy against the instance table, which is the plan the
    callers here use (see q_kg_rdfs_closure). Per round: one delta⋈base
    shuffle + one anti-join; eager localCheckpoints keep the plan O(1) in
    rounds. For instance-scale closure (billions of edges) use
    connected_components / bfs_distances instead — closure materializes
    O(V·depth) pairs and is the wrong tool there by design."""
    base = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    known = base
    delta = base
    # max_rounds+1 probes: the extra probe exists so that exhausting the
    # budget with derivations STILL pending raises instead of silently
    # returning a partial closure (callers would undercount entailments
    # with no hint why)
    for rnd in range(max_rounds + 1):
        step = base.select(
            F.col("s").alias("mid"), F.col("d").alias("d2")
        )
        new = (
            delta.join(step, delta.d == step.mid)
            .select("s", F.col("d2").alias("d"))
            .distinct()
            .join(known, ["s", "d"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        if rnd == max_rounds:
            raise RuntimeError(
                f"transitive_closure did not converge in {max_rounds} "
                "rounds (delta still non-empty) — raise max_rounds"
            )
        known = known.unionByName(new).localCheckpoint(eager=True)
        delta = new
    return known.select(F.col("s").alias(src_col), F.col("d").alias(dst_col))


def bfs_distances_multi(
    edges: DataFrame, sources: DataFrame, max_hops: int
) -> DataFrame:
    """Multi-source tagged BFS: edges(src, dst) directed, sources(tag,
    node_id) — every (tag, node) pair explores independently, so one pass
    computes exact hop distances FROM EACH tagged source at once (the
    centrality-sampling primitive: k sampled sources ⇒ k BFS trees in
    max_hops rounds, not k·max_hops). Returns (tag, node_id, dist).

    Scale shape: identical to bfs_distances with the visited/frontier key
    widened to (tag, node_id) — per hop ONE frontier⋈edges equi-shuffle on
    the node key plus one anti-join against visited; state rows are
    (tag, node, dist) ids only, ≤ |tags|·|reached| total, partitioned on
    the composite key so no task holds a whole BFS tree. Eager
    localCheckpoints keep the plan O(1) in hops; a drained frontier
    early-exits."""
    edges = edges.select("src", "dst")
    visited = (
        sources.select("tag", "node_id")
        .dropDuplicates(["tag", "node_id"])
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("tag", "node_id")
    n_front = visited.count()
    n_vis = n_front
    for hop in range(1, max_hops + 1):
        # frontier / visited are (tag, node)-sized state with counts paid
        # by the fixpoint bookkeeping — broadcast them so the edge list
        # and the expanded frontier are never exchanged per hop
        nxt = (
            _bc_if(frontier, n_front)
            .join(edges, frontier.node_id == edges.src)
            .select("tag", F.col("dst").alias("node_id"))
            .dropDuplicates(["tag", "node_id"])
            .join(
                _bc_if(visited.select("tag", "node_id"), n_vis),
                ["tag", "node_id"],
                "left_anti",
            )
            .withColumn("dist", F.lit(hop).cast("long"))
            .localCheckpoint(eager=True)
        )
        n_front = nxt.count()
        if n_front == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        n_vis += n_front
        frontier = nxt.select("tag", "node_id")
    return visited


_WL_MOD = 2_147_483_647  # 2³¹−1 (prime): keeps every intermediate in 63 bits


def wl_refinement(
    edges: DataFrame,
    labels0: DataFrame,
    rounds: int = 2,
    n_nodes: int | None = None,
) -> DataFrame:
    """Weisfeiler-Leman color refinement (1-WL) — the structural
    fingerprinting loop behind graph-isomorphism screening, graph-kernel
    features, and GNN expressiveness analysis: each round a node's color
    becomes a hash of (its color, the MULTISET of neighbor colors).
    edges(src, dst) directed — pass both directions for undirected;
    labels0(node, l) integer seed colors. Returns (node, l) after
    `rounds` refinements.

    The multiset hash is COMMUTATIVE integer arithmetic — Σ((l+1)² mod M)
    mod M folded as l' = (31·l + Σ) mod M with M = 2³¹−1 — so it is (a)
    order-free, making the result a pure function of the graph no matter
    how rows are partitioned, (b) map-side combinable (a plain SUM — no
    collect_list of neighbor colors, which on a web-scale hub node would
    materialize the whole neighborhood in one task), and (c) exactly
    reproducible in ANSI SQL, so fixed-round runs are hash-checkable
    against a DuckDB oracle (float-free). Per round: ONE edges⋈labels
    equi-shuffle + one sum groupBy; lazy localCheckpoints keep the plan
    O(1) in rounds.

    Bound: each summand is < 2³¹, so the int64 SUM is exact for node
    degree < 2³² (~4.3e9) — an order of magnitude above the largest
    observed web-graph hub. Past that, Spark's long sum would wrap while
    an INT128 engine would not; pre-reduce with a two-level
    (node, salt)-then-node fold before trusting colors on such a graph."""
    edges = edges.select("src", "dst")
    labels = labels0.select("node", F.col("l").cast("long").alias("l"))
    sq = (F.col("l") + 1) * (F.col("l") + 1) % _WL_MOD
    for _ in range(rounds):
        # labels (and the per-round contrib, <= |labels| rows) are
        # node-sized; with a caller-known node count they broadcast so
        # the edge list never shuffles per round
        contrib = (
            edges.join(_bc_if(labels, n_nodes), edges.src == labels.node)
            .select(F.col("dst").alias("node"), sq.alias("q"))
            .groupBy("node")
            .agg((F.sum("q") % _WL_MOD).alias("s"))
        )
        labels = (
            labels.join(_bc_if(contrib, n_nodes), "node", "left")
            .select(
                "node",
                (
                    (F.col("l") * 31 + F.coalesce("s", F.lit(0))) % _WL_MOD
                ).alias("l"),
            )
            .localCheckpoint(eager=False)
        )
    return labels


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Deterministic synchronous label propagation (community detection):
    label₀(v) = v; labelₜ₊₁(v) = the label most frequent among v's
    neighbors at step t, ties broken by MIN label. Fixed `iters` rounds —
    the run is a pure function of the edge set (no RNG, no scheduling
    dependence), so the unrolled computation is SQL-expressible and the
    registered query is hash-checked against a DuckDB oracle.

    Scale shape per round: one join of the (node, label) table onto the
    directed-both-ways edge list (shuffle on node id), one
    groupBy(node, label) count with map-side combine, one min_by argmax —
    all JVM column ops; the label table is localCheckpoint'd each round
    so the plan stays O(1) in `iters` (the PageRank pattern). Returns
    (node, label) for every endpoint of `edges`. Isolated nodes don't
    exist by construction (every node has ≥1 edge)."""
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = und.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(iters):
        nbr = und.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "label")
        counts = nbr.groupBy("node", "label").agg(F.count("*").alias("c"))
        # argmax by (count desc, label asc): min_by over (-c, label)
        labels = counts.groupBy("node").agg(
            F.expr("min_by(label, struct(-c, label))").alias("label")
        ).localCheckpoint(eager=False)
    return labels
