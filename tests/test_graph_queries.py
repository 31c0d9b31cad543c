"""Graph-query trio over the bipartite purchase graph: exact 2-hop oracle
baseline, HLL scale path (accuracy pinned), connected components via the
J11 operator checked against an independent pure-Python union-find."""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_hll_reach_tracks_exact_within_5pct(spark):
    from hinbox_spark.plans.queries import (
        _purchase_edges, q_copurchase_reach_hll,
    )

    e = _purchase_edges(spark, SF)
    a, b = e.alias("a"), e.alias("b")
    exact = {
        r["custkey"]: r["n"]
        for r in a.join(
            b,
            (F.col("a.suppkey") == F.col("b.suppkey"))
            & (F.col("a.custkey") != F.col("b.custkey")),
        )
        .groupBy(F.col("a.custkey").alias("custkey"))
        .agg(F.count_distinct(F.col("b.custkey")).alias("n"))
        .collect()
    }
    approx = {
        r["custkey"]: r["approx_neighbors"]
        for r in q_copurchase_reach_hll(spark, SF).collect()
    }
    assert approx
    for ck, est in approx.items():
        true = exact[ck]
        assert abs(est - true) <= max(2, 0.05 * true), (ck, est, true)


def test_copurchase_components_match_union_find(spark):
    from hinbox_spark.plans.queries import (
        _purchase_edges, q_copurchase_components,
    )

    edges = [
        (f"c:{r['custkey']}", f"s:{r['suppkey']}")
        for r in _purchase_edges(spark, SF).collect()
    ]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    comps: dict = {}
    for n in list(parent):
        comps.setdefault(find(n), []).append(n)

    row = q_copurchase_components(spark, SF).first()
    assert row["n_components"] == len(comps)
    assert row["n_nodes"] == len(parent)
    assert row["largest_component"] == max(len(v) for v in comps.values())


def test_copurchase_pagerank_matches_numpy_power_iteration(spark):
    """The Spark PageRank (8 fixed iterations, d=0.85, no dangling term —
    every node has degree ≥ 1) must agree with an independent dense numpy
    power iteration on the same graph to ~float precision, and be
    deterministic across reruns."""
    import numpy as np

    from hinbox_spark.plans.queries import (
        _purchase_edges, q_copurchase_pagerank,
    )

    fwd = [
        (f"c:{r['custkey']}", f"s:{r['suppkey']}")
        for r in _purchase_edges(spark, SF).collect()
    ]
    edges = fwd + [(b, a) for a, b in fwd]
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(8):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += rank[idx[s]] / deg[idx[s]]
        rank = (1.0 - d) / n + d * contrib

    got = q_copurchase_pagerank(spark, SF).collect()
    assert len(got) == 10
    expected_order = sorted(
        ((nodes[i], rank[i]) for i in range(n)),
        key=lambda t: (-round(t[1], 8), t[0]),
    )[:10]
    for row, (name, r) in zip(got, expected_order):
        assert row["node_id"] == name
        # the query rounds to 8 decimals; compare against the rounded ref
        assert abs(row["rank"] - round(r, 8)) < 1e-9, (
            row["node_id"], row["rank"], r,
        )

    rerun = q_copurchase_pagerank(spark, SF).collect()
    assert [(r["node_id"], r["rank"]) for r in rerun] == [
        (r["node_id"], r["rank"]) for r in got
    ]


def test_bfs_distances_exact_hops_and_early_exit(spark):
    """Crafted graph: chain with a shortcut (BFS must take the 2-hop path,
    not the 3-hop one), a cycle (must not loop), an unreachable node (must
    be absent), and a frontier that drains before max_hops (early exit
    returns the same result as a deep max_hops)."""
    from hinbox_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"),   # chain a→b→c→d
            ("a", "c"),                              # shortcut: c at dist 1
            ("d", "a"),                              # cycle back
            ("x", "y"),                              # disconnected island
        ],
        "src string, dst string",
    )
    src = spark.createDataFrame([("a",)], "node_id string")
    got = {
        r["node_id"]: r["dist"]
        for r in bfs_distances(edges, src, max_hops=10).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}
    # exact cap honored
    capped = {
        r["node_id"]: r["dist"]
        for r in bfs_distances(edges, src, max_hops=1).collect()
    }
    assert capped == {"a": 0, "b": 1, "c": 1}
    # multi-source: dist is the min over sources
    multi = spark.createDataFrame([("a",), ("d",)], "node_id string")
    got_multi = {
        r["node_id"]: r["dist"]
        for r in bfs_distances(edges, multi, max_hops=10).collect()
    }
    assert got_multi == {"a": 0, "d": 0, "b": 1, "c": 1}


def test_components_oracle_multi_component_fixture(spark, tmp_path):
    """The ORACLE_COPURCHASE_COMPONENTS contraction algorithm (per-customer
    supplier chains → closure over the supplier projection) must agree with
    the Spark CC query on a graph with SEVERAL components — sf0.01 is one
    giant component, which would hide a broken contraction."""
    import duckdb

    from hinbox_spark.plans.queries import (
        ORACLE_COPURCHASE_COMPONENTS, q_copurchase_components,
    )

    # three islands: {c1,c2}×{s1,s2,s3} chained, {c3}×{s4}, {c4,c5}×{s5}
    # plus a customer bridging two otherwise-separate supplier pairs
    pairs = [
        (1, 1), (1, 2), (2, 2), (2, 3),
        (3, 4),
        (4, 5), (5, 5),
        (6, 6), (6, 7),  # bridge: c6 joins s6 and s7
    ]
    orders = [(i + 1, c) for i, (c, _) in enumerate(pairs)]
    lines = [(i + 1, s) for i, (_, s) in enumerate(pairs)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    sdf = q_copurchase_components(spark, str(tmp_path)).toPandas()

    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    ddf = con.execute(ORACLE_COPURCHASE_COMPONENTS).df()

    got_s = sdf.iloc[0].to_dict()
    got_d = ddf.iloc[0].to_dict()
    # hand-check: comp1 = {c1,c2,s1,s2,s3} (5), comp2 = {c3,s4} (2),
    # comp3 = {c4,c5,s5} (3), comp4 = {c6,s6,s7} (3) → 4 comps, 13 nodes
    expect = {"n_components": 4, "n_nodes": 13, "largest_component": 5}
    assert {k: int(v) for k, v in got_s.items()} == expect
    assert {k: int(v) for k, v in got_d.items()} == expect


def test_copurchase_triangles_match_bruteforce(spark):
    """Independent check: rebuild the capped projection in pure Python
    (sorted-custkey cap per supplier, itertools pairs) and enumerate
    triangles by ordered adjacency intersection — a different algorithm
    from the query's wedge-check joins."""
    import collections
    import itertools

    from hinbox_spark.plans.queries import (
        _purchase_edges, q_copurchase_triangles,
    )

    by_supp = collections.defaultdict(list)
    for r in _purchase_edges(spark, SF).collect():
        by_supp[r["suppkey"]].append(r["custkey"])
    edges = set()
    for custs in by_supp.values():
        edges.update(itertools.combinations(sorted(custs)[:8], 2))
    adj = collections.defaultdict(set)
    for x, y in edges:
        adj[x].add(y)
        adj[y].add(x)
    counts = collections.Counter()
    for x, y in edges:  # x < y by construction
        for z in adj[x] & adj[y]:
            if z > y:  # each triangle once, as x < y < z
                counts[x] += 1
                counts[y] += 1
                counts[z] += 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = [
        (r["custkey"], r["n_triangles"])
        for r in q_copurchase_triangles(spark, SF).collect()
    ]
    assert len(got) == 10 and got == expect
    assert got[0][1] > 0  # fixture actually has triangles


def test_copurchase_triangles_plan_has_no_cartesian(spark):
    from hinbox_spark.plans.queries import q_copurchase_triangles

    plan = (
        q_copurchase_triangles(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def _reference_kcore(edges: list[tuple], k: int) -> dict:
    """Independent driver-side peeling: adjacency sets, repeatedly delete
    degree<k nodes until fixpoint → {node: in-core degree}."""
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


def test_kcore_matches_reference_peeling_with_deep_cascade(spark):
    """A 6-node path peels one node per round from each end under k=2
    (max cascade depth), plus a 4-clique that must survive intact, plus
    a pendant hanging off the clique — the distributed peel must agree
    node-for-node and degree-for-degree with independent peeling."""
    from hinbox_spark.operators.graph import kcore

    path = [(f"p{i}", f"p{i+1}") for i in range(6)]
    clique = [(f"c{i}", f"c{j}") for i in range(4) for j in range(i + 1, 4)]
    pendant = [("c0", "x"), ("x", "x")]  # + a self-loop that must be ignored
    edges = path + clique + pendant
    df = spark.createDataFrame(edges, "src string, dst string")

    got = {r["node"]: r["core_deg"] for r in kcore(df, k=2).collect()}
    want = _reference_kcore(edges, 2)
    assert got == want
    assert set(got) == {"c0", "c1", "c2", "c3"}  # path + pendant fully peel
    assert got["c1"] == 3  # clique-internal degree, not the raw degree

    # k=4: even the 4-clique dies (internal degree 3) → empty core
    assert kcore(df, k=4).count() == 0


def test_kcore_partitioning_invariant_and_duplicate_edge_safe(spark):
    from hinbox_spark.operators.graph import kcore

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "b"), ("b", "a"),
             ("c", "d")]
    df1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    df7 = spark.createDataFrame(edges, "src string, dst string").repartition(7)
    r1 = sorted(map(tuple, kcore(df1, k=2).collect()))
    r7 = sorted(map(tuple, kcore(df7, k=2).collect()))
    assert r1 == r7 == [("a", 2), ("b", 2), ("c", 2)]  # dup a-b counts once


def test_copurchase_kcore_query_matches_reference(spark):
    """The registered query must agree with independent peeling on the
    real sf0.001 purchase graph (k=8 peels the degree-3 tail there)."""
    from hinbox_spark.plans.queries import (
        _purchase_edges,
        q_copurchase_kcore,
    )

    sf = "/root/testdata/sf0.001"
    edges = [
        (f"c:{r['custkey']}", f"s:{r['suppkey']}")
        for r in _purchase_edges(spark, sf).collect()
    ]
    want = _reference_kcore(edges, 8)
    got = {r["node"]: r["core_deg"]
           for r in q_copurchase_kcore(spark, sf).collect()}
    # query returns top-50 by (core_deg desc, node asc) — check that slice
    want_top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert sorted(got.items(), key=lambda kv: (-kv[1], kv[0])) == want_top
    assert 0 < len(want) < len({n for e in edges for n in e})  # non-trivial


def test_neighbor_jaccard_topk_dense_and_fallback_agree(spark):
    """The broadcast-GEMM dense path and the packed-pair-key counting-join
    fallback are the SAME operator contract: forcing the fallback with a
    tiny dense cap (and separately a tiny edge cap, the driver-collect
    bound) must reproduce the dense path's rows bit-for-bit, including
    the (jaccard desc, key_a, key_b) order and the IEEE-exact jaccard."""
    from hinbox_spark.operators.graph import neighbor_jaccard_topk

    edges = [
        (c, s)
        for c in range(1, 13)
        for s in range(1, 9)
        if (c * 7 + s * 13) % 3 != 0 or c == s
    ]
    df = spark.createDataFrame(edges, "custkey long, suppkey long")
    dense = neighbor_jaccard_topk(df, "custkey", "suppkey", k=10).collect()
    by_cells = neighbor_jaccard_topk(
        df, "custkey", "suppkey", k=10, dense_cap_cells=4
    ).collect()
    by_edges = neighbor_jaccard_topk(
        df, "custkey", "suppkey", k=10, edge_cap=4
    ).collect()
    assert [tuple(r) for r in dense] == [tuple(r) for r in by_cells]
    assert [tuple(r) for r in dense] == [tuple(r) for r in by_edges]
    assert len(dense) == 10
    # jaccard really is |shared| / |union| of the two neighbor sets
    nbrs = {}
    for c, s in edges:
        nbrs.setdefault(c, set()).add(s)
    for r in dense:
        a, b = nbrs[r["key_a"]], nbrs[r["key_b"]]
        assert r["n_shared"] == len(a & b) > 0
        assert r["jaccard"] == len(a & b) / len(a | b)


def test_label_propagation_recovers_planted_communities(spark):
    """Two dense blobs joined by a single bridge edge: 3 rounds of
    deterministic sync LPA must give every node of a blob one label, the
    two blobs different labels, regardless of input partitioning.
    (The registered copurchase_communities query is hash-oracled against
    an unrolled-SQL DuckDB reference; this pins the operator's actual
    community behavior on a graph that HAS communities — the TPC-H
    purchase graph is too dense to.)"""
    from hinbox_spark.operators.graph import label_propagation

    blob_a = [(f"a{i}", f"a{j}") for i in range(6) for j in range(i + 1, 6)]
    blob_b = [(f"b{i}", f"b{j}") for i in range(6) for j in range(i + 1, 6)]
    edges = blob_a + blob_b + [("a0", "b0")]
    for parts in (1, 7):
        df = spark.createDataFrame(
            edges, "src string, dst string"
        ).repartition(parts)
        lab = {r["node"]: r["label"]
               for r in label_propagation(df, iters=3).collect()}
        a_labels = {lab[f"a{i}"] for i in range(6)}
        b_labels = {lab[f"b{i}"] for i in range(6)}
        assert len(a_labels) == 1 and len(b_labels) == 1
        assert a_labels != b_labels


def test_neighbor_jaccard_join_fallback_int_keys_and_unpackable_ids(spark):
    """The packed-pair fallback must (a) give identical results for
    IntegerType vs LongType key columns (an int shiftleft would mask the
    shift amount to 5 bits and silently merge unrelated pairs) and
    (b) route ids outside [0, 2^32) through the two-column counting key
    instead of the 32|32 pack."""
    from pyspark.sql import functions as F

    from hinbox_spark.operators.graph import _neighbor_jaccard_topk_join

    rows = [(1, 10), (1, 11), (2, 10), (2, 11), (3, 11), (4, 12), (3, 12)]
    as_long = spark.createDataFrame(rows, "key bigint, item bigint")
    as_int = spark.createDataFrame(rows, "key int, item int")

    want = [
        (r["key_a"], r["key_b"], r["n_shared"], r["jaccard"])
        for r in _neighbor_jaccard_topk_join(as_long, "key", "item", 5).collect()
    ]
    got_int = [
        (r["key_a"], r["key_b"], r["n_shared"], r["jaccard"])
        for r in _neighbor_jaccard_topk_join(as_int, "key", "item", 5).collect()
    ]
    assert want and got_int == want
    # sanity vs hand computation: (1,2) share both items, jaccard 1.0
    assert want[0] == (1, 2, 2, 1.0)

    # ids >= 2^32: the pack would bleed key_b into key_a's bits
    big = spark.createDataFrame(
        [(k + (1 << 33), i) for k, i in rows], "key bigint, item bigint"
    )
    got_big = [
        (r["key_a"] - (1 << 33), r["key_b"] - (1 << 33),
         r["n_shared"], r["jaccard"])
        for r in _neighbor_jaccard_topk_join(big, "key", "item", 5).collect()
    ]
    assert got_big == want


def test_copurchase_hits_matches_numpy_replica(spark):
    """The Spark HITS (4 full unnormalized iterations, one final
    max-normalization) must agree with an independent dense numpy replica
    on the same directed bipartite graph to ~float precision, and the
    unnormalized-then-normalize-once schedule must equal the textbook
    per-round-normalized fixpoint direction (scaling commutes with the
    linear updates)."""
    import numpy as np

    from hinbox_spark.plans.queries import _purchase_edges, q_copurchase_hits

    edges = [
        (r["custkey"], r["suppkey"])
        for r in _purchase_edges(spark, SF).collect()
    ]
    custs = sorted({c for c, _ in edges})
    supps = sorted({s for _, s in edges})
    ci = {c: i for i, c in enumerate(custs)}
    si = {s: i for i, s in enumerate(supps)}
    E = np.zeros((len(custs), len(supps)))
    for c, s in edges:
        E[ci[c], si[s]] = 1.0
    h = np.ones(len(custs))
    for _ in range(4):
        a = E.T @ h
        h = E @ a
    a_norm, h_norm = a / a.max(), h / h.max()

    # per-round-normalized textbook HITS points the same direction
    h2 = np.ones(len(custs))
    for _ in range(4):
        a2 = E.T @ h2
        a2 = a2 / a2.max()
        h2 = E @ a2
        h2 = h2 / h2.max()
    assert np.allclose(a_norm, a2 / a2.max(), rtol=1e-9)
    assert np.allclose(h_norm, h2, rtol=1e-9)

    got = q_copurchase_hits(spark, SF).collect()
    assert len(got) == 20
    want_auth = sorted(
        ((f"s:{s}", a_norm[si[s]]) for s in supps),
        key=lambda t: (-round(t[1], 8), t[0]),
    )[:10]
    want_hub = sorted(
        ((f"c:{c}", h_norm[ci[c]]) for c in custs),
        key=lambda t: (-round(t[1], 8), t[0]),
    )[:10]
    for row, (name, score) in zip(got, want_auth + want_hub):
        assert row["node_id"] == name, (row, name)
        assert abs(row["score"] - round(score, 8)) < 1e-9, (row, score)

    rerun = q_copurchase_hits(spark, SF).collect()
    assert [tuple(r) for r in rerun] == [tuple(r) for r in got]
