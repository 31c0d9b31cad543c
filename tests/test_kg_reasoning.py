"""Round-5 reasoning/consolidation operators: semi-naive transitive
closure, multi-source tagged BFS, RDFS subClassOf entailment, owl:sameAs
clique rewrite, and sampled harmonic centrality — each checked against an
independent pure-Python replica (the DuckDB oracle in the contract is the
second, engine-level check)."""

import collections

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _py_closure(pairs):
    adj = collections.defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
    out = set()
    for s in list(adj):
        seen, stack = set(), list(adj[s])
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(adj.get(n, ()))
        out |= {(s, d) for d in seen}
    return out


def test_transitive_closure_matches_python_on_dag_and_cycle(spark):
    from hinbox_spark.operators.graph import transitive_closure

    # diamond DAG + a disjoint 3-cycle + a chain feeding the cycle: the
    # cycle saturates (every member reaches every member incl. itself via
    # the loop) and the semi-naive anti-join must still terminate.
    pairs = [
        ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
        ("x", "y"), ("y", "z"), ("z", "x"),
        ("w", "x"),
        ("dup", "b"), ("dup", "b"),  # duplicate edge must not duplicate facts
    ]
    df = spark.createDataFrame(pairs, "src string, dst string")
    got = {(r["src"], r["dst"]) for r in transitive_closure(df).collect()}
    assert got == _py_closure(pairs)
    # cycle members reach themselves through the loop
    assert ("x", "x") in got and ("w", "w") not in got


def test_bfs_multi_matches_per_source_bfs(spark):
    from hinbox_spark.operators.graph import bfs_distances, bfs_distances_multi

    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    bi = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    src_nodes = [
        r["src"] for r in e0.select("src").distinct().orderBy("src").limit(3).collect()
    ]
    multi = bfs_distances_multi(
        bi,
        spark.createDataFrame(
            [(s, s) for s in src_nodes], "tag string, node_id string"
        ),
        max_hops=2,
    )
    got = {
        (r["tag"], r["node_id"]): r["dist"] for r in multi.collect()
    }
    expected = {}
    for s in src_nodes:
        one = bfs_distances(
            bi, spark.createDataFrame([(s,)], "node_id string"), max_hops=2
        )
        for r in one.collect():
            expected[(s, r["node_id"])] = r["dist"]
    assert got == expected


def test_rdfs_closure_entailment_invariants(spark):
    from hinbox_spark.plans.queries import q_kg_rdfs_closure

    part = spark.read.parquet(f"{SF}/part.parquet")
    n_parts = part.count()
    by_type = {
        r["p_type"]: r["n"]
        for r in part.groupBy("p_type").agg(F.count("*").alias("n")).collect()
    }
    by_brand = {
        r["p_brand"]: r["n"]
        for r in part.groupBy("p_brand").agg(F.count("*").alias("n")).collect()
    }
    rows = {r["class"]: r for r in q_kg_rdfs_closure(spark, SF).collect()}
    # rdfs9 propagation: root entails EVERY instance; each upper class
    # entails exactly its subtree's instances; leaves entail only direct.
    assert rows["root"]["n_entailed"] == n_parts
    assert rows["root"]["n_direct"] == 0
    for t, n in by_type.items():
        assert rows[f"t:{t}"]["n_entailed"] == n
        assert rows[f"t:{t}"]["n_direct"] == 0
    for b, n in by_brand.items():
        assert rows[f"b:{b}"]["n_entailed"] == n
    for cls, r in rows.items():
        if cls.startswith("t:") and "/b:" in cls:
            assert r["n_entailed"] == r["n_direct"] > 0
    # diamond check: Σ leaf direct == root entailed (each instance counted
    # once per ancestor, and every leaf has exactly one path-set to root)
    leaf_total = sum(
        r["n_direct"] for c, r in rows.items() if "/b:" in c
    )
    assert leaf_total == n_parts


def test_sameas_rewrite_matches_union_find_replica(spark):
    from hinbox_spark.plans.queries import q_kg_sameas_rewrite

    rows = spark.read.parquet(f"{SF}/part.parquet").select(
        "p_partkey", "p_name", "p_brand", "p_size"
    ).collect()
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    blocks = collections.defaultdict(list)
    for r in rows:
        blocks[("nb", r["p_name"], r["p_brand"])].append(r["p_partkey"])
        blocks[("ns", r["p_name"], r["p_size"])].append(r["p_partkey"])
    for mem in blocks.values():
        m0 = min(mem)
        for m in mem:
            union(m0, m)
    canon = {r["p_partkey"]: find(r["p_partkey"]) for r in rows}
    sizes = collections.Counter(canon.values())

    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    tri = {
        (r["o_custkey"], r["l_partkey"])
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .collect()
    }
    rew = {(c, canon[p]) for c, p in tri}
    exp_hist = collections.Counter(sizes.values())
    exp_tri = collections.Counter()
    for c, cl in rew:
        exp_tri[sizes[cl]] += 1

    got = {
        r["clique_size"]: (r["n_cliques"], r["n_triples_after"])
        for r in q_kg_sameas_rewrite(spark, SF).collect()
    }
    assert got == {
        s: (exp_hist[s], exp_tri.get(s, 0)) for s in exp_hist
    }
    # consolidation actually consolidates: fewer canonical triples than raw
    assert sum(t for _, t in got.values()) < len(tri)
    assert any(s > 2 for s in got)  # multi-hop cliques exist in the fixture


def test_harmonic_centrality_matches_python_bfs(spark):
    from hinbox_spark.plans.queries import q_kg_harmonic_centrality

    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    )
    adj = collections.defaultdict(set)
    for r in pairs:
        c, s = f"c:{r['o_custkey']}", f"s:{r['l_suppkey']}"
        adj[c].add(s)
        adj[s].add(c)
    srcs = sorted({f"c:{r['o_custkey']}" for r in pairs},
                  key=lambda x: int(x[2:]))[:8]
    # sources = 8 smallest custkeys among ALL orders (not just joined) —
    # every order has lineitems in this corpus, assert that holds so the
    # replica's source set matches the query's
    all_ck = sorted(
        r["o_custkey"] for r in o.select("o_custkey").distinct().collect()
    )[:8]
    assert srcs == [f"c:{k}" for k in all_ck]
    expected = {}
    for s in srcs:
        dist = {s: 0}
        frontier = [s]
        for h in (1, 2, 3):
            nxt = []
            for n in frontier:
                for m in adj[n]:
                    if m not in dist:
                        dist[m] = h
                        nxt.append(m)
            frontier = nxt
        reached = [d for d in dist.values() if d > 0]
        expected[s] = (sum(6 // d for d in reached), len(reached))
    got = {
        r["source"]: (r["harmonic_sixths"], r["n_reached"])
        for r in q_kg_harmonic_centrality(spark, SF).collect()
    }
    assert got == expected


def test_wl_refinement_matches_python_and_distinguishes_structure(spark):
    """Crafted graph: a 4-path and a 4-star have the same node count and
    edge count, but 1-WL must separate the star center (3 degree-1
    neighbors) from every path node by round 2. Colors must match an
    independent pure-Python replica of the modular multiset hash."""
    from hinbox_spark.operators.graph import wl_refinement, _WL_MOD

    und = [("p1", "p2"), ("p2", "p3"), ("p3", "p4"),
           ("hub", "x1"), ("hub", "x2"), ("hub", "x3")]
    pairs = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    nodes = sorted({x for e in pairs for x in e})
    labels0 = spark.createDataFrame(
        [(n, 0) for n in nodes], "node string, l long"
    )

    lab = {n: 0 for n in nodes}
    for _ in range(2):
        s = {n: 0 for n in nodes}
        for a, b in pairs:
            s[b] = (s[b] + (lab[a] + 1) * (lab[a] + 1) % _WL_MOD) % _WL_MOD
        lab = {n: (lab[n] * 31 + s[n]) % _WL_MOD for n in nodes}

    got = {
        r["node"]: r["l"]
        for r in wl_refinement(edges, labels0, rounds=2).collect()
    }
    assert got == lab
    # structure separation: star center ≠ any path color; leaves x1-x3
    # share a color; path ends share a color distinct from the middle
    assert got["hub"] not in {got[p] for p in ("p1", "p2", "p3", "p4")}
    assert got["x1"] == got["x2"] == got["x3"]
    assert got["p1"] == got["p4"] != got["p2"]


def test_kg_ppr_matches_numpy_power_iteration(spark):
    """PPR (restart to the 4 smallest customer nodes, d=0.85, 8 fixed
    iterations) must agree with a dense numpy replica to float precision;
    restart mass must keep seeds ranked above the global-PageRank order."""
    import numpy as np

    from hinbox_spark.plans.queries import _purchase_edges, q_kg_ppr

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
    seeds = sorted(
        {int(a[2:]) for a, _ in fwd}
    )[:4]
    e_s = np.zeros(n)
    for k in seeds:
        e_s[idx[f"c:{k}"]] = 0.25
    rank = e_s.copy()
    d = 0.85
    for _ in range(8):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += rank[idx[s]] / deg[idx[s]]
        rank = (1.0 - d) * e_s + d * contrib

    got = q_kg_ppr(spark, SF).collect()
    assert len(got) == 10
    expected = sorted(
        ((nodes[i], rank[i]) for i in range(n)),
        key=lambda t: (-round(t[1], 8), t[0]),
    )[:10]
    for row, (name, r) in zip(got, expected):
        assert row["node_id"] == name
        assert abs(row["rank"] - round(r, 8)) < 1e-9
    # personalization check: all 4 seeds are in the top-10
    top = {r["node_id"] for r in got}
    assert {f"c:{k}" for k in seeds} <= top
