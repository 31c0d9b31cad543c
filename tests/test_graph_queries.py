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
