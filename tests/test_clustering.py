"""Connected components: driver union-find vs distributed label propagation
must produce identical clusters; both deterministic."""

import pytest

from hinbox_spark.operators.clustering import (
    _distributed_components, _driver_union_find, connected_components,
)


@pytest.fixture(scope="module")
def graph(spark):
    # components: {a,b,c,d} (chain), {e,f}, {g} isolated, {h,i} via 2 paths
    nodes = spark.createDataFrame(
        [(x,) for x in "abcdefghi"], "node_id string"
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"),
         ("h", "i"), ("i", "h")],
        "src string, dst string",
    )
    return nodes, edges


def _labels(df):
    return {r["node_id"]: r["cluster_id"] for r in df.collect()}


def test_adaptive_path_is_driver_uf(graph):
    nodes, edges = graph
    out = _labels(connected_components(nodes, edges))
    assert out["a"] == out["b"] == out["c"] == out["d"] == "a"
    assert out["e"] == out["f"] == "e"
    assert out["g"] == "g"
    assert out["h"] == out["i"] == "h"


def test_distributed_matches_driver(graph):
    nodes, edges = graph
    driver = _labels(_driver_union_find(nodes, edges.collect()))
    dist = _labels(_distributed_components(nodes, edges))
    assert driver == dist


def test_long_chain_converges(spark):
    """Label propagation halves the diameter per round; a 40-node chain
    must converge within max_iters (log-bounded) and match union-find."""
    n = 40
    ids = [f"n{i:02d}" for i in range(n)]
    nodes = spark.createDataFrame([(x,) for x in ids], "node_id string")
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(n - 1)], "src string, dst string"
    )
    dist = _labels(_distributed_components(nodes, edges))
    assert set(dist.values()) == {"n00"}
    driver = _labels(_driver_union_find(nodes, edges.collect()))
    assert driver == dist


def test_pairwise_cluster_quality_vs_independent_reference(spark):
    """Pairwise P/R/F1 from the contingency table must equal the direct
    pair-enumeration definition computed independently in Python."""
    from itertools import combinations

    from hinbox_spark.operators.clustering import pairwise_cluster_quality

    rows = [
        (i, f"p{i % 4}", f"g{(i * 7) % 3}") for i in range(60)
    ] + [(100 + i, "p_big", "g_big") for i in range(25)]
    df = spark.createDataFrame(rows, "id long, pred string, gold string")

    got = pairwise_cluster_quality(df).collect()[0]

    items = [(r[1], r[2]) for r in rows]
    tp = pp = gp = 0
    for (pa, ga), (pb, gb) in combinations(items, 2):
        same_p, same_g = pa == pb, ga == gb
        pp += same_p
        gp += same_g
        tp += same_p and same_g
    assert got["n_items"] == len(items)
    assert got["tp_pairs"] == tp
    assert got["pred_pairs"] == pp
    assert got["gold_pairs"] == gp
    assert got["precision"] == tp / pp
    assert got["recall"] == tp / gp
    assert got["f1"] == 2 * tp / (pp + gp)


def test_b3_cluster_quality_vs_independent_reference(spark):
    """B³ P/R/F1 must match the per-item definition (each item's precision
    = |cluster ∩ class| / |cluster|) computed independently."""
    from hinbox_spark.operators.clustering import b3_cluster_quality

    rows = [(i, f"p{i % 3}", f"g{(i * 5) % 4}") for i in range(80)]
    df = spark.createDataFrame(rows, "id long, pred string, gold string")
    got = b3_cluster_quality(df).collect()[0]

    from collections import Counter

    cl = Counter(r[1] for r in rows)
    gl = Counter(r[2] for r in rows)
    cell = Counter((r[1], r[2]) for r in rows)
    n = len(rows)
    p = sum(cell[(pc, gc)] / cl[pc] for (_, pc, gc) in rows) / n
    r_ = sum(cell[(pc, gc)] / gl[gc] for (_, pc, gc) in rows) / n
    assert abs(got["b3_precision"] - p) < 1e-12
    assert abs(got["b3_recall"] - r_) < 1e-12
    assert abs(got["b3_f1"] - 2 * p * r_ / (p + r_)) < 1e-12
    assert got["n_items"] == n


def test_driver_path_nonstring_ids_and_edge_only_nodes(spark):
    """The adaptive driver path must (a) accept whatever node_id type the
    caller uses (the mapping schema mirrors it — it used to hard-code
    string and crash on long ids) and (b) emit edge endpoints absent from
    `nodes`, matching the distributed path's labels ∪ isolated row set."""
    nodes = spark.createDataFrame([(1,), (2,), (5,)], "node_id long")
    edges = spark.createDataFrame([(1, 2), (2, 9)], "src long, dst long")
    got = {
        r["node_id"]: r["cluster_id"]
        for r in connected_components(nodes, edges).collect()
    }
    # 9 is edge-only: still labeled, in the same component as 1/2
    assert got == {1: 1, 2: 1, 9: 1, 5: 5}
