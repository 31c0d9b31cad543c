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
