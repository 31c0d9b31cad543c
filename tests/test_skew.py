"""Skew primitives: salted aggregation equivalence + salted self-join
connectivity."""

import pyspark.sql.functions as F

from hinbox_spark.functions.skew import (
    salted_aggregate, salted_self_join_keys, skewed_keys,
)


def test_salted_aggregate_matches_direct(spark):
    df = spark.createDataFrame(
        [("hot", i % 7) for i in range(500)] + [("cold", 1), ("cold", 2)],
        "k string, v int",
    )
    direct = {
        r["k"]: sorted(r["vs"])
        for r in df.groupBy("k").agg(F.collect_set("v").alias("vs")).collect()
    }
    salted = {
        r["k"]: sorted(r["vs"])
        for r in salted_aggregate(
            df, ["k"],
            [F.collect_set("v").alias("vs")],
            [F.array_distinct(F.flatten(F.collect_list("vs"))).alias("vs")],
        ).collect()
    }
    assert direct == salted


def test_skewed_keys_detects_hot(spark):
    df = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("cold", 0)], "k string, v int"
    )
    hot = {r["k"] for r in skewed_keys(df, ["k"], threshold=50).collect()}
    assert hot == {"hot"}


def test_salted_self_join_connects_component(spark):
    """Pairs from the salted path must keep every same-key group connected
    (union-find closes them into one cluster even though not all pairs are
    emitted)."""
    df = spark.createDataFrame(
        [("k1", f"id{i:03d}") for i in range(40)] + [("k2", "x"), ("k2", "y")],
        "k string, id string",
    )
    pairs = salted_self_join_keys(df, "k", "id", factor=4).collect()
    # union-find over emitted pairs
    parent = {}
    def find(a):
        while parent.get(a, a) != a:
            a = parent[a]
        return a
    for r in pairs:
        ra, rb = find(r["src"]), find(r["dst"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    k1_roots = {find(f"id{i:03d}") for i in range(40)}
    assert len(k1_roots) == 1, "k1 group must form one component"
    assert find("x") == find("y")
    assert find("x") != next(iter(k1_roots))
