"""Skew primitives: salted aggregation equivalence + salted self-join
connectivity + tournament top-k exactness."""

import pyspark.sql.functions as F

from hinbox_spark.functions.skew import (
    bounded_topk, salted_aggregate, salted_self_join_keys, skewed_keys,
)


def test_bounded_topk_matches_naive_window(spark):
    """bounded_topk must return EXACTLY the rows of the naive per-key
    row_number window — on a skewed input (one mega-key with 5k rows beside
    a long tail) and regardless of shuffle partitioning."""
    from pyspark.sql import Window

    rows = [("mega", f"u{i:05d}", i % 997) for i in range(5000)]
    rows += [(f"k{j}", f"u{j}", j) for j in range(50)]
    df = spark.createDataFrame(rows, "k string, url string, ts int")

    naive = (
        df.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("k").orderBy("ts", "url")),
        )
        .filter(F.col("_rn") <= 10)
        .drop("_rn")
    )
    tourney = bounded_topk(
        df, keys=["k"], order_by=[F.col("ts"), F.col("url")], k=10,
        salt_expr=F.xxhash64("url"), n_salts=8,
    )
    exp = sorted(map(tuple, naive.collect()))
    got = sorted(map(tuple, tourney.collect()))
    assert got == exp

    # partitioning invariance: different shuffle partitioning, same rows
    got13 = sorted(map(tuple, tourney.repartition(13).collect()))
    assert got13 == exp


def test_bounded_topk_small_groups_pass_through(spark):
    """Groups smaller than k are returned whole."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 7)], "k string, v int"
    )
    got = sorted(
        map(tuple, bounded_topk(
            df, ["k"], [F.col("v")], k=5, salt_expr=F.xxhash64("v"),
        ).collect())
    )
    assert got == [("a", 1), ("a", 2), ("b", 7)]


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
