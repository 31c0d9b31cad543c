"""Property-based checks (hypothesis) for the composable operators whose
edge cases live on arithmetic boundaries: interval overlap at cell edges,
BFS on arbitrary digraphs. Each property compares the distributed operator
against an independent in-Python reference on randomized inputs — small
sizes, bounded example counts (a Spark job per example is the cost)."""

import datetime

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

BASE = datetime.datetime(2024, 1, 1)


def _ts(seconds):
    return BASE + datetime.timedelta(seconds=int(seconds))


@pytest.fixture
def sparkref(spark):
    # the session fixture is session-scoped and identical across hypothesis
    # examples, so reusing it inside @given is sound; the health check only
    # flags the general pattern
    return spark


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7200),
            st.integers(min_value=0, max_value=3600),
        ),
        min_size=1,
        max_size=14,
    ),
    bucket_s=st.sampled_from([60, 600, 3600, 7200]),
)
def test_interval_overlap_join_equals_naive_reference(sparkref, ivs, bucket_s):
    """For ANY interval set (zero-length, touching cell edges, nested) and
    ANY bucket width, the bucketized overlap join equals the quadratic
    reference — inclusive bounds, each pair exactly once."""
    from hinbox_spark.operators.rangejoin import interval_overlap_join

    rows = [(i, _ts(s), _ts(s + ln)) for i, (s, ln) in enumerate(ivs)]
    left = sparkref.createDataFrame(rows, "iid long, s timestamp, e timestamp")
    right = left.select(
        F.col("iid").alias("jid"), F.col("s").alias("s2"), F.col("e").alias("e2")
    )
    got = sorted(
        (r["iid"], r["jid"])
        for r in interval_overlap_join(
            left, right, on=[], left_start="s", left_end="e",
            right_start="s2", right_end="e2", bucket_s=bucket_s,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (s1, l1) in enumerate(ivs)
        for j, (s2, l2) in enumerate(ivs)
        if s1 <= s2 + l2 and s2 <= s1 + l1
    )
    assert got == want


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edge_pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
    source=st.integers(min_value=0, max_value=9),
    max_hops=st.integers(min_value=0, max_value=4),
)
def test_bfs_distances_equal_python_bfs(sparkref, edge_pairs, source, max_hops):
    """On ANY digraph (self-loops, parallel edges, cycles) the distributed
    BFS reproduces a queue-based Python BFS exactly, for any hop cap."""
    from collections import deque

    from hinbox_spark.operators.graph import bfs_distances

    edges = sparkref.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edge_pairs], "src string, dst string"
    )
    sources = sparkref.createDataFrame([(f"n{source}",)], "node_id string")
    got = {
        r["node_id"]: r["dist"]
        for r in bfs_distances(edges, sources, max_hops=max_hops).collect()
    }

    adj = {}
    for a, b in edge_pairs:
        adj.setdefault(f"n{a}", set()).add(f"n{b}")
    want = {f"n{source}": 0}
    q = deque([(f"n{source}", 0)])
    while q:
        node, d = q.popleft()
        if d == max_hops:
            continue
        for nb in adj.get(node, ()):
            if nb not in want:
                want[nb] = d + 1
                q.append((nb, d + 1))
    assert got == want


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=120),
    k=st.integers(min_value=1, max_value=9),
    mod=st.integers(min_value=1, max_value=50),
)
def test_distributed_ntile_equals_reference_formula(sparkref, n, k, mod):
    """For ANY (N, k) — N < k, N % k ≠ 0, heavy ties broken by id — the
    distributed ntile reproduces the standard fill rule computed directly
    in Python from the sorted order."""
    from hinbox_spark.operators.ranking import distributed_ntile

    df = sparkref.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") % mod).alias("score")
    )
    order = [F.desc("score"), F.asc("doc_id")]
    got = {
        r["doc_id"]: r["tile"]
        for r in distributed_ntile(df, k, order, num_partitions=3).collect()
    }
    ranked = sorted(range(n), key=lambda i: (-(i % mod), i))
    q, r = divmod(n, k)
    want = {}
    for pos, doc in enumerate(ranked):
        if pos < r * (q + 1):
            want[doc] = pos // (q + 1) + 1
        else:
            want[doc] = r + (pos - r * (q + 1)) // q + 1
    assert got == want


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edge_pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=14,
    ),
)
def test_transitive_closure_equals_python_reachability(sparkref, edge_pairs):
    """For ANY small digraph — self-loops, duplicate edges, cycles,
    disconnected islands — semi-naive closure equals DFS reachability
    computed directly in Python (reach-by-≥1-edge, self-pairs only via
    an actual cycle)."""
    from hinbox_spark.operators.graph import transitive_closure

    df = sparkref.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edge_pairs], "src string, dst string"
    )
    got = {(r["src"], r["dst"]) for r in transitive_closure(df).collect()}

    adj = {}
    for a, b in edge_pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
    want = set()
    for s in list(adj):
        seen, stack = set(), list(adj[s])
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(adj.get(n, ()))
        want |= {(f"n{s}", f"n{d}") for d in seen}
    assert got == want


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edge_pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=14,
    ),
    seeds=st.lists(
        st.integers(min_value=0, max_value=3), min_size=7, max_size=7
    ),
    parts=st.sampled_from([1, 3, 7]),
)
def test_wl_refinement_python_parity_any_partitioning(
    sparkref, edge_pairs, seeds, parts
):
    """For ANY digraph, ANY integer seed coloring, and ANY edge
    partitioning, 2-round WL colors equal the pure-Python modular
    multiset-hash replica — the commutative-sum design makes the result
    partitioning-independent by construction, and this pins it."""
    from hinbox_spark.operators.graph import wl_refinement, _WL_MOD

    pairs = [(f"n{a}", f"n{b}") for a, b in edge_pairs]
    nodes = sorted({x for e in pairs for x in e})
    edges = sparkref.createDataFrame(
        pairs, "src string, dst string"
    ).repartition(parts)
    labels0 = sparkref.createDataFrame(
        [(n, seeds[int(n[1:])]) for n in nodes], "node string, l long"
    )

    lab = {n: seeds[int(n[1:])] for n in nodes}
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
