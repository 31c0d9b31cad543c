"""Dedup family: exact, MinHash-LSH, SimHash, embedding cosine."""

import pyspark.sql.functions as F
import pytest

from hinbox_spark.operators.dedup import (
    embedding_cosine_near_duplicates,
    exact_duplicates,
    minhash_near_duplicates,
    simhash_near_duplicates,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays a "
    "merry tune in the town square and people gather to watch the show "
    "under the evening sky with lanterns glowing softly over the crowd"
)
NEAR = BASE.replace("merry tune", "happy tune")  # one token differs
FAR = (
    "completely different subject matter entirely about quantum physics "
    "and the behaviour of particles in superconducting materials at very "
    "low temperatures measured carefully by experimental apparatus"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE), (1, BASE),          # exact duplicates
        (2, NEAR),                      # near duplicate of 0/1
        (3, FAR), (4, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    out = exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["keeper_doc_id"] == 0


def test_minhash_finds_near_dup(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_near_duplicates(docs, jaccard_threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0   # exact pair
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5   # near pair
    assert all(3 not in p and 4 not in p for p in pairs)  # far/short excluded


def test_simhash_finds_near_dup(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_duplicates(docs, max_hamming=8).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 8
    assert (0, 3) not in pairs


def test_embedding_near_dups(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),    # orthogonal
        (3, [0.0, 0.0, 0.0, 0.0]),    # zero vector must not divide by zero
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r["vec_a"], r["vec_b"]) for r in
           embedding_cosine_near_duplicates(emb, threshold=0.95).collect()}
    assert out == {(0, 1)}


def test_minhash_truncation_counted(spark):
    """Hot-bucket drops are counted via stats_out — never silent. 300
    copies of one text put every band bucket over BUCKET_CAP=200."""
    rows = [(i, BASE) for i in range(300)] + [(1000, FAR)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {}
    out = minhash_near_duplicates(df, jaccard_threshold=0.5, stats_out=stats)
    n_pairs = out.count()
    assert stats["dropped_buckets"] > 0
    assert stats["dropped_entries"] >= 300
    # hot buckets dropped → bounded pair count (not 300*299/2 ≈ 45k)
    assert n_pairs < 1000


def test_minhash_results_unchanged_by_text_rejoin(docs):
    """The id-only band shuffle + text re-join must produce the same pairs
    as before: (0,1) exact, (0,2)/(1,2) near."""
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_near_duplicates(docs, jaccard_threshold=0.5).collect()
    }
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (0, 2) in got and (1, 2) in got


def test_bucket_cap_is_broadcast_antijoin_not_window(spark):
    """Degenerate corpus: thousands of identical texts → identical MinHash
    signatures → every band bucket is a mega-bucket. The cap must drop them
    WITHOUT funneling the bucket into one task: the plan contains no Window
    operator (the cap is a groupBy count + broadcast anti-join), the
    mega-buckets are dropped entirely, and the truncation is counted."""
    rows = [
        (i, "the exact same boilerplate disclaimer text repeated on every page")
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {}
    out = minhash_near_duplicates(df, stats_out=stats)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, "bucket cap must not use a window"
    assert stats["dropped_buckets"] > 0
    assert stats["dropped_entries"] >= 5000
    assert out.count() == 0  # every bucket was degenerate → all dropped


def test_simhash_bucket_cap_degenerate_corpus(spark):
    """50k-style boilerplate corpus (near-identical 64-bit signatures): the
    SimHash chunk buckets must be capped the same way as MinHash — groupBy
    count + broadcast anti-join (no Window), mega-buckets dropped entirely,
    truncation counted. Uncapped this self-join is quadratic (the r3
    verdict's one remaining scale-killer)."""
    rows = [
        (i, "the exact same boilerplate disclaimer text repeated on every page")
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {}
    out = simhash_near_duplicates(df, stats_out=stats)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, "bucket cap must not use a window"
    # every doc has the identical signature → all 4 chunk buckets are
    # mega-buckets, all entries dropped, zero pairs materialize
    assert stats["dropped_buckets"] == 4
    assert stats["dropped_entries"] == 4 * 5000
    assert out.count() == 0


def test_simhash_results_unchanged_by_cap(docs):
    """On a normal corpus (buckets far below cap) the capped path returns
    the same pairs as before the cap was added."""
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_duplicates(docs, max_hamming=8).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 8
    assert (0, 3) not in pairs


def test_doc_dedup_keepers_match_union_find(spark):
    """The keeper-selection composition (MinHash pairs → connected
    components → min-doc_id keeper) must agree with an independent
    union-find over the SAME pair set: same clusters, same keepers,
    same member counts."""
    from hinbox_spark.operators.dedup import minhash_near_duplicates
    from hinbox_spark.plans.queries import q_doc_dedup_keepers

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_duplicates(docs, jaccard_threshold=0.7).collect()
    ]
    assert pairs, "fixture must contain near-duplicates"

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comps: dict = {}
    for n in list(parent):
        comps.setdefault(find(n), []).append(n)
    expected = {
        min(members): (len(members), len(members) - 1)
        for members in comps.values()
    }

    got = {
        r["keeper_doc_id"]: (r["n_docs"], r["n_removed"])
        for r in q_doc_dedup_keepers(spark, sf).collect()
    }
    assert got == expected
    # the component label itself must be the numeric-min doc id (zero-pad
    # invariant), i.e. cluster_id == keeper everywhere
    for r in q_doc_dedup_keepers(spark, sf).collect():
        assert r["cluster_id"] == r["keeper_doc_id"]
