"""ANN: LSH-bucketed top-k recall vs brute-force baseline."""

import numpy as np
import pytest

from hinbox_spark.operators.ann import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    # 10 well-separated cluster centers + 20 points around each
    centers = rng.standard_normal((10, 64)).astype(np.float32) * 5
    rows = []
    vid = 0
    for c in centers:
        for _ in range(20):
            v = c + rng.standard_normal(64).astype(np.float32) * 0.3
            rows.append((vid, v.tolist()))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_recall_vs_brute(spark, vectors):
    queries = vectors.limit(5).selectExpr(
        "vec_id as query_id", "embedding as qvec"
    )
    brute = brute_force_topk(vectors, queries, k=10).collect()
    approx = lsh_topk(vectors, queries, k=10, n_planes=16, dim=64).collect()

    b = {}
    for r in brute:
        b.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    a = {}
    for r in approx:
        a.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    recalls = [len(b[q] & a.get(q, set())) / len(b[q]) for q in b]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_brute_force_identical_vector_rank1(spark, vectors):
    # duplicate vector 0 under a new id: it must be the top neighbor
    dup = vectors.limit(1).selectExpr("9999 as vec_id", "embedding")
    all_vecs = vectors.unionByName(dup)
    queries = vectors.limit(1).selectExpr("vec_id as query_id", "embedding as qvec")
    top = brute_force_topk(all_vecs, queries, k=1).collect()[0]
    assert top["neighbor_id"] == 9999 and abs(top["cos_sim"] - 1.0) < 1e-6
