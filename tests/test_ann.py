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


def test_lsh_bucketed_neighbors_recall_and_exactness(spark, vectors):
    """Threshold-pair scale path: every emitted pair must carry the exact
    brute-force cosine, be above the threshold, and cover ≥0.8 of the
    brute-force pair set."""
    from hinbox_spark.operators.dedup import embedding_cosine_near_duplicates
    from hinbox_spark.operators.ann import lsh_bucketed_neighbors

    emb = vectors
    brute = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in embedding_cosine_near_duplicates(emb, threshold=0.9).collect()
    }
    assert len(brute) > 50  # clustered fixture has plenty of near-dups

    stats = {}
    approx = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in lsh_bucketed_neighbors(
            emb, threshold=0.9, n_planes=12, n_tables=6, dim=64,
            stats_out=stats,
        ).collect()
    }
    # subset with exact values
    for pair, cos in approx.items():
        assert pair in brute
        assert abs(cos - brute[pair]) < 1e-9
    recall = len(set(approx) & set(brute)) / len(brute)
    assert recall >= 0.8, recall
    assert stats["dropped_buckets"] == 0


def test_lsh_bucketed_neighbors_bucket_cap_counted(spark, vectors):
    """With a tiny bucket cap the hot buckets are dropped AND counted —
    truncation is never silent."""
    from hinbox_spark.operators.ann import lsh_bucketed_neighbors

    stats = {}
    out = lsh_bucketed_neighbors(
        vectors, threshold=0.9, n_planes=2, n_tables=2, dim=64,
        bucket_cap=5, stats_out=stats,
    )
    out.count()
    assert stats["dropped_buckets"] > 0
    assert stats["dropped_entries"] > 5


def test_zero_norm_vectors_never_rank(spark, vectors):
    """A zero vector (empty-text embedding) must not appear in any top-k."""
    zero = spark.createDataFrame(
        [(8888, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    all_vecs = vectors.unionByName(zero)
    queries = vectors.limit(2).selectExpr("vec_id as query_id", "embedding as qvec")
    for fn in (brute_force_topk, lsh_topk):
        neigh = {r["neighbor_id"] for r in fn(all_vecs, queries, k=10).collect()}
        assert 8888 not in neigh


def test_ivf_recall_vs_brute(spark, vectors):
    """IVF cell-probe path: ≥0.8 recall vs brute force on the clustered
    fixture, exact cosine values on every emitted row."""
    from hinbox_spark.operators.ann import ivf_topk

    queries = vectors.limit(5).selectExpr(
        "vec_id as query_id", "embedding as qvec"
    )
    brute = {}
    for r in brute_force_topk(vectors, queries, k=10).collect():
        brute.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cos_sim"]

    approx = {}
    for r in ivf_topk(
        vectors, queries, k=10, n_centroids=16, n_probe=4, iters=2
    ).collect():
        approx.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cos_sim"]

    recalls = []
    for q, b in brute.items():
        a = approx.get(q, {})
        recalls.append(len(set(b) & set(a)) / len(b))
        for n, cos in a.items():
            if n in b:
                assert abs(cos - b[n]) < 1e-9
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_centroids_deterministic(spark, vectors):
    """Hash-seeded init + fixed iteration count ⇒ identical centroids on
    re-fit (resume/retry safety)."""
    import numpy as np

    from hinbox_spark.operators.ann import ivf_fit_centroids

    c1 = ivf_fit_centroids(vectors, n_centroids=8, iters=2)
    c2 = ivf_fit_centroids(vectors, n_centroids=8, iters=2)
    assert np.array_equal(c1, c2)


def test_pq_recall_vs_brute(spark, vectors):
    """PQ+ADC path: ≥0.8 recall vs brute force on the clustered fixture;
    every emitted cos_sim is the EXACT value (re-rank repairs ADC error),
    and the output contract matches the other paths."""
    from hinbox_spark.operators.ann import pq_topk

    queries = vectors.limit(5).selectExpr(
        "vec_id as query_id", "embedding as qvec"
    )
    brute = {}
    for r in brute_force_topk(vectors, queries, k=10).collect():
        brute.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cos_sim"]

    approx = {}
    for r in pq_topk(vectors, queries, k=10, m=8, ksub=32, iters=3).collect():
        approx.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cos_sim"]

    recalls = []
    for q, b in brute.items():
        a = approx.get(q, {})
        recalls.append(len(set(b) & set(a)) / len(b))
        for n, cos in a.items():
            if n in b:
                assert abs(cos - b[n]) < 1e-9  # exact re-rank values
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_pq_codebooks_deterministic_and_shaped(spark, vectors):
    """Hash-seeded init + fixed-order partial folding ⇒ identical codebooks
    on re-fit; shape is (m, ksub, dim//m) — the compression contract
    (m single-byte codes per vector)."""
    from hinbox_spark.operators.ann import pq_fit_codebooks

    b1 = pq_fit_codebooks(vectors, m=8, ksub=16, iters=2)
    b2 = pq_fit_codebooks(vectors, m=8, ksub=16, iters=2)
    assert b1.shape == (8, 16, 8)
    assert np.array_equal(b1, b2)


def test_pq_excludes_self_and_zero_norm(spark):
    """A zero vector must neither be a neighbor nor poison scores; a query
    never returns itself."""
    from hinbox_spark.operators.ann import pq_topk

    rng = np.random.RandomState(3)
    rows = [(i, (rng.standard_normal(64) * 2).astype(np.float32).tolist())
            for i in range(40)]
    rows.append((40, [0.0] * 64))  # zero-norm vector
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = vecs.filter("vec_id in (0, 40)").selectExpr(
        "vec_id as query_id", "embedding as qvec"
    )
    out = pq_topk(vecs, queries, k=5, m=8, ksub=8, iters=1).collect()
    assert all(r["neighbor_id"] != r["query_id"] for r in out)
    assert all(r["neighbor_id"] != 40 for r in out)
    assert all(r["query_id"] != 40 for r in out)  # zero-norm query dropped


def test_ivfpq_recall_vs_brute_and_residual_advantage(spark, vectors):
    """IVF-PQ composed path: ≥0.8 recall vs brute force on the clustered
    fixture with only 4/16 cells probed, exact cosine values on every
    emitted row (the re-rank repairs ADC error), and the shared output
    contract. Also pins that residual codebooks differ from raw-vector
    codebooks (the coarse subtraction actually happened)."""
    from hinbox_spark.operators.ann import (
        ivf_fit_centroids,
        ivfpq_topk,
        pq_fit_codebooks,
    )

    queries = vectors.limit(5).selectExpr(
        "vec_id as query_id", "embedding as qvec"
    )
    brute = {}
    for r in brute_force_topk(vectors, queries, k=10).collect():
        brute.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cos_sim"]

    approx = {}
    for r in ivfpq_topk(
        vectors, queries, k=10, n_centroids=16, n_probe=4, m=8, ksub=32,
        iters=2, refine=16,
    ).collect():
        approx.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cos_sim"]

    recalls = []
    for q, b in brute.items():
        a = approx.get(q, {})
        recalls.append(len(set(b) & set(a)) / len(b))
        for n, cos in a.items():
            if n in b:
                assert abs(cos - b[n]) < 1e-9  # exact re-rank values
    assert sum(recalls) / len(recalls) >= 0.8, recalls

    cents = ivf_fit_centroids(vectors, n_centroids=16, iters=2)
    raw = pq_fit_codebooks(vectors, m=8, ksub=16, iters=2)
    res = pq_fit_codebooks(vectors, m=8, ksub=16, iters=2, coarse=cents)
    assert raw.shape == res.shape == (8, 16, 8)
    assert not np.array_equal(raw, res)
    # residual codebooks are re-fit deterministic too
    res2 = pq_fit_codebooks(vectors, m=8, ksub=16, iters=2, coarse=cents)
    assert np.array_equal(res, res2)


def test_pq_paths_accept_string_ids(spark):
    """The PQ scan schemas derive from the caller's id types — string-id
    corpora must work on pq_topk/ivfpq_topk exactly like they do on the
    brute/LSH/IVF paths (the mapInPandas schema used to hard-code long)."""
    import numpy as np

    from hinbox_spark.operators.ann import ivfpq_topk, pq_topk

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((60, 16)).astype("float32")
    rows = [(f"v{i}", vecs[i].tolist()) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    queries = spark.createDataFrame(
        [(f"v{i}", vecs[i].tolist()) for i in range(3)],
        "query_id string, qvec array<float>",
    )
    for fn in (pq_topk, ivfpq_topk):
        out = fn(emb, queries, k=5, m=4, ksub=8, iters=2, dim=16).collect()
        assert out, fn.__name__
        ids = {r["neighbor_id"] for r in out}
        assert all(isinstance(i, str) and i.startswith("v") for i in ids)
        assert all(r["query_id"].startswith("v") for r in out)


def test_dot_seq_udf_bit_identical_to_aggregate_fold(spark):
    """dot_seq_udf must reproduce the interpreted
    aggregate(zip_with(...)) strict left fold BIT-FOR-BIT (== on doubles,
    no tolerance): the LSH verify stage and the brute-kNN family rank and
    threshold on these values, so any last-ulp drift could flip a
    rounding/ordering boundary. Random float32 vectors exercise the
    float32→float64 cast path; a null row pins NULL-propagation parity."""
    import numpy as np
    import pyspark.sql.functions as F

    from hinbox_spark.functions.embeddings import dot_seq_udf

    rng = np.random.RandomState(11)
    rows = [
        (i, rng.standard_normal(33).astype("float32").tolist(),
         rng.standard_normal(33).astype("float32").tolist())
        for i in range(500)
    ]
    rows.append((500, None, rng.standard_normal(33).astype("float32").tolist()))
    df = spark.createDataFrame(
        rows, "id long, ea array<float>, eb array<float>"
    )
    ref = F.expr(
        "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE)"
        "*CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )
    got = (
        df.select("id", ref.alias("want"), dot_seq_udf()(F.col("ea"), F.col("eb")).alias("have"))
        .collect()
    )
    assert len(got) == 501
    for r in got:
        if r["want"] is None:
            assert r["have"] is None or r["have"] != r["have"]  # NULL/NaN
        else:
            assert r["have"] == r["want"], (r["id"], r["have"], r["want"])
