"""Approximate nearest-neighbor search over an embedding column.

Four paths (SURVEY training-data ops), one per scale lever:
- `brute_force_topk`: exact cosine top-k via broadcast of the query set —
  the correctness baseline (oracle-checked in plans/queries.py knn_top5).
- `lsh_topk`: random-hyperplane LSH — signatures are JVM-free numpy in a
  pandas UDF, bucketing + multiprobe (flip one bit) keeps recall high while
  candidate generation scales with bucket sizes instead of N×Q.
- `ivf_topk`: cell partitioning — a coarse k-means quantizer; each query
  probes n_probe/n_centroids of the corpus.
- `pq_topk`: product-quantization compression — the corpus scan reads
  m-byte codes instead of float vectors (asymmetric-distance lookup
  tables), with exact re-rank on the ADC survivors. This is the memory
  lever: at 10¹² vectors the code table is ~2 orders of magnitude smaller
  than the float32 corpus.

Hyperplanes and k-means seeds are derived deterministically (fixed seed /
xxhash64 ordering) so results are reproducible across runs and executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

LSH_SEED = 0x5EED


def _hyperplanes(n_planes: int, dim: int) -> np.ndarray:
    rng = np.random.RandomState(LSH_SEED)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)



def _cosine_rerank(cand, k: int):
    """Exact-cosine top-k tail shared by every ANN path. `cand` carries
    (query_id, neighbor_id, qvec, embedding). Zero-norm vectors are
    excluded — a zero vector's cosine is NaN, and Spark sorts NaN above
    all doubles DESC, so it would rank as everyone's top-1 neighbor.
    Ties break on neighbor_id; cos rounds to 6 so the value is
    hash-stable across engines. ONE owner: the guard, precision, and
    tie-break are the shared contract of brute/LSH/IVF/PQ/IVFPQ."""
    dot = F.expr(
        "aggregate(zip_with(qvec, embedding, (a, b) ->"
        " CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )
    nq = F.expr(
        "sqrt(aggregate(qvec, 0.0D, (acc,x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))"
    )
    nc = F.expr(
        "sqrt(aggregate(embedding, 0.0D,"
        " (acc,x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        cand.filter((nq > 0) & (nc > 0))
        .withColumn("cos", dot / (nq * nc))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id",
            F.round("cos", 6).alias("cos_sim"),
        )
    )


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × all vectors, JVM-side dot,
    window top-k with deterministic tie-break.

    queries: (query_id, qvec array<float>). Returns
    (query_id, rank, neighbor_id, cos_sim)."""
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    nq = F.expr(
        "sqrt(aggregate(qvec, 0.0D, (acc,x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))"
    )
    nc = F.expr(
        "sqrt(aggregate(embedding, 0.0D, (acc,x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))"
    )
    # zero-norm prefilters shrink the cross join; _cosine_rerank re-checks
    # them as part of the shared guard
    return _cosine_rerank(
        F.broadcast(queries.filter(nq > 0))
        .crossJoin(cand.filter(nc > 0))
        .filter(F.col("query_id") != F.col("neighbor_id")),
        k,
    )


def lsh_signatures(
    emb: DataFrame, n_planes: int = 16, dim: int = 64,
    vec_col: str = "embedding", out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane signature: bucket = sign-bit pattern of `n_planes`
    fixed hyperplane projections (an int)."""
    planes = _hyperplanes(n_planes, dim)

    @F.pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float32)
        proj = mat @ planes.T  # (batch, n_planes)
        bits = (proj > 0).astype(np.int64)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(bits @ weights)

    return emb.withColumn(out_col, _sig(F.col(vec_col)))


def lsh_bucketed_neighbors(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 12,
    n_tables: int = 6,
    dim: int = 64,
    bucket_cap: int = 2000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stats_out: dict | None = None,
) -> DataFrame:
    """Embedding near-dup THRESHOLD-PAIRS at scale — the LSH-bucketed
    replacement for `dedup.embedding_cosine_near_duplicates`'s all-pairs
    crossJoin (which stays as the oracle baseline).

    Multi-table random-hyperplane LSH: `n_tables` independent sets of
    `n_planes` hyperplanes; two vectors become candidates when their sign
    signatures agree in ANY table. For cosine s, per-plane agreement is
    p = 1 − arccos(s)/π, per-table pⁿ, recall = 1 − (1 − pⁿ)ᵀ — size
    (n_planes, n_tables) to the target threshold (defaults: ~0.86 recall
    at s = 0.9; for a 0.45 threshold use n_planes=4, n_tables=12).

    Scale shape: only (id, table, signature) rides the explode/shuffle —
    vectors are re-joined by id for the exact-cosine verify on surviving
    candidates. Buckets over `bucket_cap` are dropped (counted via
    `stats_out`, never silent). Returns (vec_a, vec_b, cos_sim) with
    cos_sim ≥ threshold — a subset of the brute-force result with the
    recall above, exact values on every emitted pair.
    """
    planes = _hyperplanes(n_planes * n_tables, dim)

    @F.pandas_udf("array<long>")
    def _table_sigs(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float32)
        proj = mat @ planes.T  # (batch, n_tables*n_planes)
        bits = (proj > 0).astype(np.int64).reshape(len(mat), n_tables, n_planes)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        return pd.Series((bits @ weights).tolist())

    norm = F.expr(
        f"sqrt(aggregate({vec_col}, 0.0D,"
        " (acc,x) -> acc + CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))"
    )
    vecs = emb.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), norm.alias("_n")
    ).filter(F.col("_n") > 0)

    # id-only bucket entries through the ×n_tables explode
    entries = (
        vecs.withColumn("sigs", _table_sigs(F.col("_v")))
        .select("_id", F.posexplode("sigs").alias("tbl", "sig"))
    )
    from hinbox_spark.operators.dedup import capped_bucket_entries

    # bucket cap via broadcast anti-join (not a window): a degenerate
    # mega-bucket is dropped in place, never funneled into one task
    kept = capped_bucket_entries(
        entries, ["tbl", "sig"], bucket_cap, stats_out=stats_out
    )

    a, b = kept.alias("a"), kept.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("vec_a"), F.col("b._id").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )

    # vector re-join for the exact verify only
    cand = cand.join(
        vecs.select(F.col("_id").alias("vec_a"), F.col("_v").alias("ea"),
                    F.col("_n").alias("na")),
        "vec_a",
    ).join(
        vecs.select(F.col("_id").alias("vec_b"), F.col("_v").alias("eb"),
                    F.col("_n").alias("nb")),
        "vec_b",
    )
    # strict-left-fold dot, vectorized across the pair batch — BIT-
    # IDENTICAL to the previous interpreted aggregate(zip_with(...))
    # expression (see functions.embeddings.dot_seq_udf; exact-equality
    # pinned in tests) but ~1 s/million pairs faster at 32 cores: the
    # higher-order expression gets no codegen (guide §4.2)
    from hinbox_spark.functions.embeddings import dot_seq_udf

    dot = dot_seq_udf()(F.col("ea"), F.col("eb"))
    return (
        cand.withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos_sim"))
    )


def ivf_fit_centroids(
    emb: DataFrame,
    n_centroids: int = 64,
    iters: int = 3,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: k-means with hash-ordered seeds.

    Init = the n_centroids vectors with the smallest xxhash64(id)
    (orderBy+limit compiles to TakeOrdered — an O(N) scan with a k-heap,
    no global sort). Each Lloyd round is ONE mapInPandas pass emitting
    per-Arrow-batch sufficient statistics (per cell: float64 sum vector +
    count); the driver collects ONLY those partials (rows ∝ #batches,
    never vectors) and folds them in sorted (batch, cell) order — the
    pq_fit_codebooks discipline, for the same two reasons: a skewed cell
    never funnels its whole population into one task's pandas frame, and
    the fixed fold order makes the float accumulation reproducible
    regardless of task scheduling. State moved per round is centroids +
    per-batch partials only.
    """
    seed_rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_centroids)
        .collect()
    )
    centroids = np.array([r[vec_col] for r in seed_rows], dtype=np.float32)
    # a corpus smaller than n_centroids seeds fewer cells — size the fold
    # arrays from the actual seed count, not the requested one
    n_centroids = centroids.shape[0]
    dim = centroids.shape[1]

    out_schema = "batch_key string, cell int, s array<double>, n long"
    for _ in range(iters):
        cent = centroids  # closure snapshot for this round

        def _partials(batches):
            for pdf in batches:
                mat = np.array(pdf["__v"].tolist(), dtype=np.float32)
                d2 = (
                    (mat * mat).sum(1)[:, None]
                    - 2.0 * (mat @ cent.T)
                    + (cent * cent).sum(1)[None, :]
                )
                cell = d2.argmin(axis=1)
                # stable batch key: smallest id in the batch (ids are
                # unique → keys distinct and scheduling-independent)
                key = str(pdf["__id"].min())
                rows = []
                for c in np.unique(cell):
                    sel = mat[cell == c].astype(np.float64)
                    rows.append(
                        (key, int(c), sel.sum(axis=0).tolist(),
                         int(sel.shape[0]))
                    )
                yield pd.DataFrame(
                    rows, columns=["batch_key", "cell", "s", "n"]
                )

        partials = (
            emb.select(
                F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
            )
            .mapInPandas(_partials, out_schema)
            .collect()
        )
        sums = np.zeros((n_centroids, dim), dtype=np.float64)
        counts = np.zeros(n_centroids, dtype=np.int64)
        for r in sorted(partials, key=lambda r: (r["batch_key"], r["cell"])):
            sums[r["cell"]] += np.array(r["s"])
            counts[r["cell"]] += r["n"]
        new = centroids.copy()  # empty cells keep their previous centroid
        nz = counts > 0
        new[nz] = (sums[nz] / counts[nz][:, None]).astype(np.float32)
        centroids = new
    return centroids


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 8,
    iters: int = 3,
    dim: int = 64,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k — the cell-partitioned scale path
    beside `lsh_topk`: fit a coarse quantizer, assign every vector to its
    nearest centroid cell, probe each query's n_probe nearest cells, exact
    cosine re-rank on the probed candidates only.

    Candidate generation scales with n_probe/n_centroids of the corpus per
    query instead of N×Q; the centroid table (n_centroids × dim) is the
    only broadcast state. Returns (query_id, rank, neighbor_id, cos_sim) —
    same contract as brute_force_topk/lsh_topk, zero-norm vectors excluded.
    """
    centroids = ivf_fit_centroids(emb, n_centroids, iters, dim)

    @F.pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float32)
        d2 = (
            (mat * mat).sum(1)[:, None]
            - 2.0 * (mat @ centroids.T)
            + (centroids * centroids).sum(1)[None, :]
        )
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    cand = emb.select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    ).withColumn("cell", _assign(F.col("embedding")))

    @F.pandas_udf("array<int>")
    def _probe(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float32)
        d2 = (
            (mat * mat).sum(1)[:, None]
            - 2.0 * (mat @ centroids.T)
            + (centroids * centroids).sum(1)[None, :]
        )
        order = np.argsort(d2, axis=1)[:, :n_probe].astype("int32")
        return pd.Series(order.tolist())

    probes = queries.select(
        "query_id", "qvec", F.explode(_probe(F.col("qvec"))).alias("cell")
    )

    joined = F.broadcast(probes).join(cand, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return _cosine_rerank(joined, k)


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    dim: int = 64,
    multiprobe_bits: int = 4,
) -> DataFrame:
    """ANN top-k: candidates share the query's LSH bucket or any one-bit
    flip of its first `multiprobe_bits` bits (multiprobe raises recall
    without widening buckets). Exact cosine re-rank on candidates only."""
    cand = lsh_signatures(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        n_planes, dim,
    )
    q = lsh_signatures(
        queries.select("query_id", F.col("qvec").alias("embedding")),
        n_planes, dim,
    ).withColumnRenamed("embedding", "qvec")

    probes = q.select(
        "query_id",
        "qvec",
        F.explode(
            F.expr(
                f"array_union(array(bucket), transform(sequence(0, {multiprobe_bits - 1}),"
                f" b -> CAST(bucket ^ shiftleft(1, b) AS LONG)))"
            )
        ).alias("bucket"),
    )

    joined = probes.join(cand, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return _cosine_rerank(
        joined.dropDuplicates(["query_id", "neighbor_id"]), k
    )



def _py(x):
    """numpy scalar → native Python (ids may be int64 OR str/object)."""
    return x.item() if isinstance(x, np.generic) else x


def _id_types(emb, queries):
    """Spark DDL type names of (vec_id, query_id) so the PQ paths emit
    whatever id type the caller uses — the brute/LSH/IVF paths are
    id-type-generic and the PQ mapInPandas schemas must match."""
    return (
        emb.schema["vec_id"].dataType.simpleString(),
        queries.schema["query_id"].dataType.simpleString(),
    )


def pq_fit_codebooks(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 32,
    iters: int = 3,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    coarse: np.ndarray | None = None,
) -> np.ndarray:
    """Deterministic product-quantization codebooks: split the vector into
    `m` subspaces of dim/m floats, k-means each subspace with `ksub`
    centroids — the compression layer a 100-TB embedding store actually
    needs (an m=8/ksub=16 code is 4 BYTES per vector vs 256 for the raw
    float32s; the corpus scan for a query then reads codes, not vectors).

    Scale shape per Lloyd round: ONE pass over the data. A mapInPandas
    stage emits per-Arrow-batch sufficient statistics (per (subspace,
    code): float64 sum vector + count — an (m × ksub × dsub) array, a few
    KB); the driver collects ONLY these partials (rows ∝ #batches, never
    vectors), sorts them by (batch, subspace, code) and folds in that
    FIXED order so float accumulation is reproducible regardless of task
    scheduling. Init = the `ksub` vectors with the smallest
    xxhash64(id) (TakeOrdered k-heap — no global sort), each split into
    its m subvectors. Returns array shape (m, ksub, dim//m), float32.

    With `coarse` (an IVF centroid table, shape (n_centroids, dim)) the
    codebooks are fit on RESIDUALS — each vector minus its nearest coarse
    centroid — which is the FAISS IVFADC composition `ivfpq_topk` uses:
    residuals have far less variance than raw vectors, so the same m-byte
    budget quantizes them much more accurately.
    """
    dsub = dim // m
    assert m * dsub == dim, "dim must divide evenly into m subspaces"
    seed_rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(ksub)
        .collect()
    )
    seeds = np.array([r[vec_col] for r in seed_rows], dtype=np.float32)
    if coarse is not None:
        d2 = (
            (seeds * seeds).sum(1)[:, None]
            - 2.0 * (seeds @ coarse.T)
            + (coarse * coarse).sum(1)[None, :]
        )
        seeds = seeds - coarse[d2.argmin(axis=1)]
    books = np.stack(
        [seeds[:, j * dsub:(j + 1) * dsub] for j in range(m)]
    )  # (m, ksub, dsub)

    out_schema = (
        "batch_key string, sub int, code int, s array<double>, n long"
    )
    for _ in range(iters):
        bk = books  # closure snapshot for this round

        def _partials(batches):
            for pdf in batches:
                mat = np.array(pdf["__v"].tolist(), dtype=np.float32)
                if coarse is not None:
                    cd2 = (
                        (mat * mat).sum(1)[:, None]
                        - 2.0 * (mat @ coarse.T)
                        + (coarse * coarse).sum(1)[None, :]
                    )
                    mat = mat - coarse[cd2.argmin(axis=1)]
                # stable batch key: smallest id in the batch (ids are
                # unique, so keys are distinct and scheduling-independent)
                key = str(pdf["__id"].min())
                rows = []
                for j in range(m):
                    sub = mat[:, j * dsub:(j + 1) * dsub]
                    d2 = (
                        (sub * sub).sum(1)[:, None]
                        - 2.0 * (sub @ bk[j].T)
                        + (bk[j] * bk[j]).sum(1)[None, :]
                    )
                    code = d2.argmin(axis=1)
                    for c in np.unique(code):
                        sel = sub[code == c].astype(np.float64)
                        rows.append(
                            (key, j, int(c), sel.sum(axis=0).tolist(),
                             int(sel.shape[0]))
                        )
                yield pd.DataFrame(
                    rows, columns=["batch_key", "sub", "code", "s", "n"]
                )

        partials = (
            emb.select(
                F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
            )
            .mapInPandas(_partials, out_schema)
            .collect()
        )
        sums = np.zeros((m, ksub, dsub), dtype=np.float64)
        counts = np.zeros((m, ksub), dtype=np.int64)
        for r in sorted(
            partials, key=lambda r: (r["batch_key"], r["sub"], r["code"])
        ):
            sums[r["sub"], r["code"]] += np.array(r["s"])
            counts[r["sub"], r["code"]] += r["n"]
        new = books.copy()  # empty codes keep their previous centroid
        nz = counts > 0
        new[nz] = (sums[nz] / counts[nz][:, None]).astype(np.float32)
        books = new
    return books


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ksub: int = 32,
    iters: int = 3,
    dim: int = 64,
    refine: int = 16,
) -> DataFrame:
    """PQ-compressed ANN top-k with asymmetric distance (ADC) + exact
    re-rank — the third scale path beside `lsh_topk` (bucketing) and
    `ivf_topk` (cell partitioning): compress every corpus vector to an
    m-byte code, scan CODES (not vectors) against per-query lookup
    tables, keep k×refine ADC candidates, then join the true vectors
    back for exact cosine on that small survivor set.

    Scale shape: the corpus is scanned once by a mapInPandas stage that
    holds the (m × ksub) LUT per query (queries × codebooks are closure
    state, a few KB) and emits only its per-batch top-(k×refine) per
    query — a partial tournament, so the shuffle carries
    O(#batches × q × k·refine) rows, never the corpus. The exact re-rank
    joins `emb` on the surviving neighbor ids only. Approximation error
    from ADC is repaired by the re-rank for any true neighbor that
    survives the candidate cut; recall vs brute force is pinned in
    tests/test_ann.py. Returns (query_id, rank, neighbor_id, cos_sim) —
    the brute_force_topk/lsh_topk/ivf_topk contract, zero-norm vectors
    excluded."""
    dsub = dim // m
    books = pq_fit_codebooks(emb, m, ksub, iters, dim)
    id_t, qid_t = _id_types(emb, queries)
    qrows = queries.select("query_id", "qvec").collect()
    qids = np.array([r["query_id"] for r in qrows])
    qmat = np.array([r["qvec"] for r in qrows], dtype=np.float32)
    qnorm = np.sqrt((qmat * qmat).sum(1))
    # per-query LUT: lut[q][j, c] = dot(q_j, books[j][c]); approx corpus
    # norm per code from the codebook entries themselves
    lut = np.stack(
        [qmat[:, j * dsub:(j + 1) * dsub] @ books[j].T for j in range(m)],
        axis=1,
    )  # (Q, m, ksub)
    cnorm2 = (books * books).sum(axis=2)  # (m, ksub)
    keep = k * refine

    def _scan(batches):
        for pdf in batches:
            mat = np.array(pdf["__v"].tolist(), dtype=np.float32)
            ids = pdf["__id"].to_numpy()
            codes = np.empty((mat.shape[0], m), dtype=np.int64)
            for j in range(m):
                sub = mat[:, j * dsub:(j + 1) * dsub]
                d2 = (
                    (sub * sub).sum(1)[:, None]
                    - 2.0 * (sub @ books[j].T)
                    + (books[j] * books[j]).sum(1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            # ADC dot + approx norm from codes, all queries at once
            approx_n = np.sqrt(cnorm2[np.arange(m)[None, :], codes].sum(1))
            ok = approx_n > 0
            rows = []
            for qi in range(len(qids)):
                if qnorm[qi] == 0:
                    continue
                adc = lut[qi][np.arange(m)[None, :], codes].sum(1)
                score = np.where(
                    ok, adc / (qnorm[qi] * np.maximum(approx_n, 1e-30)), -2.0
                )
                score = np.where(ids == qids[qi], -2.0, score)
                top = np.argsort(-score)[:keep]
                for t in top:
                    if score[t] > -2.0:
                        rows.append((_py(qids[qi]), _py(ids[t]), float(score[t])))
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "adc"]
            )

    cand = (
        emb.select(F.col("vec_id").alias("__id"), F.col("embedding").alias("__v"))
        .mapInPandas(_scan, f"query_id {qid_t}, neighbor_id {id_t}, adc double")
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    survivors = (
        cand.withColumn("r", F.row_number().over(wk))
        .filter(F.col("r") <= keep)
        .select("query_id", "neighbor_id")
    )
    qdf = queries.select("query_id", "qvec")
    # survivors is O(queries × k·refine) — BROADCAST it so the exact
    # re-rank is a map-side hash join probing the (huge) corpus scan,
    # never a shuffle of the corpus on neighbor_id
    rer = (
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
        .join(F.broadcast(survivors), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
    )
    return _cosine_rerank(rer, k)


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 8,
    m: int = 8,
    ksub: int = 32,
    iters: int = 3,
    dim: int = 64,
    refine: int = 16,
) -> DataFrame:
    """IVF-PQ (FAISS IVFADC) ANN top-k — the composition of the two scale
    levers that actually ships at 10¹² vectors: an IVF coarse quantizer
    restricts each query's scan to n_probe/n_centroids of the corpus, and
    product-quantized RESIDUAL codes (vector − its cell centroid) make
    that scan read m bytes per vector instead of 4·dim. Candidates are
    scored by asymmetric distance computed entirely from lookup tables:

        dot(q, v) ≈ dot(q, c_cell) + Σⱼ dot(qⱼ, bookⱼ[codeⱼ])
        ‖v‖²      ≈ ‖c_cell‖² + 2 Σⱼ dot(c_cellⱼ, bookⱼ[codeⱼ])
                    + Σⱼ ‖bookⱼ[codeⱼ]‖²

    so the per-row work is m table lookups — no float vector is touched
    until the exact re-rank. All LUTs ((Q × n_centroids) query·centroid
    dots, (Q × m × ksub) residual dots, (n_centroids × m × ksub)
    centroid·book cross terms) are closure state of a single mapInPandas
    corpus scan that emits only its per-batch top-(k·refine) per query —
    the same partial-tournament shuffle bound as pq_topk — followed by
    the broadcast-survivor exact cosine re-rank. Residual coding beats
    raw-vector PQ at equal bytes because residual variance is a fraction
    of vector variance (recall pinned vs brute force in tests).

    Returns (query_id, rank, neighbor_id, cos_sim) — the shared ANN
    contract, zero-norm vectors excluded. Deterministic: fixed seeds,
    hash-ordered k-means init, scheduling-independent codebook folds."""
    dsub = dim // m
    centroids = ivf_fit_centroids(emb, n_centroids, iters, dim)
    # a corpus smaller than n_centroids yields fewer cells
    n_centroids = centroids.shape[0]
    n_probe = min(n_probe, n_centroids)
    books = pq_fit_codebooks(emb, m, ksub, iters, dim, coarse=centroids)
    id_t, qid_t = _id_types(emb, queries)
    qrows = queries.select("query_id", "qvec").collect()
    qids = np.array([r["query_id"] for r in qrows])
    qmat = np.array([r["qvec"] for r in qrows], dtype=np.float32)
    qnorm = np.sqrt((qmat * qmat).sum(1))
    # probe list per query: n_probe nearest centroids by L2
    qd2 = (
        (qmat * qmat).sum(1)[:, None]
        - 2.0 * (qmat @ centroids.T)
        + (centroids * centroids).sum(1)[None, :]
    )
    probes = np.argsort(qd2, axis=1)[:, :n_probe]  # (Q, n_probe)
    qc = qmat @ centroids.T  # (Q, n_centroids): dot(q, c_cell)
    lutr = np.stack(
        [qmat[:, j * dsub:(j + 1) * dsub] @ books[j].T for j in range(m)],
        axis=1,
    )  # (Q, m, ksub): dot(q_j, book_j[c])
    # centroid/code cross terms and code norms for the ‖v‖² estimate
    csub = centroids.reshape(n_centroids, m, dsub)
    cb = np.einsum("cjd,jkd->cjk", csub, books)  # (n_centroids, m, ksub)
    rnorm2 = (books * books).sum(axis=2)  # (m, ksub)
    cnorm2 = (centroids * centroids).sum(axis=1)  # (n_centroids,)
    keep = k * refine
    jj = np.arange(m)[None, :]

    def _scan(batches):
        for pdf in batches:
            mat = np.array(pdf["__v"].tolist(), dtype=np.float32)
            ids = pdf["__id"].to_numpy()
            d2 = (
                (mat * mat).sum(1)[:, None]
                - 2.0 * (mat @ centroids.T)
                + cnorm2[None, :]
            )
            cells = d2.argmin(axis=1)
            res = mat - centroids[cells]
            codes = np.empty((mat.shape[0], m), dtype=np.int64)
            for j in range(m):
                sub = res[:, j * dsub:(j + 1) * dsub]
                sd2 = (
                    (sub * sub).sum(1)[:, None]
                    - 2.0 * (sub @ books[j].T)
                    + rnorm2[j][None, :]
                )
                codes[:, j] = sd2.argmin(axis=1)
            # ‖v‖² estimate from cell + codes only (lookup arithmetic)
            approx_n2 = (
                cnorm2[cells]
                + 2.0 * cb[cells[:, None], jj, codes].sum(1)
                + rnorm2[jj, codes].sum(1)
            )
            approx_n = np.sqrt(np.maximum(approx_n2, 0.0))
            rows = []
            for qi in range(len(qids)):
                if qnorm[qi] == 0:
                    continue
                sel = np.isin(cells, probes[qi])  # IVF cell restriction
                sel &= ids != qids[qi]
                sel &= approx_n > 0
                idx = np.nonzero(sel)[0]
                if len(idx) == 0:
                    continue
                adc = qc[qi, cells[idx]] + lutr[qi][jj, codes[idx]].sum(1)
                score = adc / (qnorm[qi] * approx_n[idx])
                order = np.argsort(-score)[:keep]
                for t, s in zip(idx[order], score[order]):
                    rows.append((_py(qids[qi]), _py(ids[t]), float(s)))
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "adc"]
            )

    cand = (
        emb.select(F.col("vec_id").alias("__id"), F.col("embedding").alias("__v"))
        .mapInPandas(_scan, f"query_id {qid_t}, neighbor_id {id_t}, adc double")
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    survivors = (
        cand.withColumn("r", F.row_number().over(wk))
        .filter(F.col("r") <= keep)
        .select("query_id", "neighbor_id")
    )
    qdf = queries.select("query_id", "qvec")
    rer = (
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
        .join(F.broadcast(survivors), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
    )
    return _cosine_rerank(rer, k)
