"""Distributed knowledge-graph embedding training (TransE, Bordes et al.
2013) via data-parallel partition-local SGD with per-epoch model
averaging (parallel SGD à la Zinkevich et al. 2010) — the step that
turns the materialized (subj, pred, obj) store into trainable features
for link prediction / completion (the `kg_completion_eval` consumer).

Reference parity: the reference stops at similarity-based profile
merging (src/engine.py); embedding training is the natural downstream
the north rule's KG-construction pipeline feeds.

Design constraints, in order:

1. DETERMINISM. Everything is a pure function of the triple multiset:
   init vectors are md5-derived, the partition id is a content hash (NOT
   Spark's physical partitioning), triples are processed in sorted order
   inside each partition, negatives are hash-chosen, and cross-partition
   averaging folds in pid order. Identical results on local[1] and
   local[32] — pinned in tests against a sequential single-process run
   of the same per-partition kernel (the distributed-plumbing risk:
   grouping, averaging, ordering), plus a learning-signal assertion
   (post-training margin separation on held-in triples).

2. SCALE SHAPE. Each epoch is ONE applyInPandas over `parts` content-
   hash groups (Arrow-batched, no per-row Python) + ONE map-side-
   combinable average shuffle keyed by (kind, name). The epoch-start
   model rides a broadcast — the standard Spark data-parallel training
   shape (MLlib word2vec/ALS lineage). The driver holds one model copy
   between epochs: fine up to ~10⁷ entities × small dim; beyond that the
   production path is parameter-server / blockwise sharding
   (documented, out of scope here).

3. The SGD kernel is shared verbatim between the executor path and the
   test replica, so the pin isolates exactly the distributed parts.
"""

from __future__ import annotations

import hashlib
import struct as _struct

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _h64(s: str) -> int:
    """Stable 64-bit content hash (md5 prefix) — engine/PYTHONHASHSEED
    independent."""
    return _struct.unpack(
        ">Q", hashlib.md5(s.encode("utf-8")).digest()[:8]
    )[0]


def init_vec(name: str, dim: int) -> np.ndarray:
    """Deterministic TransE init: uniform(-6/√d, 6/√d) driven by md5 of
    (name, j) — reproducible anywhere, no RNG object."""
    lim = 6.0 / np.sqrt(dim)
    vals = [
        (_h64(f"{name}\x1f{j}") / float(1 << 64)) * 2.0 * lim - lim
        for j in range(dim)
    ]
    return np.asarray(vals, dtype=np.float64)


def sgd_partition(
    triples: list[tuple[str, str, str]],
    ent: dict[str, np.ndarray],
    rel: dict[str, np.ndarray],
    entities: list[str],
    lr: float,
    margin: float,
    epoch: int,
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """One partition-local TransE SGD sweep (L2 energy, margin ranking
    loss, hash-chosen tail corruption, post-step entity renorm to the
    unit ball). Mutates nothing: returns fresh dicts holding ONLY the
    vectors this partition touched. Shared verbatim by the executor path
    and the sequential test replica.

    Aliasing note (intentional, ADVICE r5): when the corrupted tail
    equals the head (neg == s) or the triple is a self-loop (s == o),
    hs/tp_/tn reference the SAME buffer and the in-place updates compound
    in statement order — a deliberate, documented deviation from the
    textbook independent-gradient update. It is deterministic, mirrored
    bit-for-bit by the sequential replica (the pin test covers it), and
    affects only the rare hash-collision corruption draws."""
    local_e: dict[str, np.ndarray] = {}
    local_r: dict[str, np.ndarray] = {}

    def ev(name: str) -> np.ndarray:
        if name not in local_e:
            local_e[name] = ent[name].copy()
        return local_e[name]

    def rv(name: str) -> np.ndarray:
        if name not in local_r:
            local_r[name] = rel[name].copy()
        return local_r[name]

    n_ent = len(entities)
    for s, p, o in sorted(triples):
        # hash-chosen corrupt tail, skipping the true tail
        idx = _h64(f"{s}\x1f{p}\x1f{o}\x1f{epoch}") % max(n_ent - 1, 1)
        neg = entities[idx if entities[idx] != o else (idx + 1) % n_ent]
        hs, rp, tp_, tn = ev(s), rv(p), ev(o), ev(neg)
        d_pos = hs + rp - tp_
        d_neg = hs + rp - tn
        loss = margin + float(d_pos @ d_pos) - float(d_neg @ d_neg)
        if loss <= 0.0:
            continue
        g_pos = 2.0 * d_pos
        g_neg = 2.0 * d_neg
        hs -= lr * (g_pos - g_neg)
        rp -= lr * (g_pos - g_neg)
        tp_ += lr * g_pos
        tn -= lr * g_neg
        for v in (hs, tp_, tn):
            n = float(np.sqrt(v @ v))
            if n > 1.0:
                v /= n
    return local_e, local_r


def transe_train(
    triples: DataFrame,
    dim: int = 16,
    epochs: int = 2,
    parts: int = 8,
    lr: float = 0.05,
    margin: float = 1.0,
    pre_distinct: bool = False,
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Train TransE over a (subj, pred, obj) DataFrame. Returns the
    (entity, relation) embedding dicts after `epochs` rounds of
    partition-local SGD + model averaging (touched vectors averaged in
    pid order; untouched vectors carried forward).

    Plan shape (r6 optimization, guide §1/§4): the pid-stamped triple set
    is eagerly localCheckpointed ONCE — the vocab collects, every epoch's
    SGD sweep, and any caller reuse all read the same materialized blocks
    instead of re-deriving the triple view per action (4 redundant scans
    before). The epoch-start model rides the broadcast as two dense
    float64 matrices + name lists (one pickle of 2 buffers, not ~|V|
    small ndarray pickles); the per-epoch averaging is a JVM
    collect_list(struct(pid, vec)) + sort_array fold with ONE vectorized
    pandas_udf computing the pid-ordered np.mean — replacing the
    per-(kind,name) applyInPandas whose ~|V| tiny pandas groups were
    ~6 s/epoch of pure group-construction overhead at sf0.1 (measured;
    the SGD kernel itself is ~0.1 s/partition). The mean is the same
    np.mean over the same pid-sorted stack, so results stay bit-identical
    to the sequential replica. Pass pre_distinct=True when the input is
    already a distinct triple set to skip the dedup shuffle."""
    spark = triples.sparkSession
    t = triples.select("subj", "pred", "obj")
    if not pre_distinct:
        t = t.distinct()

    pid = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", "subj", "pred", "obj")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % parts
    )
    tp = t.withColumn("pid", pid).localCheckpoint(eager=True)
    ents = sorted(
        r["e"]
        for r in tp.select(F.col("subj").alias("e"))
        .union(tp.select(F.col("obj").alias("e")))
        .distinct()
        .collect()
    )
    rels = sorted(r["pred"] for r in tp.select("pred").distinct().collect())
    ent = {e: init_vec("e:" + e, dim) for e in ents}
    rel = {r: init_vec("r:" + r, dim) for r in rels}

    @F.pandas_udf("array<double>")
    def pid_mean(pv):
        import pandas as pd

        # rows arrive sorted by pid (sort_array over struct(pid, vec));
        # np.mean over the same pid-ordered stack as the sequential
        # replica — bit-identical averaging
        return pd.Series(
            [
                np.mean(
                    np.stack([np.asarray(r["vec"]) for r in rows]), axis=0
                ).tolist()
                for rows in pv
            ]
        )

    sc = spark.sparkContext
    for epoch in range(epochs):
        E = np.stack([ent[e] for e in ents]) if ents else np.zeros((0, dim))
        R = np.stack([rel[r] for r in rels]) if rels else np.zeros((0, dim))
        bc = sc.broadcast((ents, rels, E, R))

        def run_group(pdf):
            import pandas as pd

            ents_g, rels_g, E_g, R_g = bc.value
            ent_g = dict(zip(ents_g, E_g))
            rel_g = dict(zip(rels_g, R_g))
            trip = list(
                zip(pdf["subj"], pdf["pred"], pdf["obj"], strict=True)
            )
            le, lr_ = sgd_partition(
                trip, ent_g, rel_g, ents_g, lr, margin, epoch
            )
            g = int(pdf["pid"].iloc[0])
            rows = [
                ("e", k, g, v.tolist()) for k, v in sorted(le.items())
            ] + [("r", k, g, v.tolist()) for k, v in sorted(lr_.items())]
            return pd.DataFrame(
                rows, columns=["kind", "name", "pid", "vec"]
            )

        # explicit pid repartition: AQE size-based coalescing would fold
        # the (byte-tiny, CPU-heavy) SGD groups into one task; a
        # user-specified repartition is exempt from coalescing and already
        # satisfies applyInPandas' clustering, so no extra exchange
        out = tp.repartition(parts, "pid").groupBy("pid").applyInPandas(
            run_group,
            "kind string, name string, pid long, vec array<double>",
        )

        averaged = (
            out.groupBy("kind", "name")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("pid", "vec"))
                ).alias("pv")
            )
            .select("kind", "name", pid_mean("pv").alias("vec"))
        )
        for r in averaged.collect():
            tgt = ent if r["kind"] == "e" else rel
            tgt[r["name"]] = np.asarray(r["vec"], dtype=np.float64)
        bc.unpersist()
    return ent, rel


def transe_train_sequential(
    triples: list[tuple[str, str, str]],
    dim: int = 16,
    epochs: int = 2,
    parts: int = 8,
    lr: float = 0.05,
    margin: float = 1.0,
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Single-process replica of transe_train: same content-hash
    partitioning, same kernel, same pid-ordered averaging — no Spark.
    The test pin: distributed == sequential."""
    t = sorted(set(triples))
    ents = sorted({s for s, _, _ in t} | {o for _, _, o in t})
    rels = sorted({p for _, p, _ in t})
    ent = {e: init_vec("e:" + e, dim) for e in ents}
    rel = {r: init_vec("r:" + r, dim) for r in rels}
    by_pid: dict[int, list] = {}
    for s, p, o in t:
        h = int(
            hashlib.md5(f"{s}\x1f{p}\x1f{o}".encode()).hexdigest()[:8], 16
        )
        by_pid.setdefault(h % parts, []).append((s, p, o))
    for epoch in range(epochs):
        acc_e: dict[str, list] = {}
        acc_r: dict[str, list] = {}
        for g in sorted(by_pid):
            le, lr_ = sgd_partition(
                by_pid[g], ent, rel, ents, lr, margin, epoch
            )
            for k, v in le.items():
                acc_e.setdefault(k, []).append(v)
            for k, v in lr_.items():
                acc_r.setdefault(k, []).append(v)
        for k, vs in acc_e.items():
            ent[k] = np.mean(np.stack(vs), axis=0)
        for k, vs in acc_r.items():
            rel[k] = np.mean(np.stack(vs), axis=0)
    return ent, rel
