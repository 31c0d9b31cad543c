"""TransE distributed training: the distributed run must equal the
sequential replica bit-for-bit (partitioning, averaging, ordering are
the risk — the SGD kernel is shared), must be invariant to Spark
parallelism, and must actually LEARN (margin separation on the train
set)."""

import numpy as np
import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _toy_triples():
    # two "nations", customers in each, plus a functional-ish predicate
    rows = []
    for i in range(12):
        nat = "N_A" if i % 2 == 0 else "N_B"
        rows.append((f"cust/{i}", "in_nation", nat))
        rows.append((f"cust/{i}", "in_segment", f"SEG{i % 3}"))
    rows.append(("supp/0", "in_nation", "N_A"))
    rows.append(("supp/1", "in_nation", "N_B"))
    return rows


def test_distributed_equals_sequential(spark):
    from hinbox_spark.operators.kge import (
        transe_train, transe_train_sequential,
    )

    rows = _toy_triples()
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    ent_d, rel_d = transe_train(df, dim=8, epochs=2, parts=4)
    ent_s, rel_s = transe_train_sequential(rows, dim=8, epochs=2, parts=4)
    assert set(ent_d) == set(ent_s) and set(rel_d) == set(rel_s)
    for k in ent_s:
        np.testing.assert_array_equal(ent_d[k], ent_s[k]), k
    for k in rel_s:
        np.testing.assert_array_equal(rel_d[k], rel_s[k]), k


def test_partitioning_invariance(spark):
    """Same result whether Spark shuffles the input into 1 or 13
    physical partitions — the content-hash pid, not physical layout,
    drives the math."""
    from hinbox_spark.operators.kge import transe_train

    rows = _toy_triples()
    df1 = spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    ).coalesce(1)
    df2 = spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    ).repartition(13)
    e1, r1 = transe_train(df1, dim=8, epochs=1, parts=4)
    e2, r2 = transe_train(df2, dim=8, epochs=1, parts=4)
    for k in e1:
        np.testing.assert_array_equal(e1[k], e2[k])
    for k in r1:
        np.testing.assert_array_equal(r1[k], r2[k])


def test_training_learns_margin_separation(spark):
    """After training on the sf0.001 KG, true triples must score lower
    energy than corrupted ones for every predicate, and rank accuracy
    must beat the untrained model's."""
    from hinbox_spark.plans.queries import (
        _kg_triples, q_kg_embedding_train,
    )
    from hinbox_spark.operators.kge import _h64, init_vec

    out = {r["pred"]: r for r in q_kg_embedding_train(spark, SF).collect()}
    assert set(out) == {"in_nation", "in_segment", "placed_priority"}
    for p, r in out.items():
        assert r["mean_true_energy"] < r["mean_corrupt_energy"], p
        assert r["rank_acc"] > 0.5, p

    # untrained baseline (init vectors only), same eval corruption rule
    t = [
        (r["subj"], r["pred"], r["obj"])
        for r in _kg_triples(spark, SF).distinct().collect()
    ]
    ents = sorted({s for s, _, _ in t} | {o for _, _, o in t})
    ent = {e: init_vec("e:" + e, 16) for e in ents}
    rel = {p: init_vec("r:" + p, 16) for p in {p for _, p, _ in t}}
    ok = n = 0
    for s, p, o in t:
        idx = _h64(f"{s}\x1f{p}\x1f{o}\x1feval") % max(len(ents) - 1, 1)
        neg = ents[idx]
        if neg == o:
            neg = ents[(idx + 1) % len(ents)]
        d_pos = ent[s] + rel[p] - ent[o]
        d_neg = ent[s] + rel[p] - ent[neg]
        ok += 1 if float(d_pos @ d_pos) < float(d_neg @ d_neg) else 0
        n += 1
    base_acc = ok / n
    trained_acc = sum(
        r["rank_acc"] * r["n_triples"] for r in out.values()
    ) / sum(r["n_triples"] for r in out.values())
    assert trained_acc > base_acc + 0.1, (trained_acc, base_acc)
