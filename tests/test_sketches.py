"""Count-min sketch: the Cormode-Muthukrishnan guarantees, exact shard
merge, determinism under repartitioning, and the shuffle-bounded plan."""

from pyspark.sql import functions as F

from hinbox_spark.operators.sketches import (
    cms_estimate,
    count_min_sketch,
    merge_sketches,
)

SF = "/root/testdata/sf0.001"


def _tokens(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    return d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))


def test_cms_never_undercounts_and_overcount_is_bounded(spark):
    toks = _tokens(spark)
    n = toks.count()
    sketch = count_min_sketch(toks, "token", depth=4, width=2048)
    true = toks.groupBy("token").agg(F.count("*").alias("true_cnt"))
    est = cms_estimate(sketch, true, "token", depth=4, width=2048)
    rows = est.collect()
    assert len(rows) >= 20  # sf0.001's synthetic vocab is small
    # one-sided error: counters only ever over-count on collisions
    assert all(r.est_cnt >= r.true_cnt for r in rows)
    # ε = e/width ≈ 0.00133 → bound ~0.00133 · N; depth 4 gives δ ≈ e⁻⁴,
    # and the bound holds per-row w.h.p. — assert every row at 2× slack
    eps_n = 2.0 * 2.718281828 / 2048 * n
    assert all(r.est_cnt - r.true_cnt <= eps_n for r in rows)
    # a deliberately narrow sketch (8 buckets for ~31 terms) forces
    # collisions: estimates must still NEVER undercount, and at least one
    # term must visibly over-count — the guarantee under stress, not just
    # in the no-collision regime
    tight = cms_estimate(
        count_min_sketch(toks, "token", depth=2, width=8),
        true, "token", depth=2, width=8,
    ).collect()
    assert all(r.est_cnt >= r.true_cnt for r in tight)
    assert any(r.est_cnt > r.true_cnt for r in tight)


def test_cms_merge_is_exact_and_partitioning_invariant(spark):
    toks = _tokens(spark).withColumn(
        "half", F.pmod(F.xxhash64("token", F.lit(99)), F.lit(2))
    )
    whole = count_min_sketch(toks, "token", depth=4, width=512)
    merged = merge_sketches(
        count_min_sketch(toks.filter(F.col("half") == 0), "token", 4, 512),
        count_min_sketch(toks.filter(F.col("half") == 1), "token", 4, 512),
    )
    w = {(r.r, r.b): r.cnt for r in whole.collect()}
    m = {(r.r, r.b): r.cnt for r in merged.collect()}
    assert w == m  # CMS merge is cell-wise exact, not approximate
    # and the sketch is partitioning-invariant (deterministic seeded hash)
    re = count_min_sketch(_tokens(spark).repartition(13), "token", 4, 512)
    assert {(r.r, r.b): r.cnt for r in re.collect()} == w


def test_cms_plan_is_jvm_only_with_mapside_combine(spark):
    sketch = count_min_sketch(_tokens(spark), "token", depth=4, width=2048)
    plan = sketch._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial agg below the exchange: a task's shuffle output is capped at
    # depth × width cells no matter how many tokens it scanned
    assert "partial_count" in plan

    from hinbox_spark.plans.queries import SPARK_QUERIES

    hh = SPARK_QUERIES["corpus_cms_heavy_hitters"](spark, SF)
    qplan = hh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in qplan  # the sketch rides a broadcast
    rows = hh.collect()
    assert len(rows) == 15
    assert all(r.overcount >= 0 for r in rows)


def test_cms_estimate_rejects_shape_mismatch_and_survives_column_collisions(spark):
    """Querying a sketch with the wrong (depth, width) would silently
    return zeros through the missing-cell fill — it must raise instead;
    and candidate frames carrying columns named r/b/cnt must not collide
    with the join internals."""
    import pytest as _pytest

    from hinbox_spark.operators.sketches import cms_estimate, count_min_sketch

    toks = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 7 + [("c",)] * 3, "token string"
    )
    sk = count_min_sketch(toks, "token", depth=4, width=64)

    with _pytest.raises(ValueError, match="depth mismatch"):
        cms_estimate(sk, toks.distinct(), "token", depth=8, width=64)
    with _pytest.raises(ValueError, match="width mismatch"):
        cms_estimate(sk, toks.distinct(), "token", depth=4, width=16)

    # candidates with r/b/cnt columns of their own
    cands = toks.distinct().select(
        "token",
        F.lit(1).alias("r"), F.lit(2).alias("b"), F.lit(3).alias("cnt"),
    )
    est = {
        r["token"]: r["est_cnt"]
        for r in cms_estimate(sk, cands, "token", depth=4, width=64).collect()
    }
    assert est["a"] >= 50 and est["b"] >= 7 and est["c"] >= 3
