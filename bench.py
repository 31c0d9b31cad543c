"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the KG-construction
pipeline throughput (docs/sec) on a deterministic synthetic corpus.

Prints a COMPACT (≤1 KB, asserted) headline JSON object as the LAST stdout
line — SCALARS only:
  {"metric": "headline_total_sec", "value": N, "unit": "sec",
   "n_queries": N, "sf": ..., "kg_sec": ..., "kg_docs_per_sec": ...,
   "kg_marginal_docs_per_sec": ..., "cpus": ..., "runs_per_query": N}
Per-query minima, every run's timing, per-run KG stage breakdowns, and the
loadavg samples around each run go to a SIDECAR file,
BENCH_runs_verbose.json next to this script — NOT stdout. The driver
captures only a bounded stdout tail; rounds 3 AND 4 overflowed it (r3: one
giant line; r4: 63 per-query entries ≈ 2.2 KB), leaving both BENCH_r0N.json
artifacts unparseable ("parsed": null). Scalars-only keeps the line ~350 B
even as the query set grows.

Execution is forced with the noop sink (full computation, no driver
collect). Each query time includes plan + execution, not session startup.
Noise robustness: every query (and the KG pipeline) runs
$SPARK_GRAFT_BENCH_RUNS times (default 2) and reports the MIN — a shared
host's transient load can only inflate a sample, never deflate it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import warnings

warnings.filterwarnings("ignore")

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_building",
    "top_customer_per_nation",
    "latest_order_per_customer",
    "events_daily",
    "events_top3_per_type",
    "doc_token_stats",
    "doc_prefix_fingerprint_dups",
    "embedding_norms",
    "knn_top5",
    "label_centroid_norms",
    "rollup_revenue",
    "events_sessions",
    "doc_minhash_near_dups",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "emb_near_dup_pairs_lsh",
    # round-3 additions
    "orders_with_late_lineitem",
    "promo_revenue_share",
    "top_revenue_suppliers",
    "large_order_customers",
    "idle_rich_customers",
    "purchase_graph_degrees",
    "copurchase_reach_hll",
    "doc_simhash_near_dups",
    # round-4 additions
    "click_asof_purchase",
    "nation_trade_volume",
    "top_value_parts",
    "brand_supplier_counts",
    "click_purchase_window",
    "doc_holdout_split",
    "doc_stratified_sample",
    "customer_order_distribution",
    "small_quantity_revenue",
    "disjunctive_promo_revenue",
    "priority_by_returnflag",
    "top_return_customers",
    "copurchase_pagerank",
    "copurchase_hits",
    "doc_bm25_search",
    "purchase_degree_gini",
    "purchase_assortativity",
    "copurchase_transitivity",
    "doc_dedup_keepers",
    "corpus_vocab_topk",
    "doc_weighted_mix",
    "doc_contamination",
    "doc_ngram_novelty",
    "source_distinctive_terms",
    "events_funnel",
    "events_retention",
    "training_corpus_filter",
    "ann_pq_topk",
    "events_percentiles_sketch",
    "waiting_suppliers",
    "market_share",
    "profit_by_nation_year",
    "events_moving_avg",
    "doc_pack_sequences",
    "revenue_cube",
    "nation_activity_full_outer",
    "concurrent_sessions",
    "copurchase_bfs_hops",
    "events_anomaly",
    "order_value_histogram",
    "doc_quality_quartiles",
    # round-5 additions: TPC-H sweep completion (Q6/Q2/Q20 shapes)
    "forecast_revenue",
    "min_cost_supplier",
    "dominant_part_suppliers",
    "doc_exact_substring_spans",
    "copurchase_triangles",
    "corpus_bigram_pmi",
    "doc_pii_redaction",
    "doc_unigram_rarity",
    "emb_hard_negatives",
    "copurchase_link_prediction",
    "copurchase_link_prediction_minhash",
    "emb_dedup_keepers",
    "doc_quality_classifier",
    "doc_length_buckets",
    "corpus_cms_heavy_hitters",
    "doc_inverted_index",
    "doc_target_affinity",
    "corpus_bpe_merges",
    "copurchase_kcore",
    "events_type_bigrams",
    "ann_ivfpq_topk",
    "er_cluster_quality",
    "copurchase_communities",
    # round-5 materialized-KG consumer family
    "kg_star_join",
    "kg_ntriples_export",
    "kg_functional_violations",
    "part_name_edit_pairs",
    "kg_temporal_validity",
    "kg_random_walks",
    "kg_snapshot_timeline",
    "kg_shacl_violations",
    "kg_property_path",
    "kg_negative_samples",
    "kg_schema_induction",
    "kg_completion_eval",
    # round-5 continuation: truth/alignment/traversal/novelty + reasoning
    "kg_truth_discovery",
    "kg_entity_alignment",
    "copurchase_shortest_paths",
    "doc_jaccard_prefix_pairs",
    "doc_bloom_novelty",
    "kg_embedding_train",
    "kg_rdfs_closure",
    "kg_sameas_rewrite",
    "emb_neighbor_pool",
    "kg_harmonic_centrality",
    "kg_wl_colors",
    "kg_ppr",
]

KG_PAGES = int(os.environ.get("SPARK_GRAFT_KG_PAGES", "20000"))
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
# big-corpus multiplier for the marginal-throughput slope: the time
# delta must clear host noise (±3-5 s on this shared box), so the gap
# needs to be ~15+ s quiet — 5× (20k vs 100k) puts it at ~17 s; 3× put
# it at ~8 s and the differenced estimate swung 2-4× between windows.
KG_BIG_MULT = max(2, int(os.environ.get("SPARK_GRAFT_KG_BIG_MULT", "5")))
# The marginal needs ONE clean (small, big) pair; each pair costs ~65 s
# quiet, so extra rounds are cheap insurance against this host's fast/slow
# states. 3 pairs by default (the per-query loop stays at N_RUNS).
KG_RUNS = max(N_RUNS, int(os.environ.get("SPARK_GRAFT_KG_RUNS", "3")))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hinbox_spark.plans.queries import SPARK_QUERIES
    from hinbox_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm up JVM + python workers once so per-query times measure the work
    spark.range(1000).selectExpr("sum(id)").collect()

    load_samples: list[float] = []

    def _sample_load() -> None:
        load_samples.append(round(os.getloadavg()[0], 2))

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = SPARK_QUERIES[name]
        runs = []
        for _ in range(N_RUNS):
            _sample_load()
            t0 = time.time()
            _force(fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        all_runs[name] = runs
        timings[name] = min(runs)

    # KG pipeline throughput: distributed synthetic corpus → full pipeline.
    # A small warm-up run compiles the whole-stage-codegen classes so the
    # measured run reflects data work, not per-plan JIT (see BENCH.md).
    # Every tempdir is removed in the finally block — repeated bench rounds
    # must not accumulate full pipeline output trees in /tmp.
    from hinbox_spark.pipeline import run_pipeline
    from hinbox_spark.sources.pages_gen import pages_dataframe_distributed

    stage_runs: dict[str, list[dict]] = {"kg_pipeline": [], "kg_pipeline_big": []}

    def _kg_run(pages, root: str, tag: str, i: int) -> float:
        """One full-pipeline wall time; per-run stage breakdown and loadavg
        go to the sidecar so a load-polluted sample is diagnosable
        per-stage instead of by whole-run comparison."""
        _sample_load()
        out_dir = f"{root}/{tag}-{i}"
        stages: dict[str, float] = {}
        t0 = time.time()
        run_pipeline(spark, pages, out_dir, resume=False, stage_times=stages)
        sec = round(time.time() - t0, 3)
        stage_runs[tag].append(stages)
        shutil.rmtree(out_dir, ignore_errors=True)
        all_runs.setdefault(tag, []).append(sec)
        return sec

    bench_root = tempfile.mkdtemp(prefix="bench_kg_root_")
    try:
        warm = pages_dataframe_distributed(spark, 400, seed=7, partitions=8)
        run_pipeline(spark, warm, bench_root + "/warm", resume=False)

        pages_dir = bench_root + "/pages"
        pages_dataframe_distributed(
            spark, KG_PAGES, seed=42, partitions=4 * cpus
        ).write.mode("overwrite").parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)
        n_pages = pages.count()
        big_dir = bench_root + "/pages_big"
        pages_dataframe_distributed(
            spark, KG_BIG_MULT * KG_PAGES, seed=42, partitions=4 * cpus
        ).write.mode("overwrite").parquet(big_dir)
        big = spark.read.parquet(big_dir)
        n_big = big.count()

        # Marginal throughput = corpus-size delta / time delta — the
        # per-page cost that survives once the per-RUN fixed tail (stage
        # commits + worker spin-up, BENCH.md's Amdahl fit) is differenced
        # away; it is the number that matters at 10^12 docs. Differencing
        # makes the estimator fragile on a shared host: round-4's artifact
        # recorded a 48×-off marginal because the small-corpus run landed
        # in a load spike and the denominator collapsed. Defenses, in
        # order: (1) INTERLEAVE the two sizes (small,big per round) so a
        # pollution window hits a pair symmetrically rather than one side;
        # (2) difference PER PAIR, never across windows; (3) keep only
        # pairs whose implied marginal is physically plausible — the
        # marginal can't exceed ~3× the same pair's big-run end-to-end
        # throughput (quiet-window measurements put the true ratio at
        # ~2.2×: BENCH.md r4, marginal 4679 vs end-to-end 2135 at 60k) —
        # and whose time delta isn't collapse noise (<5% of the big time);
        # (4) of the surviving pairs, report the one from the QUIETEST
        # window (smallest combined wall time — host load only ever
        # inflates), null (with raw pairs in the sidecar) when none
        # survive.
        pairs: list[tuple[float, float]] = []
        for i in range(KG_RUNS):
            small_i = _kg_run(pages, bench_root, "kg_pipeline", i)
            big_i = _kg_run(big, bench_root, "kg_pipeline_big", i)
            pairs.append((small_i, big_i))
            _sample_load()
        kg_sec = min(s for s, _ in pairs)
        kg_big_sec = min(b for _, b in pairs)
        timings["kg_pipeline"] = kg_sec

        marginal_pairs = []  # (combined wall time, implied marginal)
        for small_i, big_i in pairs:
            dt = big_i - small_i
            if dt < 0.05 * big_i:  # collapsed denominator: pure noise
                continue
            m = (n_big - n_pages) / dt
            if m > 3.0 * (n_big / big_i):  # implausible vs same-window e2e
                continue
            marginal_pairs.append((small_i + big_i, m))
        marginal = (
            round(min(marginal_pairs)[1], 2) if marginal_pairs else None
        )
        marginal_raw = [
            round((n_big - n_pages) / (b - s), 2) if b > s else None
            for s, b in pairs
        ]
    finally:
        shutil.rmtree(bench_root, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    # verbose audit trail → sidecar file (auditable, never on stdout):
    # per-query run arrays AND minima, per-run kg stage breakdowns,
    # loadavg samples around every run.
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_runs_verbose.json"
    )
    with open(sidecar, "w") as f:
        json.dump(
            {"queries_min": timings, "queries_runs": all_runs,
             "kg_stage_times": stage_runs, "loadavg": load_samples,
             "sf": sf, "cpus": cpus, "kg_pages": n_pages,
             "kg_pages_big": n_big, "kg_big_sec": kg_big_sec,
             "kg_marginal_raw": marginal_raw},
            f,
        )
    # compact headline as the LAST stdout line — the driver captures a
    # bounded stdout tail, so this line must stay well under 1 KB:
    # headline SCALARS only, per-query minima live in the sidecar.
    # tiny "queries" dict for driver-schema compliance: the headline kg
    # run plus the 5 slowest others — full minima live in the sidecar.
    slowest = dict(
        sorted(
            ((k, v) for k, v in timings.items() if k != "kg_pipeline"),
            key=lambda kv: -kv[1],
        )[:5]
    )
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": {"kg_pipeline": kg_sec, **slowest},
        "n_queries": len(timings),
        "sf": sf,
        "kg_sec": kg_sec,
        "kg_big_sec": kg_big_sec,
        "kg_docs_per_sec": round(n_pages / kg_sec, 2),
        "kg_marginal_docs_per_sec": marginal,
        "kg_pages": n_pages,
        "cpus": cpus,
        "runs_per_query": N_RUNS,
        "queries_file": "BENCH_runs_verbose.json",
    }
    line = json.dumps(result)
    assert len(line) <= 1024, f"headline line {len(line)}B breaks the tail contract"
    print(line)


if __name__ == "__main__":
    main()
