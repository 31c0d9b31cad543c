"""Incremental-vs-recompute evidence: the run_incremental cost of applying
a 10% delta vs the cost of re-deriving the store from scratch over the
union corpus — the operating economics of the KG at 10¹² documents, where
a nightly full recompute is impossible and delta cost must track |delta|.

Per measured point (fresh JVM per phase, 1-min loadavg gated like
bench_scaling.py):
  bootstrap   batch run over 90% of the corpus, seeding the snapshot store
  delta       run_incremental over the remaining 10%
  recompute   batch run over 100% (what the delta run replaces)

Usage:
  python scripts/bench_incremental.py [n_pages] [cores]   # orchestrator
  python scripts/bench_incremental.py --worker PHASE N C DIR
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _corpus(spark, n_pages: int, split_dir: str):
    """Materialize the corpus once, split 90/10 by url hash (deterministic,
    seed-stable across JVMs)."""
    import pyspark.sql.functions as F

    from hinbox_spark.sources.pages_gen import pages_dataframe_distributed

    if not os.path.exists(os.path.join(split_dir, "base", "_SUCCESS")):
        pages = pages_dataframe_distributed(
            spark, n_pages, seed=42, partitions=64
        )
        is_delta = F.pmod(F.xxhash64("url"), F.lit(10)) == 0
        pages.filter(~is_delta).write.mode("overwrite").parquet(
            split_dir + "/base"
        )
        pages.filter(is_delta).write.mode("overwrite").parquet(
            split_dir + "/delta"
        )
        pages.write.mode("overwrite").parquet(split_dir + "/all")


def worker(phase: str, n_pages: int, cores: int, work_dir: str) -> None:
    warnings.filterwarnings("ignore")
    sys.path.insert(0, REPO)
    import dataclasses

    from hinbox_spark.config import get_default_config
    from hinbox_spark.incremental import run_incremental
    from hinbox_spark.pipeline import run_pipeline
    from hinbox_spark.session import get_spark
    from hinbox_spark.sources.pages_gen import pages_dataframe_distributed

    spark = get_spark(
        f"inc_{phase}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    spark.sparkContext.setLogLevel("ERROR")
    _corpus(spark, n_pages, work_dir)

    # JVM/codegen warm-up (same rationale as bench_scaling.py)
    warm = pages_dataframe_distributed(spark, 400, seed=7, partitions=8)
    run_pipeline(spark, warm, tempfile.mkdtemp(prefix="warm_"), resume=False)

    store = os.path.join(work_dir, "store")
    cfg = dataclasses.replace(get_default_config(), snapshot_store_path=store)

    if phase == "bootstrap":
        pages = spark.read.parquet(work_dir + "/base")
        t0 = time.time()
        run_pipeline(
            spark, pages, tempfile.mkdtemp(prefix="boot_"),
            cfg=cfg, resume=False,
        )
    elif phase == "delta":
        pages = spark.read.parquet(work_dir + "/delta")
        t0 = time.time()
        run_incremental(
            spark, pages, tempfile.mkdtemp(prefix="delta_"),
            cfg=cfg, run_id="bench-delta",
        )
    elif phase == "recompute":
        pages = spark.read.parquet(work_dir + "/all")
        t0 = time.time()
        run_pipeline(
            spark, pages, tempfile.mkdtemp(prefix="full_"),
            cfg=dataclasses.replace(cfg, snapshot_store_path=None),
            resume=False,
        )
    else:
        raise SystemExit(f"unknown phase {phase}")
    sec = time.time() - t0
    n = pages.count()
    print(json.dumps({
        "phase": phase, "pages": n, "sec": round(sec, 2),
        "docs_per_sec": round(n / sec, 2), "cores": cores,
    }))


def orchestrate(n_pages: int, cores: int) -> None:
    work_dir = os.path.join(
        tempfile.gettempdir(), f"inc_bench_{n_pages}"
    )
    os.makedirs(work_dir, exist_ok=True)
    # the corpus split is deterministic and reusable across invocations,
    # but the snapshot store must be FRESH: a stale store would make the
    # delta phase skip every page via the processed-pages log and publish
    # a no-op as the measured delta cost
    import shutil

    shutil.rmtree(os.path.join(work_dir, "store"), ignore_errors=True)
    results = {}
    for phase in ("bootstrap", "delta", "recompute"):
        # load gate: wait out other work so samples are honest
        gate = 4.0
        waited = 0
        while os.getloadavg()[0] >= gate and waited < 300:
            time.sleep(10)
            waited += 10
        load_before = round(os.getloadavg()[0], 2)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--worker", phase, str(n_pages), str(cores), work_dir],
            capture_output=True, text=True, timeout=7200,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        rec["load_before"] = load_before
        rec["load_after"] = round(os.getloadavg()[0], 2)
        results[phase] = rec
        print(json.dumps(rec))
    ratio = results["recompute"]["sec"] / results["delta"]["sec"]
    summary = {
        "n_pages": n_pages,
        "cores": cores,
        "delta_sec": results["delta"]["sec"],
        "recompute_sec": results["recompute"]["sec"],
        "bootstrap_sec": results["bootstrap"]["sec"],
        "recompute_over_delta": round(ratio, 2),
        "delta_docs_per_sec": results["delta"]["docs_per_sec"],
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH_incremental.json"), "w") as f:
        json.dump({"runs": results, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
        c = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        orchestrate(n, c)
