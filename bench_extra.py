"""Per-query optimization harness (guide §1) — NOT the driver bench.

`bench.py` is frozen for measurement; this file exists so single queries can
be timed in isolation with the noop sink, repeated, and their
`.explain("formatted")` plans captured to plans/r06/ for the judge.

Usage:
  python bench_extra.py time  <query> [<query>...] [--runs N] [--sf DIR]
  python bench_extra.py plan  <query> [<query>...] [--tag before|after]
  python bench_extra.py kg    [--pages N]           # pipeline stage timing

Timing methodology matches bench.py exactly: noop sink, N runs, min
reported (host load only ever inflates a sample).
"""

from __future__ import annotations

import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark():
    from hinbox_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark("bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    return spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = "before"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--tag":
            tag = args[i + 1]; i += 2
        elif args[i] == "--pages":
            os.environ["BX_PAGES"] = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    spark = _spark()

    if mode == "kg":
        import shutil
        import tempfile

        from hinbox_spark.pipeline import run_pipeline
        from hinbox_spark.sources.pages_gen import pages_dataframe_distributed

        pages_n = int(os.environ.get("BX_PAGES", "20000"))
        root = tempfile.mkdtemp(prefix="bx_kg_")
        try:
            warm = pages_dataframe_distributed(spark, 400, seed=7, partitions=8)
            run_pipeline(spark, warm, root + "/warm", resume=False)
            pd_dir = root + "/pages"
            pages_dataframe_distributed(
                spark, pages_n, seed=42, partitions=128
            ).write.mode("overwrite").parquet(pd_dir)
            pages = spark.read.parquet(pd_dir)
            for r in range(runs):
                stages: dict = {}
                t0 = time.time()
                run_pipeline(
                    spark, pages, f"{root}/out{r}", resume=False,
                    stage_times=stages,
                )
                dt = round(time.time() - t0, 3)
                print(f"kg_pipeline run{r}: {dt}s  stages={stages}", flush=True)
                shutil.rmtree(f"{root}/out{r}", ignore_errors=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        return

    from hinbox_spark.plans.queries import SPARK_QUERIES

    if mode == "plan":
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = SPARK_QUERIES[name](spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = f"plans/r06/{name}_{tag}.txt"
            with open(out, "w") as f:
                f.write(p)
            print(f"wrote {out} ({len(p)} bytes)", flush=True)
        return

    if mode == "time":
        for name in names:
            fn = SPARK_QUERIES[name]
            ts = []
            for _ in range(runs):
                spark.sparkContext.setJobDescription(name)
                t0 = time.time()
                _force(fn(spark, sf_dir))
                ts.append(round(time.time() - t0, 3))
            print(f"{name}: min={min(ts)} runs={ts}", flush=True)
        return

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
