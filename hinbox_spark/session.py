"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the same settings are what we'd submit with
`spark-submit --py-files` on a real cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), Arrow on (all Python work goes
through vectorized pandas UDFs), and shuffle partitions sized to the
parallelism at hand rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hinbox_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cores}]"
    if shuffle_partitions is None:
        # local[N] → N-ish shuffle partitions; on a real cluster this would
        # be ~2-3× total executor cores (or left to AQE coalescing).
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cores if not n.isdigit() else int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst deliberately left at its default (true): an
        # interleaved A/B at sf0.1 (12 queries × 3 rounds, quiet host)
        # measured 28.98 s (true) vs 29.55 s (false) — local-mode task
        # scheduling is cheap enough that coalescing below the core count
        # buys nothing, and keeping post-shuffle parallelism protects the
        # byte-tiny/CPU-heavy Python stages (r6 optimization notes).
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # autoBroadcastJoinThreshold default 10MB is right for dim tables;
        # AQE converts to broadcast at runtime when sizes allow.
        # local mode runs everything in the driver JVM: size the heap like
        # a real executor fleet (~1.5 GB/core at local[16], not 0.5).
        # A/B at 1.5M pages showed 8g vs 24g makes no measurable wall-time
        # difference on this corpus, but 24g leaves headroom for cached
        # stages + concurrent scans on a 128 GiB host and mirrors a
        # realistic per-executor memory budget.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # A silently-dying Python worker otherwise leaves the JVM task in an
        # untimed socket read forever (observed once during a 480k scaling
        # run: daemon alive, zero worker children, task pinned 13+ min in
        # EPoll.wait). faulthandler makes the worker dump a stack on fatal
        # signals so the death is diagnosable instead of a silent hang.
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    return builder.getOrCreate()
