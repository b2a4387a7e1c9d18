"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]``; the configs below are chosen so the
same code is correct and fast on a multi-executor cluster:

- AQE on (runtime coalescing + skew-join splitting): hot crawl hosts are
  Zipf-skewed, so skew handling must be on by default.
- Arrow enabled for every pandas UDF hot path.
- shuffle partitions sized for the local test harness; on a real cluster
  this is overridden via spark-submit conf (or left to AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Sizing-based AQE coalescing for HIGH-VOLUME runs (the 10^10-row-round
# design point, exercised locally via mirrors>=8): partition width then
# adapts to data VOLUME instead of splitting every small stage into
# one-tiny-task-per-core, which anti-scales with core count. Apply via
# ``get_spark(extra_conf=SIZING_COALESCE_CONF)`` (scripts/
# scaling_worker.py does) — do NOT make it the session default; at
# small round volumes it collapses stages to a single task and costs
# ~1.2-3x (round-4 judge measurements in BENCH.md).
SIZING_COALESCE_CONF = {
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
}

# FAIR scheduling for the PIPELINED scaling shape only: the engine's
# round loop (pool "loop", weight 2 + minShare) and its background
# bulk-convert thread (pool "bulk") share task slots instead of
# FIFO-queueing, bounding the loop's wait behind long convert task
# sets. NOT a session default: on loop-only shapes (the sf0.1
# flagship runs no bulk thread) FAIR's per-stage pool accounting was
# measured ~6-7 s/run slower twice in A/B, with nothing to interleave.
# The engine tags its pools via setLocalProperty either way; under the
# default FIFO scheduler the tags are ignored.
FAIR_SCHEDULER_CONF = {
    "spark.scheduler.mode": "FAIR",
    "spark.scheduler.allocation.file": os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fairscheduler.xml"
    ),
}


# JIT compiler-thread floor (guide §1.1 empirical loop / §7.3 driver
# stalls). Measured on the r7 bench host (32 cores, JDK 17): the driver
# JVM came up with ONE C1 + ONE C2 compiler thread (dynamic sizing
# never grew the pool) while bare `java` ergonomics on the same box
# pick 15 — so for the first ~90 s of JVM life the C2 queue backlog ran
# the whole process (Catalyst analysis, SizeEstimator, generated code)
# interpreted: jstacks showed C2 CompilerThread0 as the top CPU burner
# (17-25 s) and 10-20x inflated driver phases; the event log showed
# 36.7 s of job-free driver gaps in one flagship. Forcing a static
# compiler pool cut the bench flagship 37.1 -> 22.0 s and the replay
# crawl 43.7 -> 26.8 s with no steady-state cost (flags only shorten
# the compile backlog; hot code is identical). Long-lived cluster
# drivers/executors want the same floor — cold-start latency is where
# iterative (round-loop) jobs burn it. SPARK_GRAFT_JIT_OPTS overrides
# (empty string disables).
JIT_OPTS = os.environ.get(
    "SPARK_GRAFT_JIT_OPTS",
    "-XX:-UseDynamicNumberOfCompilerThreads -XX:CICompilerCount=12 "
    "-XX:ReservedCodeCacheSize=1g",
)


def _default_driver_memory() -> str:
    """Portable default: ~40% of physical RAM, clamped to [4g, 48g].
    The 128 GiB sandbox lands on 48g (the tuned bench value); small
    hosts get a JVM that actually starts. SPARK_DRIVER_MEMORY overrides."""
    try:
        avail_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 2**30
        return f"{max(4, min(48, int(avail_gb * 0.4)))}g"
    except (ValueError, OSError, AttributeError):
        return "8g"


def get_spark(
    app_name: str = "volltextextraktion-selenium-md-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(os.environ.get(
        "SPARK_SHUFFLE_PARTITIONS", str(max(int(cpus) if cpus.isdigit() else 32, 8))
    ))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalescing stays parallelism-first (the Spark default) in the
        # SESSION defaults: sizing-based coalescing (parallelismFirst=
        # false + a 64 MB advisory) is measured-right ONLY on the
        # high-volume scaling shape (convert-ON engine at mirrors=64:
        # 302 s -> 204 s on 32 cores) and measured-WRONG on small
        # shapes (sf0.1 flagship 65 s -> 79 s; link_classification ~3x
        # — small stages collapse to one tiny task). A single static
        # conf cannot serve both, so the sizing conf is SCOPED to the
        # scaling path via SIZING_COALESCE_CONF (round-4 verdict #2)
        # and everything else keeps the width-maximizing default.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # crawl frontiers produce many small iterative stages; keep the
        # shuffle service lean and deterministic
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # default 10k-row columnar cache batches allocate multi-MB arrays
        # per column -> G1 humongous-allocation storms once many task
        # threads build cache concurrently (measured 3x cache-build
        # slowdown at 32 threads); 2k keeps allocations region-sized
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "2000")
    )
    # driver + executor JIT options (see JIT_OPTS). In local mode the
    # executor shares the driver JVM (the driver flag is the one that
    # matters and IS honored: pyspark's gateway passes builder conf to
    # spark-submit before the JVM starts); on a cluster each executor
    # JVM gets the same compile-thread floor. Caller-supplied
    # extraJavaOptions are APPENDED so a probe's -Xlog/-XX flags
    # compose with (rather than silently drop) the measured defaults.
    merged = dict(extra_conf or {})
    if JIT_OPTS:
        for key in ("spark.driver.extraJavaOptions",
                    "spark.executor.extraJavaOptions"):
            user = merged.get(key, "")
            merged[key] = f"{JIT_OPTS} {user}".strip()
    for k, v in merged.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
