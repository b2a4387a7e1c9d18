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
        # coalesce small shuffles to the advisory SIZE, not to max
        # parallelism: the iterative frontier loop runs many small
        # stages whose default split into one-tiny-task-per-core anti-
        # scales with core count (measured: convert-off engine at
        # mirrors=64 took 302 s on 32 cores vs 215 s on 8 with the
        # default; 204 s on 32 with sizing-based coalescing). Large
        # stages still exceed the advisory size and keep full width —
        # width adapts to VOLUME, which is exactly the 10^10-row-round
        # behavior. Stages that EXPAND rows after the shuffle (payload
        # mint/convert) declare their width explicitly instead.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
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
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
