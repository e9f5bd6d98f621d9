"""SparkSession factory.

Design for a 1000-executor cluster; test on local[N]. The knobs below are the
ones that matter for both: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), shuffle partitions sized to the parallelism actually
available, UTC session timezone (oracle comparability — DuckDB timestamps are
UTC-naive), and Arrow for any pandas exchange.

ANSI mode is left ON (Spark 4 default); every parse that may fail uses
``try_*`` functions instead (see functions/normalize.py), matching the
reference's parse-to-NULL-never-crash policy (flight_stream.py:39-41).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _driver_mem() -> str:
    # 8g covers every catalog query at sf0.1 with wide margin; a smaller
    # pinned heap also means less first-touch page-faulting (heap pages
    # fault in lazily — see the extraJavaOptions comment below).
    return os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")


def _local_cores() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "flightframe",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    On a real cluster, pass ``master=None`` and let spark-submit decide;
    ``shuffle_partitions`` should then be ~2-3x total executor cores (or left
    to AQE's coalescing with a high initial value).
    """
    cores = _local_cores()
    master = master or f"local[{cores}]"
    shuffle = shuffle_partitions if shuffle_partitions is not None else cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 10 MB default is conservative; dims in a star schema are far
        # smaller than executor memory even at 100 TB fact scale.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", _driver_mem())
        # JVM tuning, each knob root-caused on this workload:
        # * -Xms == -Xmx (heap floor): without it, G1 commits and uncommits
        #   heap under allocation-heavy (higher-order lambda) queries —
        #   observed as 97% kernel time (mmap churn + TLB shootdowns across
        #   32 threads) and random 10-100x query stalls. The floor removes
        #   uncommit entirely; pages fault in once, gradually. (AlwaysPreTouch
        #   would front-load that, but in this Firecracker VM forcing 16 GB
        #   of host page provisioning at startup costs minutes — measured —
        #   so it is deliberately NOT set.)
        # * C1-only JIT (TieredStopAtLevel=1): tiered C2 intermittently
        #   enters deopt/recompile storms (compiler threads pegged, executor
        #   threads interpreted); C1 compiles fast, never storms, and is no
        #   slower end-to-end here.
        # * 1g code cache: every distinct plan emits fresh codegen classes;
        #   an exhausted cache silently disables the JIT.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_JAVA_OPTS",
                f"-Xms{_driver_mem()} "
                "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing "
                "-XX:TieredStopAtLevel=1",
            ),
        )
        # max_by/min_by (ObjectHashAggregate) state is one row per key; the
        # default sort-based fallback at 128 distinct keys per partition
        # would turn every latest-per-key dedup into a full sort.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # The driver testdata stores events.ts as TIMESTAMP(NANOS). Spark <=3.x
        # needs this conf to read it at all (arrives as epoch-nanos long);
        # Spark 4.x accepts-but-ignores it and reads TIMESTAMP_NTZ instead.
        # sources.parquet.load_table normalizes BOTH arrival types to a zoned
        # UTC timestamp truncated to micros (pinned by test_parquet_source.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
