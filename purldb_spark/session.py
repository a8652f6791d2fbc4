"""SparkSession factory tuned for this engine.

Local-mode settings mirror what we would set fleet-wide on a real cluster:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
Arrow for the few Pandas-UDF paths, UTC session time zone so timestamp
semantics match the DuckDB oracle.

At 100 TB the same code runs with a different master and higher
``spark.sql.shuffle.partitions`` (rule of thumb: ~2-3x total cores, or let
AQE coalesce from a high initial number). Nothing in the engine hardcodes
partition counts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "purldb_spark",
    cpus: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # r15 (guide §4): JVM<->Python-worker channels over Unix domain
        # sockets (SPARK-51424, Spark 4.1) instead of loopback TCP.
        # Python workers are always co-located with their executor, on a
        # laptop or a 100-node cluster alike, so this is scale-neutral;
        # measured 15-35% off every mapInPandas/pandas-UDF query here
        # (loopback TCP round trips are syscall-bound under virtualized
        # NICs). Env override for environments without UDS support.
        .config(
            "spark.python.unix.domain.socket.enabled",
            os.environ.get("SPARK_GRAFT_PY_UDS", "true"),
        )
        # the synthetic events table stores TIMESTAMP(NANOS); read as long
        # and convert in catalog.tables.load (Spark has no nanos timestamps)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
