"""Shared runtime-conf helpers.

``spark.sql.shuffle.partitions`` is "auto" (not an integer) on clusters
running AQE auto-partitioning, so a bare ``int(conf.get(...))`` throws
ValueError there.  Every site that wants an explicit repartition width goes
through :func:`shuffle_partitions`, which falls back to the scheduler's
default parallelism when the conf value is not numeric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def shuffle_partitions(spark: SparkSession) -> int:
    """The session's shuffle-partition count as an int, falling back to
    ``sparkContext.defaultParallelism`` when the conf is non-numeric
    (e.g. "auto" under AQE auto-partitioning)."""
    raw = spark.conf.get("spark.sql.shuffle.partitions", None)
    try:
        return int(raw)  # type: ignore[arg-type]
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition a Python-stage input UP to the session's parallelism
    when the scan planned fewer partitions (r16, guide §2.1).

    A KB-scale parquet file plans as ONE file partition
    (``files.openCostInBytes`` floors the split size), which runs a
    CPU-heavy mapInPandas stage serially on a single Python worker no
    matter how many cores the session has. Production-scale inputs
    already plan more partitions than ``shuffle_partitions``, making
    this a NO-OP at scale — it never coalesces and never adds a shuffle
    there; the parameter is derived from the session conf, not a local
    constant (the bench-contract rule on scale-dependent settings). The
    local shuffle payload is whatever narrow projection the caller
    passes (typically the id column alone). The explicit partition
    count keeps AQE from re-coalescing the tiny exchange back to one
    partition."""
    n = shuffle_partitions(df.sparkSession)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
