"""Shared runtime-conf helpers.

``spark.sql.shuffle.partitions`` is "auto" (not an integer) on clusters
running AQE auto-partitioning, so a bare ``int(conf.get(...))`` throws
ValueError there.  Every site that wants an explicit repartition width goes
through :func:`shuffle_partitions`, which falls back to the scheduler's
default parallelism when the conf value is not numeric.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def shuffle_partitions(spark: SparkSession) -> int:
    """The session's shuffle-partition count as an int, falling back to
    ``sparkContext.defaultParallelism`` when the conf is non-numeric
    (e.g. "auto" under AQE auto-partitioning)."""
    raw = spark.conf.get("spark.sql.shuffle.partitions", None)
    try:
        return int(raw)  # type: ignore[arg-type]
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism
