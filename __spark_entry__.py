"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full SURVEY.md §2 inventory from
purldb_spark.plans.registry. See purldb_spark/ for the engine itself.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from purldb_spark.plans.registry import ORACLES, QUERIES, load_inventory

load_inventory()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary over lineitem) on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
