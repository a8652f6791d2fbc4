"""Aggregation queries — SURVEY §2.4 (A1-A4, A6, A8, A9).

A5 (snippet jaccard) lives in q_match.py next to the match engine; A7
(latest version via natural sort) in q_versions.py.

All are single-scan groupBy plans: partial aggregation map-side, shuffle
only the (small) group keys — the canonical scale-safe shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.functions.numeric import dsum
from purldb_spark.plans.registry import query


@query(
    "a1_group_count",
    oracle="""
    SELECT o_orderstatus AS scan_status, count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def a1_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: queue stats — count by scan_status (minecode/models.py:597-611)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("scan_status")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "a2_group_count_generic",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def a2_group_count_generic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: generic count_group_by(qs, field) (matchcode/api.py:397-420)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "a3_conditional_counts",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS total,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' AND o_totalprice <= 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_fulfilled
    FROM orders GROUP BY o_orderpriority
    """,
)
def a3_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: multi-predicate conditional counts — the dependency-summary shape
    total/is_runtime/is_optional/is_pinned (matchcode/api.py:409-416)."""
    o = load(spark, sf_dir, "orders")
    one = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("total"),
        one(F.col("o_orderstatus") == "O").alias("n_open"),
        one(F.col("o_totalprice") > 200000).alias("n_high_value"),
        one((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") <= 200000)).alias(
            "n_small_fulfilled"
        ),
    )


@query(
    "a4_distinct_count_per_group",
    oracle="""
    SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_lines
    FROM lineitem GROUP BY l_suppkey
    """,
)
def a4_distinct_count_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: matched distinct fingerprints per package
    (matchcode/models.py:503-518). Exact distinct — a two-phase shuffle; at
    100 TB prefer approx_count_distinct when 2% error is acceptable (the
    reference has no approximate variant; we expose exactness here for oracle
    parity)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "a6_rank_by_group_size",
    oracle="""
    SELECT p_brand, count(*) AS n_parts
    FROM part GROUP BY p_brand
    ORDER BY n_parts DESC, p_brand
    """,
)
def a6_rank_by_group_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: rank candidate packages by matched-resource count
    (matchcode/pipes/matching.py:505-527), deterministic tie-break on the
    group key."""
    p = load(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy(F.desc("n_parts"), F.asc("p_brand"))
    )


@query(
    "a8_global_counters",
    oracle="""
    SELECT count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS gross
    FROM orders
    """,
)
def a8_global_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: run counters/accumulators (run_visit.py:163-165) as one global
    aggregate row."""
    o = load(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        dsum("o_totalprice").alias("gross"),
    )


@query(
    "a9_minmax_per_group",
    oracle="""
    SELECT c_nationkey,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal,
           count(*) AS n
    FROM customer GROUP BY c_nationkey
    """,
)
def a9_minmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: min-per-group (earliest release_date per checksum,
    packagedb/api.py:476-481). min/max of doubles are order-independent, so
    no decimal detour is needed."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.count(F.lit(1)).alias("n"),
    )
