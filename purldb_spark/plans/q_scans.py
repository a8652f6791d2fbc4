"""Scans, pagination, point lookups (SURVEY §2.1 S1/S2) + the flagship
pricing-summary query used by ``entry()`` and the bench.

Reference parity:
- S1 table scan w/ pagination: packagedb/api_custom.py:13-23 (20/page list
  endpoints) — expressed as a total-order sort + limit/offset window. At scale
  offset pagination is replaced by keyset pagination (filter key > last), which
  is also provided in operators/filters.py.
- S2 point lookup by key: packagedb/api.py:376 (uuid/sha1 retrieve) — a
  predicate that Catalyst pushes to the parquet scan (min/max + dictionary
  skipping stand in for the reference's B-tree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.functions.numeric import davg, dec, dsum, dsum_expr, sql_davg, sql_dsum
from purldb_spark.plans.registry import query


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum('l_quantity')} AS sum_qty,
      {sql_dsum('l_extendedprice')} AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(8,4))) * (1 + CAST(l_tax AS DECIMAL(8,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      {sql_davg('l_quantity')} AS avg_qty,
      {sql_davg('l_extendedprice')} AS avg_price,
      {sql_davg('l_discount')} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped summary over `lineitem` (~resources table).

    Scale shape: single scan + partial aggregation on a 2-column
    low-cardinality key — no join, map-side combine does nearly all the work,
    shuffle is O(distinct keys × partitions). This is the plan that survives
    100 TB unchanged.
    """
    li = load(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice")
    disc_price = price * (F.lit(1).cast("decimal(8,4)") - dec("l_discount", 4))
    charge = disc_price * (F.lit(1).cast("decimal(8,4)") + dec("l_tax", 4))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_expr(disc_price).alias("sum_disc_price"),
            dsum_expr(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "s1_paginate",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def s1_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: page 3 (20/page) of the orders list endpoint, keyed total order.

    offset(40)+limit(20) is fine for UI-depth pages; deep pagination at scale
    uses the keyset variant (s1_paginate_keyset).
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(40)
        .limit(20)
    )


@query(
    "s1_paginate_keyset",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey > 500
    ORDER BY o_orderkey
    LIMIT 20
    """,
)
def s1_paginate_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 keyset pagination: `key > last_seen LIMIT page` — O(page) at any
    depth, and the predicate pushes down to the parquet scan."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") > 500)
        .orderBy("o_orderkey")
        .limit(20)
    )


@query(
    "s2_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders WHERE o_orderkey = 7
    """,
)
def s2_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: retrieve-by-key (reference: lookup_field uuid/sha1,
    packagedb/api.py:376). Pushed filter + column pruning — at 100 TB this is
    a file-skipping scan when the table is sorted/clustered on the key."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    ).filter(F.col("o_orderkey") == 7)
