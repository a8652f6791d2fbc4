"""Streaming-shaped queries runnable (and oracle-checkable) in batch mode.

The actual Structured Streaming execution of the same expressions is tested
in tests/test_streaming_windows.py (watermark + append-mode emission); the
driver-facing entries here prove the event-time semantics against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query
from purldb_spark.streaming.queue import (
    SCAN_COMPLETED,
    SCAN_FAILED,
    SCAN_NEW,
    take_batch,
    transition,
    visit_to_fixpoint,
)
from purldb_spark.streaming.windows import tumbling_rollup


@query(
    "t_tumbling_rollup_daily",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
           time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def t_tumbling_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time rollup per event type — the batch face of
    the streaming aggregation (identical expression runs under a watermark
    in streaming mode; Spark's window() and DuckDB's time_bucket share epoch
    alignment)."""
    return tumbling_rollup(load(spark, sf_dir, "events"))


@query(
    "t_fixpoint_frontier",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT src, dst FROM (
        SELECT CAST(s_suppkey AS BIGINT) AS src,
               CAST(s_suppkey * 2 AS BIGINT) AS dst FROM supplier
        UNION ALL
        SELECT CAST(s_suppkey AS BIGINT), CAST(s_suppkey * 2 + 1 AS BIGINT)
        FROM supplier
      ) WHERE dst <= (SELECT max(s_suppkey) FROM supplier)
    ),
    seen(uri) AS (
      SELECT DISTINCT CAST(n_nationkey + 1 AS BIGINT) FROM nation
      UNION
      SELECT e.dst FROM seen JOIN edges e ON e.src = seen.uri
    )
    SELECT uri FROM seen
    """,
)
def t_fixpoint_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1's crawl loop (streaming/queue.py visit_to_fixpoint, the batch
    equivalent of run_visit.py:143-227) driven to a deterministic answer:
    the link graph is the binary tree k -> {2k, 2k+1} over supplier keys,
    seeds are the nation keys + 1, and the final seen set is exactly the
    recursive closure DuckDB computes with WITH RECURSIVE."""
    supplier = load(spark, sf_dir, "supplier")
    max_key = supplier.select(F.max("s_suppkey").cast("long").alias("m"))
    k = F.col("s_suppkey").cast("long")
    edges = (
        supplier.select(k.alias("src"), (k * 2).alias("dst"))
        .unionByName(supplier.select(k.alias("src"), (k * 2 + 1).alias("dst")))
        .join(F.broadcast(max_key), F.col("dst") <= F.col("m"), "left_semi")
    )
    seeds = load(spark, sf_dir, "nation").select(
        (F.col("n_nationkey") + 1).cast("long").alias("uri")
    )

    def visit(frontier: DataFrame) -> DataFrame:
        return frontier.join(
            edges, frontier["uri"] == edges["src"], "inner"
        ).select(F.col("dst").alias("uri"))

    return visit_to_fixpoint(seeds, visit)


@query(
    "t_queue_states",
    oracle="""
    WITH q AS (
      SELECT 'uri-' || lpad(CAST(o_orderkey AS VARCHAR), 9, '0') AS uri,
             CAST(substring(o_orderpriority, 1, 1) AS INT) AS priority,
             o_orderkey AS k
      FROM orders
    ),
    ranked AS (
      SELECT uri, priority, k,
             row_number() OVER (ORDER BY priority DESC, uri DESC) AS rn
      FROM q
    )
    SELECT uri, priority,
           CASE WHEN rn <= 1500 THEN
                  (CASE WHEN k % 7 = 0 THEN 5 ELSE 3 END)
                ELSE 0 END AS scan_status
    FROM ranked
    """,
)
def t_queue_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3/T4's post-drain queue table: three priority-ordered claim
    batches (take_batch) of 500, each transitioned COMPLETED except every
    7th key FAILED (transition's idempotent keyed merge,
    minecode/models.py:272-311 + 702-724).  The cumulative claim set is
    the top 1500 rows in the static (priority DESC, uri DESC) order, which
    is what the oracle ranks directly."""
    orders = load(spark, sf_dir, "orders")
    q = orders.select(
        F.concat(
            F.lit("uri-"), F.lpad(F.col("o_orderkey").cast("string"), 9, "0")
        ).alias("uri"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("priority"),
        F.col("o_orderkey").alias("k"),
        F.lit(SCAN_NEW).alias("scan_status"),
    )
    for _ in range(3):
        batch = take_batch(q, 500, F.col("scan_status") == SCAN_NEW)
        q = transition(
            q, batch.filter(F.col("k") % 7 != 0), "uri", new_status=SCAN_COMPLETED
        )
        q = transition(
            q, batch.filter(F.col("k") % 7 == 0), "uri", new_status=SCAN_FAILED
        )
        q = q.localCheckpoint(eager=False)
    return q.select("uri", "priority", "scan_status")
