"""Streaming-shaped queries runnable (and oracle-checkable) in batch mode.

The actual Structured Streaming execution of the same expressions is tested
in tests/test_streaming_windows.py (watermark + append-mode emission); the
driver-facing entries here prove the event-time semantics against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query
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
