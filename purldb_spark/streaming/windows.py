"""Event-time windowed rollups — beyond the reference (purldb has no
event-time processing, SURVEY §2.11), but required for a training-data
pipeline ingesting event streams.

`tumbling_rollup` is written once and runs in BOTH modes:
- batch: plain groupBy(window(...)) over a static frame (oracle-checkable),
- streaming: the same expression after `withWatermark`, emitting finalized
  windows only (late data beyond the watermark is dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 day",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window count+sum per group; window flattened to start/end
    timestamps so the schema is plain-columnar for sinks and oracles."""
    w = F.window(F.col(ts_col), duration)
    return (
        events.groupBy(w.alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "sum_value",
        )
    )


def streaming_tumbling_rollup(
    stream: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 day",
    watermark: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Streaming variant: watermark bounds state and defines lateness; append
    mode emits each window once it is final (watermark passes window end)."""
    return tumbling_rollup(
        stream.withWatermark(ts_col, watermark), ts_col, duration, group_cols
    )
