"""Custom stateful streaming operator via applyInPandasWithState — the
escape hatch for operators Structured Streaming's built-ins can't express
(brief: "applyInPandasWithState for custom stateful operators").

Implemented here: a per-key running aggregate with optional idle-timeout
flush — the streaming form of the scan-queue bookkeeping (how many events,
total value per entity), one small state row per key.

State discipline at scale: state size is O(active keys); a processing-time
timeout evicts idle keys (the reference's WIP-timestamp reaping,
minecode/models.py:307-311). Output rows emit on every update (Update
mode), so downstream sinks MERGE on the key.

Gotcha (observed): with Trigger.AvailableNow a pending processing-time
timeout keeps the query alive through hundreds of empty micro-batches until
every timer fires — evicting all state before termination. Timeouts
therefore default OFF and belong to continuously-triggered deployments.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("flushed", T.BooleanType()),
    ]
)


def _make_update(idle_timeout_ms: int | None):
    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [total],
                    "flushed": [True],
                }
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "flushed": [False],
            }
        )

    return update


def stateful_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """events(user_id, value, ...) stream -> running per-user totals.
    Requires Update output mode. Pass idle_timeout_ms only on continuous
    triggers (see module gotcha)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
