"""Streaming temporal (as-of) join: micro-batched decisions must equal the
batch j14 query when batches respect event-time order, state stays one row
per user, replay is a no-op, and late views do not rewrite history."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from purldb_spark.plans.registry import QUERIES, load_inventory
from purldb_spark.streaming.asof_stream import asof_join_batch, asof_sink

load_inventory()

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_T0 = dt.datetime(2024, 1, 1)


def _sec(s):
    return _T0 + dt.timedelta(seconds=s)


# two users, views and clicks interleaved; split at t=30 into two batches
EVENTS = [
    (1, _sec(5), 1, "view", 0.0, "{}"),
    (2, _sec(10), 1, "click", 0.0, "{}"),
    (3, _sec(12), 2, "click", 0.0, "{}"),     # no prior view -> NULLs
    (4, _sec(20), 2, "view", 0.0, "{}"),
    (5, _sec(25), 1, "view", 0.0, "{}"),
    # ---- batch boundary (t=30) ----
    (6, _sec(35), 1, "click", 0.0, "{}"),     # must see view 5 from batch 1
    (7, _sec(40), 2, "click", 0.0, "{}"),     # must see view 4 from batch 1
    (8, _sec(45), 2, "view", 0.0, "{}"),
    (9, _sec(50), 2, "click", 0.0, "{}"),     # sees in-batch view 8
    (10, _sec(41), 1, "purchase", 0.0, "{}"),  # ignored type
]


def _decisions(spark, dec_dir):
    return {
        r["click_event_id"]: (r["view_event_id"], r["gap_us"])
        for r in spark.read.parquet(dec_dir).collect()
    }


def test_streamed_equals_batch_query(spark, tmp_path):
    src = str(tmp_path / "incoming")
    state = str(tmp_path / "state")
    dec = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")
    sf = str(tmp_path / "sf")

    def drain():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(asof_sink(spark, state, dec))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [e for e in EVENTS if e[1] < _sec(30)]
    b2 = [e for e in EVENTS if e[1] >= _sec(30)]
    spark.createDataFrame(b1, SCHEMA).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(b2, SCHEMA).write.mode("append").parquet(src)
    drain()

    # batch face over ALL events
    spark.createDataFrame(EVENTS, SCHEMA).write.parquet(f"{sf}/events.parquet")
    want = {
        r["click_event_id"]: (r["view_event_id"], r["gap_us"])
        for r in QUERIES["j14_asof_join"](spark, sf).collect()
    }
    assert _decisions(spark, dec) == want

    # temporal state is ONE row per user: the argmax view
    st = {r["user_id"]: r["view_event_id"]
          for r in spark.read.parquet(state).collect()}
    assert st == {1: 5, 2: 8}


def test_replay_is_noop_and_late_views_do_not_rewrite(spark, tmp_path):
    state = str(tmp_path / "state")
    dec = str(tmp_path / "decisions")
    b1 = spark.createDataFrame(
        [e for e in EVENTS if e[1] < _sec(30)], SCHEMA
    )
    asof_join_batch(spark, b1, state, dec)
    before_dec = _decisions(spark, dec)
    before_state = {
        (r["user_id"], r["view_event_id"], r["view_us"])
        for r in spark.read.parquet(state).collect()
    }
    # crash-recovery rerun of the same batch
    asof_join_batch(spark, b1, state, dec)
    assert _decisions(spark, dec) == before_dec
    assert {
        (r["user_id"], r["view_event_id"], r["view_us"])
        for r in spark.read.parquet(state).collect()
    } == before_state

    # a LATE view (ts before click 2's, arriving after it was decided)
    # must not rewrite the ledger; it only updates state going forward
    late = spark.createDataFrame([(99, _sec(8), 1, "view", 0.0, "{}")], SCHEMA)
    asof_join_batch(spark, late, state, dec)
    assert _decisions(spark, dec)[2] == before_dec[2]  # still view 1
    st = {r["user_id"]: r["view_event_id"]
          for r in spark.read.parquet(state).collect()}
    assert st[1] == 5  # view 5 (t=25) still the argmax, late t=8 ignored
