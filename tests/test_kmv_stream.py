"""Streaming KMV sketch maintenance: micro-batch bottom-k-of-union merges
must equal the one-shot batch build over all data, replay must be a
no-op, and merge order must not matter (the monoid contract)."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from purldb_spark.plans.q_kmv import kmv_sketch
from purldb_spark.streaming.kmv_stream import kmv_merge_batch, kmv_sink

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)


def _ts(day: int):
    return datetime.datetime(2024, 1, day, 12, 0, 0)


BATCH1 = [("click", u, _ts(1 + u % 5)) for u in range(60)] + [
    ("view", u, _ts(1 + u % 3)) for u in range(25)
]
BATCH2 = [("click", u, _ts(2 + u % 6)) for u in range(30, 90)] + [
    ("view", 99, _ts(9))
]


def _collect(df):
    return {(r["event_type"], r["hv"]) for r in df.collect()}


def test_streamed_sketch_equals_batch_build(spark, tmp_path):
    src = str(tmp_path / "incoming")
    sketch_dir = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(kmv_sink(spark, sketch_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(BATCH1, SCHEMA).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(BATCH2, SCHEMA).write.mode("append").parquet(src)
    drain()

    streamed = _collect(spark.read.parquet(sketch_dir))
    batch = _collect(
        kmv_sketch(spark.createDataFrame(BATCH1 + BATCH2, SCHEMA))
    )
    assert streamed == batch
    assert streamed  # non-trivial sketch


def test_replay_noop_and_order_independent(spark, tmp_path):
    b1 = spark.createDataFrame(BATCH1, SCHEMA)
    b2 = spark.createDataFrame(BATCH2, SCHEMA)

    fwd = str(tmp_path / "fwd")
    kmv_merge_batch(spark, b1, fwd)
    kmv_merge_batch(spark, b2, fwd)
    want = _collect(spark.read.parquet(fwd))

    # replaying a batch merges the same values again — bottom-k(A ∪ A)
    kmv_merge_batch(spark, b2, fwd)
    assert _collect(spark.read.parquet(fwd)) == want

    rev = str(tmp_path / "rev")
    kmv_merge_batch(spark, b2, rev)
    kmv_merge_batch(spark, b1, rev)
    assert _collect(spark.read.parquet(rev)) == want
