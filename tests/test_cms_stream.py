"""Streaming CMS maintenance: summed batch-id-keyed partials must equal
the one-shot cell build over all data, replaying an epoch must be a
no-op, and epoch order must not matter (addition is commutative)."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.streaming.cms_stream import (
    cms_cells,
    cms_cells_total,
    cms_merge_batch,
    cms_sink,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

BATCH1 = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the cat sat on the mat"),
    (3, "a quick brown cat"),
]
BATCH2 = [
    (4, "the dog and the fox"),
    (5, "mat mat mat dog"),
]


def _cells(df):
    return {(r["j"], r["col"]): r["cnt"] for r in df.collect()}


def test_streamed_cells_equal_batch_build(spark, tmp_path):
    src = str(tmp_path / "incoming")
    partials_dir = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(cms_sink(spark, partials_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(BATCH1, SCHEMA).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(BATCH2, SCHEMA).write.mode("append").parquet(src)
    drain()

    streamed = _cells(cms_cells_total(spark, partials_dir))
    batch = _cells(cms_cells(spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)))
    assert streamed == batch
    assert sum(streamed.values()) > 0


def test_replay_noop_and_order_independent(spark, tmp_path):
    b1 = spark.createDataFrame(BATCH1, SCHEMA)
    b2 = spark.createDataFrame(BATCH2, SCHEMA)

    fwd = str(tmp_path / "fwd")
    cms_merge_batch(spark, b1, fwd, epoch_id=0)
    cms_merge_batch(spark, b2, fwd, epoch_id=1)
    want = _cells(cms_cells_total(spark, fwd))

    # replaying epoch 1 rewrites its own partition with identical rows —
    # no double count
    cms_merge_batch(spark, b2, fwd, epoch_id=1)
    assert _cells(cms_cells_total(spark, fwd)) == want

    rev = str(tmp_path / "rev")
    cms_merge_batch(spark, b2, rev, epoch_id=1)
    cms_merge_batch(spark, b1, rev, epoch_id=0)
    assert _cells(cms_cells_total(spark, rev)) == want
