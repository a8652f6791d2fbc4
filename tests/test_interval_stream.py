"""Streaming interval-join maintenance: batch-id-keyed partials must fold
to the one-shot batch aggregate over all data, replaying an epoch must be
a no-op, and epoch arrival order must not matter."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.streaming.interval_stream import (
    interval_bins,
    interval_merge_batch,
    interval_partial,
    interval_sink,
    interval_totals,
)

PART_SCHEMA = T.StructType(
    [
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)
FACT_SCHEMA = T.StructType(
    [
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
    ]
)

# two overlapping brand intervals + one disjoint: [901, 1850], [1700, 2500],
# [9000, 9100] cents after *100
PARTS = [
    ("Brand#A", 9.01),
    ("Brand#A", 18.50),
    ("Brand#B", 17.00),
    ("Brand#B", 25.00),
    ("Brand#C", 90.00),
    ("Brand#C", 91.00),
]
# facts: inside A only, inside A∩B, inside B only, inside none, inside C
BATCH1 = [(1.0, 10.00), (2.0, 17.50), (3.0, 24.99), (4.0, 50.00)]
BATCH2 = [(5.0, 90.50), (6.0, 18.00), (7.0, 9.01), (8.0, 25.01)]


def _totals(df):
    return {
        r["p_brand"]: (r["n_matches"], r["sum_qty"], r["sum_price_cents"])
        for r in df.collect()
    }


def test_streamed_totals_equal_batch_aggregate(spark, tmp_path):
    src = str(tmp_path / "incoming")
    partials_dir = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")
    bins = interval_bins(
        spark.createDataFrame(PARTS, PART_SCHEMA)
    ).localCheckpoint(eager=True)

    def drain():
        q = (
            spark.readStream.schema(FACT_SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(interval_sink(spark, bins, partials_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(BATCH1, FACT_SCHEMA).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(BATCH2, FACT_SCHEMA).write.mode("append").parquet(src)
    drain()

    streamed = _totals(interval_totals(spark, partials_dir))
    batch = _totals(
        interval_partial(
            spark.createDataFrame(BATCH1 + BATCH2, FACT_SCHEMA), bins
        )
    )
    assert streamed == batch
    # the overlap fact (17.50) must count for BOTH A and B; the disjoint
    # fact (50.00) for neither
    assert streamed["Brand#A"][0] == 4  # 10.00, 17.50, 18.00, 9.01
    assert streamed["Brand#B"][0] == 3  # 17.50, 24.99, 18.00
    assert streamed["Brand#C"][0] == 1  # 90.50


def test_replay_is_noop_and_order_independent(spark, tmp_path):
    bins = interval_bins(
        spark.createDataFrame(PARTS, PART_SCHEMA)
    ).localCheckpoint(eager=True)
    b1 = spark.createDataFrame(BATCH1, FACT_SCHEMA)
    b2 = spark.createDataFrame(BATCH2, FACT_SCHEMA)

    fwd = str(tmp_path / "fwd")
    interval_merge_batch(spark, b1, bins, fwd, epoch_id=0)
    interval_merge_batch(spark, b2, bins, fwd, epoch_id=1)
    want = _totals(interval_totals(spark, fwd))

    # replaying epoch 0 rewrites its own partition with identical rows
    interval_merge_batch(spark, b1, bins, fwd, epoch_id=0)
    assert _totals(interval_totals(spark, fwd)) == want

    # epochs landing in the opposite order fold to the same totals
    rev = str(tmp_path / "rev")
    interval_merge_batch(spark, b2, bins, rev, epoch_id=1)
    interval_merge_batch(spark, b1, bins, rev, epoch_id=0)
    assert _totals(interval_totals(spark, rev)) == want
