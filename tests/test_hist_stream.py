"""Streaming histogram maintenance (the batch-side law is
sketch_histogram_merge): summed batch-id-keyed partials must equal the
one-shot bin build over all data, replay must be a no-op, and the
quantiles read off the streamed histogram must equal the batch shape's."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.streaming.hist_stream import (
    hist_bins,
    hist_merge_batch,
    hist_sink,
    hist_total,
    quantile_upper_edges,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BATCH1 = [(1, 1.25), (2, 7.90), (3, 55.10), (4, 2.56), (5, 0.01)]
BATCH2 = [(6, 99.99), (7, 7.90), (8, 0.02), (9, 312.45)]


def _bins(df):
    return {r["bin"]: r["cnt"] for r in df.collect()}


def test_streamed_hist_equals_batch_and_replay_noop(spark, tmp_path):
    src = str(tmp_path / "incoming")
    partials_dir = str(tmp_path / "partials")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(hist_sink(spark, partials_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(BATCH1, SCHEMA).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(BATCH2, SCHEMA).write.mode("append").parquet(src)
    drain()

    all_rows = BATCH1 + BATCH2
    streamed = _bins(hist_total(spark, partials_dir))
    batch = _bins(hist_bins(spark.createDataFrame(all_rows, SCHEMA)))
    assert streamed == batch

    # quantiles off the streamed histogram == off the one-shot build
    n = len(all_rows)
    sq = {
        r["pct"]: r["est_hi_cents"]
        for r in quantile_upper_edges(
            hist_total(spark, partials_dir), n, (50, 95, 99)
        ).collect()
    }
    bq = {
        r["pct"]: r["est_hi_cents"]
        for r in quantile_upper_edges(
            hist_bins(spark.createDataFrame(all_rows, SCHEMA)), n, (50, 95, 99)
        ).collect()
    }
    assert sq == bq
    # one-sided estimator sanity: est upper edge >= the exact value
    import math

    cents = sorted(int(round(v * 100)) for _, v in all_rows)
    for p, est in sq.items():
        exact = cents[math.ceil(p * n / 100) - 1]
        assert est >= exact

    # replaying an epoch overwrites its own partition: totals unchanged
    before = _bins(hist_total(spark, partials_dir))
    hist_merge_batch(
        spark, spark.createDataFrame(BATCH2, SCHEMA), partials_dir, 1
    )
    assert _bins(hist_total(spark, partials_dir)) == before
