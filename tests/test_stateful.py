"""applyInPandasWithState: running per-key totals over a micro-batched
stream, state carried across batches (via checkpoint restart)."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.streaming.stateful import stateful_user_totals

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_stateful_totals_across_batches(spark, tmp_path):
    src = str(tmp_path / "stream")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        # foreachBatch sink: supports checkpoint recovery (memory sink
        # doesn't) and runs on the driver in local mode
        seen: dict[int, tuple[int, float]] = {}

        def collect(batch, epoch_id):
            for r in batch.collect():
                seen[r.user_id] = (r.n_events, r.total_value)

        q = (
            stateful_user_totals(
                spark.readStream.schema(SCHEMA).parquet(src)
            )
            .writeStream.foreachBatch(collect)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return seen

    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], SCHEMA).write.mode(
        "append"
    ).parquet(src)
    out1 = drain()
    assert out1[1] == (2, 15.0)
    assert out1[2] == (1, 1.0)

    # second batch: state persisted via checkpoint, totals accumulate
    spark.createDataFrame([(1, 2.5), (3, 7.0)], SCHEMA).write.mode("append").parquet(
        src
    )
    out2 = drain()
    assert out2[1] == (3, 17.5)  # carried state 2/15.0 + this batch
    assert out2[3] == (1, 7.0)
    assert 2 not in out2  # idle user: no update this batch (no timeout yet)
