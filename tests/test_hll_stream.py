"""Streaming HLL register maintenance: micro-batch MAX-merge must equal the
one-shot batch build over all data, replay must be a no-op, and estimates
derived from the streamed registers must match the batch query's."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.plans.q_sketch import hll_estimate, hll_registers
from purldb_spark.streaming.hll_stream import hll_merge_batch, hll_sink

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
    ]
)

BATCH1 = [("click", u) for u in range(40)] + [("view", u) for u in range(10)]
BATCH2 = [("click", u) for u in range(20, 70)] + [("view", 99)]


def _collect_regs(df):
    return {(r["event_type"], r["idx"]): r["m"] for r in df.collect()}


def test_streamed_registers_equal_batch_build(spark, tmp_path):
    src = str(tmp_path / "incoming")
    regs_dir = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(hll_sink(spark, regs_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(BATCH1, SCHEMA).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(BATCH2, SCHEMA).write.mode("append").parquet(src)
    drain()

    streamed = _collect_regs(spark.read.parquet(regs_dir))
    all_events = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    batch = _collect_regs(hll_registers(all_events))
    assert streamed == batch

    # estimates off the stored registers == estimates off the batch build
    got = {
        r["event_type"]: r["hll_est_e6"]
        for r in hll_estimate(spark.read.parquet(regs_dir)).collect()
    }
    want = {
        r["event_type"]: r["hll_est_e6"]
        for r in hll_estimate(hll_registers(all_events)).collect()
    }
    assert got == want


def test_replay_is_a_noop(spark, tmp_path):
    regs_dir = str(tmp_path / "regs")
    b1 = spark.createDataFrame(BATCH1, SCHEMA)
    hll_merge_batch(spark, b1, regs_dir)
    before = _collect_regs(spark.read.parquet(regs_dir))
    hll_merge_batch(spark, b1, regs_dir)  # crash-recovery rerun
    after = _collect_regs(spark.read.parquet(regs_dir))
    assert before == after


def test_merge_is_order_independent(spark, tmp_path):
    a_dir = str(tmp_path / "a")
    b_dir = str(tmp_path / "b")
    b1 = spark.createDataFrame(BATCH1, SCHEMA)
    b2 = spark.createDataFrame(BATCH2, SCHEMA)
    hll_merge_batch(spark, b1, a_dir)
    hll_merge_batch(spark, b2, a_dir)
    hll_merge_batch(spark, b2, b_dir)
    hll_merge_batch(spark, b1, b_dir)
    assert _collect_regs(spark.read.parquet(a_dir)) == _collect_regs(
        spark.read.parquet(b_dir)
    )
