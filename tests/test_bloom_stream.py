"""Streaming Bloom gate: micro-batches against the persistent bit table —
drain, gating decisions, bounded state, and replay idempotence."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.plans.q_bloom import _K, _M
from purldb_spark.streaming.bloom_stream import bloom_gate_batch, bloom_sink

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)

BATCH1 = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (3, "completely different words about spark query engines here now"),
]
BATCH2 = [
    (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
    (4, "yet another unrelated document of fresh vocabulary entirely"),
]


def test_streaming_bloom_gate_end_to_end(spark, tmp_path):
    src = str(tmp_path / "incoming")
    bits_dir = str(tmp_path / "bits")
    dec_dir = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(bloom_sink(spark, bits_dir, dec_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1 seeds the filter: nothing can be a dup yet
    spark.createDataFrame(BATCH1, SCHEMA).write.mode("append").parquet(src)
    drain()
    d1 = {r.doc_id: r.maybe_dup for r in spark.read.parquet(dec_dir).collect()}
    assert d1 == {1: False, 3: False}
    n_bits = spark.read.parquet(bits_dir).count()
    assert 0 < n_bits <= min(_K * len(BATCH1), _M)

    # batch 2: doc 2 is byte-identical to seeded doc 1 -> ALL k positions
    # hit (a Bloom filter has no false negatives); doc 4 is fresh
    spark.createDataFrame(BATCH2, SCHEMA).write.mode("append").parquet(src)
    drain()
    d2 = {r.doc_id: r.maybe_dup for r in spark.read.parquet(dec_dir).collect()}
    assert d2[2] is True
    assert d2[4] is False
    assert len(d2) == 4

    # replay the same batch body directly (simulated crash-recovery rerun):
    # deterministic positions + anti-joins make it a no-op
    n_bits = spark.read.parquet(bits_dir).count()
    n_dec = spark.read.parquet(dec_dir).count()
    bloom_gate_batch(
        spark, spark.createDataFrame(BATCH2, SCHEMA), bits_dir, dec_dir
    )
    assert spark.read.parquet(bits_dir).count() == n_bits
    assert spark.read.parquet(dec_dir).count() == n_dec

    # state bound: the bit table can never exceed m rows
    assert spark.read.parquet(bits_dir).count() <= _M
