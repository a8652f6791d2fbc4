"""Streaming incremental dedup: micro-batches against a persistent band
index — drain, detection, index growth, and replay idempotence."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.streaming.dedup_stream import dedup_sink, index_new_batch

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)

BATCH1 = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (3, "completely different words about spark query engines here now"),
]
BATCH2 = [
    (2, "the quick brown fox jumps over the lazy cat today"),  # near-dup of 1
    (4, "yet another unrelated document of fresh vocabulary entirely"),
]


def test_streaming_incremental_dedup_end_to_end(spark, tmp_path):
    src = str(tmp_path / "incoming")
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(dedup_sink(spark, index_dir, pairs_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1 seeds the index; no prior index -> no pair decisions yet
    spark.createDataFrame(BATCH1, SCHEMA).write.mode("append").parquet(src)
    drain()
    bands = spark.read.parquet(index_dir + "/bands")
    assert {r.doc_id for r in bands.select("doc_id").distinct().collect()} == {1, 3}

    # batch 2: doc 2 is a near-dup of indexed doc 1 -> one decision row
    spark.createDataFrame(BATCH2, SCHEMA).write.mode("append").parquet(src)
    drain()
    pairs = spark.read.parquet(pairs_dir).collect()
    assert {(r.new_id, r.index_id) for r in pairs} == {(2, 1)}
    assert pairs[0].jaccard >= 0.5
    bands = spark.read.parquet(index_dir + "/bands")
    assert {r.doc_id for r in bands.select("doc_id").distinct().collect()} == {
        1, 2, 3, 4,
    }

    # replay the same batch body directly (simulated crash-recovery rerun):
    # anti-joins make it a no-op — no duplicate index keys, no duplicate
    # decisions
    n_bands = bands.count()
    index_new_batch(
        spark, spark.createDataFrame(BATCH2, SCHEMA), index_dir, pairs_dir
    )
    assert spark.read.parquet(index_dir + "/bands").count() == n_bands
    assert spark.read.parquet(pairs_dir).count() == 1
