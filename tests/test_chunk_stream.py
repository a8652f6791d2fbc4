"""Streaming chunk-index maintenance: streamed == batch chunking, embed
worklist exactly-once, replay idempotence (ledger-pattern face)."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.streaming.chunk_stream import chunk_sink, index_chunk_batch

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)

BOILER = "SPDX license header boilerplate shared across many files " * 4
BATCH1 = [
    (1, BOILER + "unique body of document one with its own words"),
    (2, "a short standalone document"),
]
BATCH2 = [
    (3, BOILER + "unique body of document one with its own words"),  # = doc 1
    (4, "entirely fresh content in the second batch of the stream"),
]


def _drain(spark, src, ckpt, sink):
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streamed_equals_batch_and_worklist_exactly_once(spark, tmp_path):
    src = str(tmp_path / "incoming")
    index_dir = str(tmp_path / "chunk_index")
    worklist_dir = str(tmp_path / "embed_worklist")
    ckpt = str(tmp_path / "ckpt")
    sink = chunk_sink(spark, index_dir, worklist_dir)

    spark.createDataFrame(BATCH1, SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, sink)
    spark.createDataFrame(BATCH2, SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, ckpt, sink)

    # streamed chunk table == one-shot batch chunking of all docs
    from purldb_spark.streaming.chunk_stream import chunk_batch

    all_docs = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    want = {
        tuple(r) for r in chunk_batch(all_docs).collect()
    }
    got = {
        tuple(r) for r in spark.read.parquet(index_dir + "/chunks").collect()
    }
    assert got == want

    # worklist: every distinct md5 exactly once, and doc 3's duplicated
    # chunks (identical to doc 1's — same text) scheduled no second time
    wl = spark.read.parquet(worklist_dir).collect()
    md5s = [r.chunk_md5 for r in wl]
    assert len(md5s) == len(set(md5s))
    assert set(md5s) == {r.chunk_md5 for r in spark.read.parquet(index_dir + "/chunks").collect()}
    dup_doc_chunks = {
        r.chunk_md5
        for r in spark.read.parquet(index_dir + "/chunks").collect()
        if r.doc_id == 3
    }
    scheduled_from_3 = [r for r in wl if r.doc_id == 3]
    assert dup_doc_chunks and not scheduled_from_3  # doc 1 already covered all

    # replay idempotence: re-processing batch 2's docs writes nothing
    n_chunks = spark.read.parquet(index_dir + "/chunks").count()
    n_wl = spark.read.parquet(worklist_dir).count()
    index_chunk_batch(
        spark, spark.createDataFrame(BATCH2, SCHEMA), index_dir, worklist_dir
    )
    assert spark.read.parquet(index_dir + "/chunks").count() == n_chunks
    assert spark.read.parquet(worklist_dir).count() == n_wl
