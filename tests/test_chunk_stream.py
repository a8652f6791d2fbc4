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
    # (ledger reads drop the epoch partition column — physical layout)
    from purldb_spark.streaming.chunk_stream import chunk_batch

    all_docs = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    cols = chunk_batch(all_docs).columns
    want = {
        tuple(r) for r in chunk_batch(all_docs).collect()
    }
    got = {
        tuple(r)
        for r in spark.read.parquet(index_dir + "/chunks").select(cols).collect()
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

    # replay idempotence: re-processing batch 2 under ITS OWN epoch id
    # overwrites its partitions with identical rows — nothing changes
    n_chunks = spark.read.parquet(index_dir + "/chunks").count()
    n_wl = spark.read.parquet(worklist_dir).count()
    chunks_before = {
        tuple(r)
        for r in spark.read.parquet(index_dir + "/chunks").select(cols).collect()
    }
    index_chunk_batch(
        spark,
        spark.createDataFrame(BATCH2, SCHEMA),
        index_dir,
        worklist_dir,
        epoch_id=1,
    )
    assert spark.read.parquet(index_dir + "/chunks").count() == n_chunks
    assert spark.read.parquet(worklist_dir).count() == n_wl
    assert {
        tuple(r)
        for r in spark.read.parquet(index_dir + "/chunks").select(cols).collect()
    } == chunks_before


def test_partial_epoch_partition_heals_on_replay(spark, tmp_path):
    """The ADVICE r10 crash window: a partially committed chunk-ledger
    partition must not make the doc-grain dedup permanently drop the
    doc's remaining chunks — the replay overwrites the partial partition
    with the full row set, and the worklist stays duplicate-free."""
    import os

    from purldb_spark.streaming.chunk_stream import chunk_batch

    index_dir = str(tmp_path / "chunk_index")
    worklist_dir = str(tmp_path / "embed_worklist")
    b1 = spark.createDataFrame(BATCH1, SCHEMA)
    b2 = spark.createDataFrame(BATCH2, SCHEMA)
    index_chunk_batch(spark, b1, index_dir, worklist_dir, epoch_id=0)

    # simulate the crash: epoch 1's ledger partition holds only ONE of
    # doc 4's chunk rows (partial job commit), and no worklist partition
    partial = chunk_batch(b2).filter("doc_id = 4").limit(1)
    partial.write.mode("overwrite").parquet(
        os.path.join(index_dir, "chunks", "batch=1")
    )

    # replay of epoch 1: full rows restored, worklist exactly-once
    index_chunk_batch(spark, b2, index_dir, worklist_dir, epoch_id=1)
    cols = chunk_batch(b2).columns
    want = {
        tuple(r)
        for r in chunk_batch(
            spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
        ).collect()
    }
    got = {
        tuple(r)
        for r in spark.read.parquet(index_dir + "/chunks").select(cols).collect()
    }
    assert got == want
    md5s = [r.chunk_md5 for r in spark.read.parquet(worklist_dir).collect()]
    assert len(md5s) == len(set(md5s))


def test_truncated_epoch_file_is_invisible_to_replay(spark, tmp_path):
    """A REAL crash leaves a torn parquet file (no valid footer), not a
    valid-but-smaller one; a whole-tree read would die in footer reads
    before any batch != epoch filter pruned it. The replay must exclude
    its own epoch's partition at PATH level and heal it by overwrite."""
    import os

    from purldb_spark.streaming.chunk_stream import chunk_batch

    index_dir = str(tmp_path / "chunk_index")
    worklist_dir = str(tmp_path / "embed_worklist")
    b1 = spark.createDataFrame(BATCH1, SCHEMA)
    b2 = spark.createDataFrame(BATCH2, SCHEMA)
    index_chunk_batch(spark, b1, index_dir, worklist_dir, epoch_id=0)

    torn = os.path.join(index_dir, "chunks", "batch=1")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.snappy.parquet"), "wb") as fh:
        fh.write(b"PAR1\x00\x07garbage-with-no-footer")

    index_chunk_batch(spark, b2, index_dir, worklist_dir, epoch_id=1)
    cols = chunk_batch(b2).columns
    want = {
        tuple(r)
        for r in chunk_batch(
            spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
        ).collect()
    }
    got = {
        tuple(r)
        for r in spark.read.parquet(index_dir + "/chunks").select(cols).collect()
    }
    assert got == want
    md5s = [r.chunk_md5 for r in spark.read.parquet(worklist_dir).collect()]
    assert len(md5s) == len(set(md5s))
