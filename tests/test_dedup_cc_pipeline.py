"""End-to-end wiring of the streaming dedup pipeline: documents stream
into the band index (dedup_stream), the detected near-dup PAIRS stream
into incremental connected components (cc_stream) — the production
topology both modules' docstrings describe — and the final cluster
labels equal the batch operators composed over all documents."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.streaming.cc_stream import cc_sink, current_labels
from purldb_spark.streaming.dedup_stream import dedup_sink

DOC_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)

BASE = "the quick brown fox jumps over the lazy dog today and tomorrow"
BATCHES = [
    [(1, BASE), (9, "completely unrelated words about spark engines here")],
    [(2, BASE.replace("dog", "cat"))],        # near-dup of 1
    [(3, BASE.replace("today", "sunday"))],   # near-dup of 1 and 2
]


def _drain(spark, src, ckpt, sink):
    q = (
        spark.readStream.schema(
            spark.read.parquet(src).schema
        )
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_docs_to_pairs_to_clusters(spark, tmp_path):
    doc_src = str(tmp_path / "docs_in")
    index_dir = str(tmp_path / "band_index")
    pairs_dir = str(tmp_path / "pairs")
    labels_dir = str(tmp_path / "labels")
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")

    for batch in BATCHES:
        spark.createDataFrame(batch, DOC_SCHEMA).write.mode("append").parquet(
            doc_src
        )
        _drain(spark, doc_src, ck1, dedup_sink(spark, index_dir, pairs_dir))
        # second stage: the decisions table IS the pair stream —
        # its endpoints are named (new_id, index_id)
        import os

        if os.path.isdir(pairs_dir):
            _drain(
                spark,
                pairs_dir,
                ck2,
                cc_sink(spark, labels_dir, "new_id", "index_id"),
            )

    labels = {
        (r.node, r.label) for r in current_labels(spark, labels_dir).collect()
    }
    # docs 1, 2, 3 are one cluster labeled by the min id; doc 9 never
    # paired, so it never enters the label table
    assert labels == {(1, 1), (2, 1), (3, 1)}
