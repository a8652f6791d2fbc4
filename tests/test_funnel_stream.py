"""Streaming curation funnel: micro-batches through the 4-gate cascade
with persistent dedup state — batch-face equivalence, replay idempotence,
cross-batch dedup."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.streaming.funnel_stream import (
    funnel_gate_batch,
    funnel_report,
    funnel_sink,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

# 27 words, mean word length 40/9 ~ 4.44 (inside the [4, 5] gate)
_GOOD = " ".join(["gold alpha mint bravo echo crane node delta wolf"] * 3)

BATCH1 = [
    (1, _GOOD, "en"),
    (2, _GOOD + " again and again and again and again more", "zh"),  # lang reject
    (3, "too short", "en"),  # word-count reject
]
BATCH2 = [
    (4, _GOOD, "en"),  # exact dup of seeded doc 1 (cross-batch dedup)
    (5, _GOOD + " plus fresh tail words here making distinct text", "fr"),
]


def _drain(spark, src, seen_dir, dec_dir, ckpt):
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .writeStream.foreachBatch(funnel_sink(spark, seen_dir, dec_dir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_funnel_end_to_end(spark, tmp_path):
    src = str(tmp_path / "incoming")
    seen_dir = str(tmp_path / "seen")
    dec_dir = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(BATCH1, SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, seen_dir, dec_dir, ckpt)
    d1 = {r.doc_id: r for r in spark.read.parquet(dec_dir).collect()}
    assert set(d1) == {1, 2, 3}
    assert d1[1].admitted
    assert not d1[2].g1 and not d1[2].admitted
    assert not d1[3].g2 and not d1[3].admitted
    # every first-seen text passes the dedup gate regardless of other gates
    assert d1[2].g4 and d1[3].g4

    spark.createDataFrame(BATCH2, SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, seen_dir, dec_dir, ckpt)
    d2 = {r.doc_id: r for r in spark.read.parquet(dec_dir).collect()}
    assert set(d2) == {1, 2, 3, 4, 5}
    # doc 4 is byte-identical to seeded doc 1: dedup gate rejects it
    assert not d2[4].g4 and not d2[4].admitted
    assert d2[4].g1 and d2[4].g2  # it fails ONLY the dedup gate
    assert d2[5].admitted

    # the dashboard chains and matches the decision table
    rows = sorted(funnel_report(spark, dec_dir).collect(), key=lambda r: r.stage)
    assert [r.stage for r in rows] == [1, 2, 3, 4]
    assert rows[0].n_in == 5
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_in == prev.n_kept
    assert rows[3].n_kept == sum(1 for r in d2.values() if r.admitted)


def test_streaming_funnel_replay_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "incoming")
    seen_dir = str(tmp_path / "seen")
    dec_dir = str(tmp_path / "decisions")

    b1 = spark.createDataFrame(BATCH1, SCHEMA)
    funnel_gate_batch(spark, b1, seen_dir, dec_dir)
    snap_dec = sorted(map(tuple, spark.read.parquet(dec_dir).collect()))
    snap_seen = sorted(r.h for r in spark.read.parquet(seen_dir).collect())

    # crash-and-replay: the same batch body runs again
    funnel_gate_batch(spark, b1, seen_dir, dec_dir)
    assert sorted(map(tuple, spark.read.parquet(dec_dir).collect())) == snap_dec
    assert sorted(r.h for r in spark.read.parquet(seen_dir).collect()) == snap_seen


def test_streaming_funnel_matches_batch_face_in_doc_id_order(spark, tmp_path):
    """Feeding the corpus in doc_id order, the streamed report equals the
    batch query corpus_funnel_report on the same documents."""
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    sf = "/root/testdata/sf0.001"
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text", "lang")
        .orderBy("doc_id")
        .collect()
    )
    mid = len(docs) // 2
    seen_dir = str(tmp_path / "seen")
    dec_dir = str(tmp_path / "decisions")
    for chunk in (docs[:mid], docs[mid:]):
        funnel_gate_batch(
            spark, spark.createDataFrame(chunk, SCHEMA), seen_dir, dec_dir
        )
    streamed = {
        r.stage: (r.n_in, r.n_kept)
        for r in funnel_report(spark, dec_dir).collect()
    }
    batch = {
        r.stage: (r.n_in, r.n_kept)
        for r in QUERIES["corpus_funnel_report"](spark, sf).collect()
    }
    assert streamed == batch
