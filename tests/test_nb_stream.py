"""NB streaming face (streaming/nb_stream.py, the 17th face): per-epoch
sufficient-statistics shards SUM-merge to the exact single-pass model
(the counts monoid), through a REAL availableNow stream, with the
shard-ledger replay-idempotence contract."""

from __future__ import annotations

from purldb_spark.operators.nb import nb_train
from purldb_spark.streaming.nb_stream import (
    current_nb_model,
    nb_sink,
    train_nb_batch,
)

SCHEMA = "doc_id long, text string, y long"

_DOCS = [
    (0, "good clean prose with useful words", 1),
    (1, "good article nice words more words", 1),
    (2, "spam spam buy now buy spam", 0),
    (3, "buy spam now now now", 0),
    (4, "clean useful article", 1),
    (5, "novel tokens arrive later", 1),
]


def _model_rows(df):
    return sorted(
        (r.label, r.bucket, r.token_cnt, r.class_docs, r.class_tokens)
        for r in df.collect()
    )


def test_streamed_shards_equal_single_pass_model(spark, tmp_path):
    src = str(tmp_path / "incoming")
    stats_dir = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ckpt")
    sink = nb_sink(spark, stats_dir, "y", "text", 4)

    def drain():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for lo, hi in ((0, 2), (2, 5), (5, 6)):  # three micro-batches
        spark.createDataFrame(_DOCS[lo:hi], SCHEMA).write.mode(
            "append"
        ).parquet(src)
        drain()

    streamed = current_nb_model(spark, stats_dir)
    direct = nb_train(
        spark, spark.createDataFrame(_DOCS, SCHEMA), "y", "text", 4
    )
    assert _model_rows(streamed) == _model_rows(direct)


def test_replayed_epoch_rewrites_identical_shard(spark, tmp_path):
    stats_dir = str(tmp_path / "stats")
    b0 = spark.createDataFrame(_DOCS[:3], SCHEMA)
    b1 = spark.createDataFrame(_DOCS[3:], SCHEMA)
    train_nb_batch(spark, b0, "y", "text", 4, stats_dir, epoch_id=0)
    train_nb_batch(spark, b1, "y", "text", 4, stats_dir, epoch_id=1)
    before = _model_rows(current_nb_model(spark, stats_dir))
    # replayed epoch 1 (partition overwrite) changes nothing
    train_nb_batch(spark, b1, "y", "text", 4, stats_dir, epoch_id=1)
    assert _model_rows(current_nb_model(spark, stats_dir)) == before


def test_empty_batch_writes_zero_shard_not_poison(spark, tmp_path):
    stats_dir = str(tmp_path / "stats")
    train_nb_batch(
        spark,
        spark.createDataFrame([], SCHEMA),
        "y",
        "text",
        4,
        stats_dir,
        epoch_id=0,
    )
    rows = _model_rows(current_nb_model(spark, stats_dir))
    assert len(rows) == 8 and all(r[2] == 0 for r in rows)
