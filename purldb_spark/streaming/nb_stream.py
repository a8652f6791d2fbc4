"""Naive Bayes ingest stream — the streaming face of the fifth trainer
family (operators/nb.py): per micro-batch, write the batch's OWN
sufficient-statistics shard; the current model is the SUM of all shards.

State taxonomy: shard ledger (the sketch_hll_merge_daily recipe applied
to a trainer) — counts form a commutative monoid under +, so per-epoch
shards merge into the exact single-pass model without re-reading any
text (engine-checked by the nb_merge_shards oracle query). Replay
idempotence is the epoch-partition overwrite: a replayed micro-batch
recomputes the identical shard and rewrites its own partition, changing
nothing. There is no compaction protocol to share: a shard is C x B
bounded rows, so the ledger grows by a fixed-size increment per epoch
and a periodic roll-up (sum shards below a watermark into one) is an
ordinary batch job over tiny data.

At 100 TB: tokenize is map-only inside the micro-batch; the per-batch
combine ships at most classes x buckets x partitions rows; model reads
aggregate a few thousand integer rows however large the corpus that
produced them. The 17th face in the streaming catalogue (DESIGN.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.operators.nb import nb_train


def train_nb_batch(
    spark: SparkSession,
    batch: DataFrame,
    label_col: str,
    text_col: str,
    n_buckets: int,
    stats_dir: str,
    epoch_id: int = 0,
    n_classes: int = 2,
) -> None:
    """One micro-batch body: count this batch's sufficient statistics
    (dense class x bucket grid, operators/nb.nb_train) and overwrite
    the epoch's shard partition."""
    nb_train(
        spark, batch, label_col, text_col, n_buckets, n_classes
    ).write.mode("overwrite").parquet(
        os.path.join(stats_dir, f"batch={int(epoch_id)}")
    )


def current_nb_model(spark: SparkSession, stats_dir: str) -> DataFrame:
    """The up-to-date model: SUM of every shard's counts on the dense
    grid — equal to a single-pass train over all ingested batches by
    the monoid algebra (nb_merge_shards proves this engine-checked).
    Returns the same schema as nb_train."""
    shards = spark.read.option("basePath", stats_dir).parquet(stats_dir)
    return shards.groupBy("label", "bucket").agg(
        F.sum("token_cnt").cast("long").alias("token_cnt"),
        F.sum("class_docs").cast("long").alias("class_docs"),
        F.sum("class_tokens").cast("long").alias("class_tokens"),
    )


def nb_sink(
    spark: SparkSession,
    stats_dir: str,
    label_col: str,
    text_col: str,
    n_buckets: int,
    n_classes: int = 2,
):
    """foreachBatch body for a Structured Streaming writeStream."""

    def body(batch: DataFrame, epoch_id: int) -> None:
        train_nb_batch(
            spark,
            batch,
            label_col,
            text_col,
            n_buckets,
            stats_dir,
            epoch_id=epoch_id,
            n_classes=n_classes,
        )

    return body
