"""Streaming face of the KMV bottom-k distinct sketch (plans/q_kmv.py):
events arrive as a stream, each micro-batch computes ITS OWN bottom-k
sketch per event type (plans/q_kmv.kmv_sketch — the same expression the
batch query proves against the DuckDB oracle) and folds it into the
persistent sketch table by bottom-k-of-union; set-operation estimates are
derived from the stored sketches with the batch query's identical algebra.

Like the HLL registers (hll_stream) and the as-of argmax state
(asof_stream), the KMV synopsis is a commutative, IDEMPOTENT monoid —
bottom-k(A ∪ A) = bottom-k(A) — so micro-batches merge in any order to
the same table and a crashed-and-replayed batch changes nothing: no
anti-join ledger, no batch-id partials. This idempotence is exactly why
Beyer et al.'s synopsis is the production structure for per-shard /
per-day distinct tracking: shards merge pairwise in any tree shape.

At 100 TB the stored table stays <= event_types x k rows forever; the
per-batch cost is the batch's own two-phase bottom-k plus a
<= 2k-row-per-type merge — state never grows with corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from purldb_spark.plans.q_kmv import _KMV_K, kmv_sketch


def kmv_merge_batch(
    spark: SparkSession, batch_events: DataFrame, sketch_dir: str
) -> None:
    """One micro-batch body: build the batch's bottom-k sketch and fold it
    into the stored one by bottom-k of the DISTINCT union (idempotent, so
    no replay ledger is needed). The merged frame is tiny (types x k
    rows) and is eagerly checkpointed before the overwrite so the write
    never reads the directory it replaces."""
    sk = kmv_sketch(batch_events.select("event_type", "user_id", "ts"))
    if os.path.isdir(sketch_dir):
        stored = spark.read.parquet(sketch_dir)
        w = Window.partitionBy("event_type").orderBy("hv")
        sk = (
            stored.unionByName(sk)
            .distinct()
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= _KMV_K)
            .select("event_type", "hv")
        )
    merged = sk.localCheckpoint(eager=True)
    # same crash-atomicity caveat as hll_stream: plain-parquet overwrite
    # is not transactional; the monoid makes recovery a re-merge of any
    # batch subset, but only Delta/Iceberg removes the loss window itself.
    merged.write.mode("overwrite").parquet(sketch_dir)


def kmv_sink(spark: SparkSession, sketch_dir: str):
    """foreachBatch callable wiring kmv_merge_batch into a streaming
    query."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        kmv_merge_batch(spark, batch, sketch_dir)

    return process
