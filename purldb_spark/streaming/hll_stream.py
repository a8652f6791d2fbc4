"""Streaming face of the HyperLogLog distinct sketch (plans/q_sketch.py):
events arrive as a stream, each micro-batch computes ITS OWN register
table (plans/q_sketch.hll_registers — the same expression the batch query
proves against the DuckDB oracle) and MAX-merges it into the persistent
register table; estimates are derived from the stored registers with the
batch query's identical fold (hll_estimate).

This is what makes HLL the production distinct-count structure rather
than a one-shot query: registers are a commutative, idempotent monoid
under element-wise MAX, so

  * micro-batches merge in any order to the same table (out-of-order
    delivery is free),
  * a crashed and re-run micro-batch merges the SAME registers again and
    changes nothing — replay idempotence needs no anti-join bookkeeping,
    unlike the bloom/funnel streams' ledgers, and
  * the streamed table after N batches is bit-identical to one batch
    build over the union of all batches (pinned by
    tests/test_hll_stream.py).

At 100 TB the stored table stays <= event_types x 64 rows forever; the
per-batch cost is one map-side-combined groupBy over the batch plus a
<= 64-row-per-type merge — state never grows with corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.plans.q_sketch import hll_registers


def hll_merge_batch(
    spark: SparkSession, batch_events: DataFrame, regs_dir: str
) -> None:
    """One micro-batch body: build the batch's register table and fold it
    into the stored one by element-wise MAX (idempotent, so no replay
    ledger is needed). The merged frame is tiny (types x 64 rows) and is
    eagerly checkpointed before the overwrite so the write never reads the
    directory it replaces."""
    regs = hll_registers(batch_events.select("event_type", "user_id"))
    if os.path.isdir(regs_dir):
        stored = spark.read.parquet(regs_dir)
        regs = (
            stored.unionByName(regs)
            .groupBy("event_type", "idx")
            .agg(F.max("m").alias("m"))
        )
    merged = regs.localCheckpoint(eager=True)
    # plain-parquet overwrite is NOT crash-atomic (a kill between delete
    # and commit can lose the table); production state tables use a
    # transactional format (Delta/Iceberg) or staging-dir + rename. The
    # monoid makes RECOVERY trivial either way: rebuild by re-merging any
    # batch subset — but only a transactional write removes the loss
    # window itself.
    merged.write.mode("overwrite").parquet(regs_dir)


def hll_sink(spark: SparkSession, regs_dir: str):
    """foreachBatch callable wiring hll_merge_batch into a streaming
    query."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        hll_merge_batch(spark, batch, regs_dir)

    return process
