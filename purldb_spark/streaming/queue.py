"""Mining dataflow — SURVEY §2.11 (T1-T6).

The reference's "streams" are Postgres work-queue tables consumed with
SELECT ... FOR UPDATE SKIP LOCKED in priority order (minecode/models.py:
275-311). The Spark-native equivalents:

- T1/T2 visit/map loops  -> iterate-to-fixpoint batch over a frontier frame
  (crawl recursion is a loop over a DataFrame, each wave one distributed
  job, discovered URIs anti-joined against the seen set)
- T3 queue consumption   -> micro-batches; ordering by priority inside each
  batch; idempotent keyed MERGE replaces row locks
- T4 scan-queue states   -> state-machine column transitions applied as a
  keyed merge in foreachBatch
- T5 re-visit policy     -> processing-time age predicate per trigger
- T6 watch               -> scheduled incremental anti-join on known versions

No event-time semantics exist in the reference (no watermarks/windows); the
streaming surface here is Structured Streaming micro-batches with
``Trigger.AvailableNow`` for deterministic tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ScannableURI 8-state machine (minecode/models.py:702-724)
SCAN_NEW, SCAN_SUBMITTED, SCAN_IN_PROGRESS, SCAN_COMPLETED = 0, 1, 2, 3
SCAN_INDEXED, SCAN_FAILED, SCAN_TIMEOUT, SCAN_INDEX_FAILED = 4, 5, 6, 7


def visit_to_fixpoint(
    seeds: DataFrame,
    visit: Callable[[DataFrame], DataFrame],
    uri_col: str = "uri",
    max_rounds: int = 25,
) -> DataFrame:
    """T1: the crawl loop (run_visit.py:143-227) as iterate-to-fixpoint.

    `visit` maps a frontier of URIs to newly-discovered URIs (one
    distributed wave, typically mapPartitions-fetch + parse). Discovered
    URIs already seen are anti-joined out; the loop ends when a wave
    discovers nothing new. Each wave is checkpointed via localCheckpoint to
    keep the plan from growing unboundedly (lineage explosion is the classic
    iterative-Spark failure at scale)."""
    seen = seeds.select(uri_col).dropDuplicates().localCheckpoint(eager=True)
    frontier = seen
    for _ in range(max_rounds):
        # r15: ONE job per wave instead of three.  The wave's checkpoint is
        # lazy and the count() both materializes it (truncating lineage —
        # the reason the checkpoint exists) and answers the fixpoint test;
        # the eager checkpoint + separate isEmpty() paid two extra job
        # round trips per wave, pure scheduling overhead on every corpus.
        # The running `seen` union is checkpointed lazily too — it
        # materializes inside the NEXT wave's count job (or the caller's
        # final action), one fewer job per wave with identical lineage
        # truncation.
        discovered = (
            visit(frontier)
            .select(uri_col)
            .dropDuplicates()
            .join(seen, uri_col, "left_anti")
            .localCheckpoint(eager=False)
        )
        if discovered.count() == 0:
            break
        seen = seen.unionByName(discovered).localCheckpoint(eager=False)
        frontier = discovered
    return seen


def take_batch(queue: DataFrame, batch_size: int, ready_pred=None) -> DataFrame:
    """T3: priority-ordered batch claim (minecode/models.py:272-311). No
    SKIP LOCKED needed — consumers are partition-parallel and the state
    update is an idempotent keyed merge."""
    q = queue.filter(ready_pred) if ready_pred is not None else queue
    return q.orderBy(F.desc("priority"), F.desc("uri")).limit(batch_size)


def transition(
    queue: DataFrame,
    processed: DataFrame,
    key: str,
    status_col: str = "scan_status",
    new_status: int = SCAN_COMPLETED,
) -> DataFrame:
    """T4: state-machine transition as a keyed merge — rows named in
    `processed` move to `new_status`, everything else is untouched. Applying
    the same batch twice yields the same table (idempotence replaces
    locking)."""
    marks = processed.select(key).dropDuplicates().withColumn("__hit", F.lit(True))
    return (
        queue.join(marks, key, "left_outer")
        .withColumn(
            status_col,
            F.when(F.col("__hit"), F.lit(new_status)).otherwise(F.col(status_col)),
        )
        .drop("__hit")
    )


def revisitables(queue: DataFrame, hours: int = 240) -> DataFrame:
    """T5: re-visit staleness policy (minecode/models.py:241-252) — a
    processing-time age predicate evaluated per trigger."""
    age = F.current_timestamp() - F.expr(f"INTERVAL {hours} HOURS")
    return queue.filter(
        F.col("last_visit_date").isNull() | (F.col("last_visit_date") < age)
    )


def watch_new_versions(known: DataFrame, fetched: DataFrame, keys: list[str]) -> DataFrame:
    """T6: PackageWatch diffing (packagedb/models.py:1285-1454) — fetched
    versions anti-joined against known ones; the remainder is the enqueue
    set."""
    return fetched.join(known.select(*keys).dropDuplicates(), keys, "left_anti")


def stream_queue(
    spark: SparkSession,
    source_dir: str,
    schema,
    process_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
):
    """T2/T3 micro-batch consumption: a file-backed queue consumed with
    AvailableNow (deterministic drain in tests; continuous triggers in
    production) into a foreachBatch that applies the idempotent merge."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
