"""S10: FederatedCode purl-list publishing sink
(minecode/pipelines/mine_maven.py:32-100 and the 15 sibling pipelines).

The reference walks mined packages and commits per-ecosystem purl list
files to git repos, checkpointing progress. Spark-native shape: a streaming
foreachBatch sink that appends purls partitioned by (type, namespace-ish
shard); the streaming checkpoint IS the pipeline checkpoint (a re-run
resumes after the last committed batch — the same guarantee the reference's
saved offsets give). The final `git add/commit/push` stays an external
post-step exactly as in the reference; Spark owns producing the partitioned
files atomically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_purl_lists(purls: DataFrame, out_dir: str, mode: str = "append") -> None:
    """Batch body: write purl rows partitioned by ecosystem type (one
    directory per ecosystem = one FederatedCode repo), sorted within
    partitions so exported lists diff cleanly commit-to-commit."""
    _write(purls, out_dir, mode)


def _write(purls: DataFrame, out_dir: str, mode: str) -> None:
    (
        purls.select("purl", "type")
        .repartition("type")
        .sortWithinPartitions("purl")
        .write.mode(mode)
        .partitionBy("type")
        .parquet(out_dir)
    )


def purl_sink(out_dir: str):
    """foreachBatch callable for streaming publishes."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        _write(batch, out_dir, "append")

    return process
