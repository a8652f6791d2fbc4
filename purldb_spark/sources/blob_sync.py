"""S6: incremental key/value blob sync (clearcode/sync.py:412-640).

The reference crawls ClearlyDefined "changes" sets and upserts gzipped JSON
blobs keyed by path, skipping unchanged content via an etag/checksum cache
(Cache :333-409; savers :210-258 only write when the checksum differs).

Spark-first shape: one full-outer join between the existing store and the
fetched batch classifies every key as new / changed / unchanged; only
new+changed rows rewrite. Idempotent (re-syncing the same batch is a no-op)
and embarrassingly parallel on the path key — the Postgres get_or_create
loop becomes a single MERGE-shaped job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classify_sync(
    store: DataFrame, fetched: DataFrame, key: str = "path", checksum: str = "checksum"
) -> DataFrame:
    """(key, status) for every fetched row: 'new' | 'changed' | 'unchanged'."""
    s = store.select(F.col(key), F.col(checksum).alias("old_checksum"))
    f = fetched.select(F.col(key), F.col(checksum).alias("new_checksum"))
    j = f.join(s, key, "left_outer")
    return j.select(
        key,
        F.when(F.col("old_checksum").isNull(), "new")
        .when(F.col("old_checksum") != F.col("new_checksum"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )


def apply_sync(
    store: DataFrame, fetched: DataFrame, key: str = "path", checksum: str = "checksum"
) -> DataFrame:
    """The post-sync store snapshot: fetched rows win on their keys (only
    where content actually changed — unchanged rows keep the stored row,
    preserving e.g. original ingest timestamps), untouched keys pass
    through."""
    status = classify_sync(store, fetched, key, checksum)
    to_write = (
        fetched.join(status.filter(F.col("status") != "unchanged"), key, "left_semi")
    )
    kept = store.join(to_write.select(key), key, "left_anti")
    return kept.unionByName(to_write, allowMissingColumns=False)
