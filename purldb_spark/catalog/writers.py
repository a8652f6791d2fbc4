"""Catalog table writers — SURVEY §7 step 1 / §1.5 storage mapping.

The reference enforces uniqueness with DB constraints (`unique_together` on
download_url+purl fields, packagedb/models.py:545-555) and serves point
lookups from B-tree indexes. The lake equivalents, applied at WRITE time:

- uniqueness: deterministic first-wins dedup on the unique key before the
  write (stable_dedup — NOT plain dropDuplicates, which picks an arbitrary
  row under parallelism);
- partitioning: low-cardinality dispatch column (`type` for packages) so
  purl-type predicates become partition pruning;
- point lookups: parquet bloom filters + dictionary/min-max stats on the
  hash/name columns (`parquet.bloom.filter.enabled#<col>`), plus
  sortWithinPartitions on the lookup key so min/max file skipping works —
  together these are the B-tree substitute (SURVEY §4);
- sizing: repartition to a target file count per partition so 100 TB writes
  don't produce small-file storms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from purldb_spark.operators.windows import stable_dedup


def write_catalog_table(
    df: DataFrame,
    path: str,
    unique_key: list[str],
    order_by: list[Column] | None = None,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    bloom_columns: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Dedup on the unique key (first under order_by wins), lay out for
    point lookups, write parquet."""
    out = stable_dedup(
        df, unique_key, order_by or [F.asc(c) for c in unique_key]
    )
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    for col in bloom_columns or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_training_shards(
    packed: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
) -> None:
    """Export the curation pipeline's output for trainer consumption:
    one directory per packer shard (`shard=<hex>/`), rows sorted by
    (bin_id, doc_id) inside each file so a trainer streams whole bins
    sequentially without a shuffle of its own.

    Layout contract at 100 TB: shards are independent (bins never span
    shards — operators/assemble.py::pack_greedy), so trainers map one
    reader per shard directory; `max_records_per_file` bounds file size
    for object-store-friendly parallel reads."""
    out = packed.repartition("shard").sortWithinPartitions("bin_id", "doc_id")
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy("shard").parquet(path)
