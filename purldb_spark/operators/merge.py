"""Merge / upsert semantics — SURVEY §2.10 (M1-M6).

The reference's merge_packages (minecode/model_utils.py:70-228) encodes
per-field rules when new mined data meets an existing package row:

  - fill-if-null: existing empty/null -> take the new value
  - replace: if the new data's mining level outranks the existing one,
    overwrite listed fields (model_utils.py:280-319)
  - checksum conflict: both sides non-null and different -> the row is an
    error, not a merge (model_utils.py:123-141)
  - child tables (parties, dependencies): replaced wholesale on replace

Spark-first shape: ONE full-outer join on the upsert key plus per-field CASE
expressions — a table-driven MERGE generator rather than ad-hoc per-field
code (SURVEY §7 hard-part d). On a Delta/Iceberg lake the same spec renders
into `MERGE INTO ... WHEN MATCHED UPDATE SET f = CASE ...`; here the engine
materializes the merged snapshot (pure DataFrame), which is also what the
foreachBatch upsert in streaming/queue.py applies per micro-batch.

At 100 TB: the join shuffles on the natural upsert key (download_url — high
cardinality, uniform), conflicts route to a dead-letter frame instead of
failing the job, and the whole merge is idempotent (re-running a batch
yields the same snapshot) which replaces the reference's row locks.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Policy(Enum):
    FILL_IF_NULL = "fill_if_null"  # take new only when old is null/empty
    REPLACE = "replace"  # overwrite when `replace_cond` holds, else fill
    CHECKSUM = "checksum"  # fill, but both-non-null disagreement = conflict
    KEEP = "keep"  # never touched by merges


@dataclass(frozen=True)
class MergeSpec:
    # one column name, or a composite identity tuple (e.g. purl
    # type/namespace/name/version). Keys match null-safe: a null namespace
    # on both sides is the SAME package identity, per the reference's
    # purl-field lookup (harvest.py get_or_create_package).
    key: str | tuple[str, ...]
    fields: dict[str, Policy]
    # column name holding the incoming row's precedence (mining_level in the
    # reference); replace applies when new level >= old level
    level_col: str | None = None

    @property
    def keys(self) -> tuple[str, ...]:
        return (self.key,) if isinstance(self.key, str) else tuple(self.key)


def _empty_or_null(c: Column) -> Column:
    return c.isNull() | (c.cast("string") == "")


def merge_upsert(
    existing: DataFrame, incoming: DataFrame, spec: MergeSpec
) -> tuple[DataFrame, DataFrame]:
    """Returns (merged_snapshot, conflicts).

    merged_snapshot has one row per key: inserts (key only in incoming),
    kept rows (key only in existing), merged rows (both). conflicts holds
    keys whose checksum fields disagree (minecode/model_utils.py:123-141 —
    the reference raises; we dead-letter, M1)."""
    keys = spec.keys
    ex_cols = [F.col(c) for c in keys] + [
        F.col(f).alias(f"old_{f}") for f in spec.fields
    ]
    inc_cols = [F.col(c).alias(f"new__k_{c}") for c in keys] + [
        F.col(f).alias(f"new_{f}") for f in spec.fields
    ]
    if spec.level_col:
        ex_cols.append(F.col(spec.level_col).alias("old__level"))
        inc_cols.append(F.col(spec.level_col).alias("new__level"))
    # explicit presence marker: a nullable field (even level_col) can be
    # legitimately null on an existing row, which must still count as matched
    ex = existing.select(*ex_cols).withColumn("old__present", F.lit(True))
    inc = incoming.select(*inc_cols)

    cond = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"new__k_{c}")) for c in keys],
    )
    j = ex.join(inc, cond, "full_outer")
    is_insert = F.col("old__present").isNull()
    # surviving key columns: existing side when matched/kept, incoming on
    # insert (both-null on a null-safe null==null match is still correct)
    key_out = [
        F.when(is_insert, F.col(f"new__k_{c}")).otherwise(F.col(c)).alias(c)
        for c in keys
    ]
    replace_cond = (
        (F.col("new__level") >= F.col("old__level"))
        if spec.level_col
        else F.lit(False)
    )

    conflict = F.lit(False)
    out_cols: list[Column] = list(key_out)
    for f, pol in spec.fields.items():
        old, new = F.col(f"old_{f}"), F.col(f"new_{f}")
        if pol is Policy.KEEP:
            merged = F.when(is_insert, new).otherwise(old)
        elif pol is Policy.FILL_IF_NULL:
            merged = F.when(_empty_or_null(old), new).otherwise(old)
        elif pol is Policy.REPLACE:
            merged = (
                F.when(_empty_or_null(old), new)
                .when(replace_cond & ~_empty_or_null(new), new)
                .otherwise(old)
            )
        elif pol is Policy.CHECKSUM:
            merged = F.when(_empty_or_null(old), new).otherwise(old)
            conflict = conflict | (
                ~_empty_or_null(old) & ~_empty_or_null(new) & (old != new)
            )
        else:  # pragma: no cover
            raise ValueError(pol)
        out_cols.append(merged.alias(f))

    flagged = j.withColumn("__conflict", conflict)
    conflicts = flagged.filter(F.col("__conflict")).select(
        # conflicts only arise on matched rows, so the existing-side key holds
        *[F.col(c) for c in keys],
        *[F.col(f"old_{f}").alias(f"existing_{f}") for f in spec.fields],
        *[F.col(f"new_{f}").alias(f"incoming_{f}") for f in spec.fields],
    )
    merged = flagged.filter(~F.col("__conflict")).select(*out_cols)
    return merged, conflicts


def replace_children(
    children: DataFrame, incoming_children: DataFrame, parent_key: str
) -> DataFrame:
    """M1 child-table semantics: parents present in the incoming set get
    their child rows replaced wholesale (parties/dependencies,
    model_utils.py:142-171): anti-join out the old rows, union the new."""
    parents = incoming_children.select(parent_key).dropDuplicates()
    kept = children.join(parents, parent_key, "left_anti")
    return kept.unionByName(incoming_children)


def reindex_partition_overwrite(
    table: DataFrame, rebuilt: DataFrame, partition_key: str
) -> DataFrame:
    """M6: delete+rebuild per package (minecode/indexing.py:35-43) — the
    dataframe algebra of `replaceWhere` partition overwrite: drop every row
    whose partition appears in the rebuilt set, append the rebuilt rows."""
    return replace_children(table, rebuilt, partition_key)
