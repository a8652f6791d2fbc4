"""Window-shaped operators — SURVEY §2.5 (W1-W7), §2.6 U5, §2.7 F6.

These are the reusable primitives behind the reference's per-group
selection/ranking/merging logic. All of them take explicit tie-break columns:
Spark (like any parallel engine) gives no stable row order, so every
"first/best/latest" must be a total order to be deterministic — the
reference gets this implicitly from Postgres primary keys; we make it
explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame, partition_by: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """W4: `[:k]` slice per group (minecode/models.py:636 — 10 most recent
    per status). row_number (not rank) so exactly k rows survive per group;
    order_by must end with a unique key.

    Scale: a windowed row_number shuffles once on the partition keys; for
    small k over huge groups AQE's partial top-k (TakeOrderedAndProject per
    group is not native) still beats a global sort because each partition
    sorts locally."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def keep_best_per_group(
    df: DataFrame,
    partition_by: list[str],
    rank_expr: list[Column],
    keep_ties: bool = True,
) -> DataFrame:
    """W5: rank candidates by a score tuple, keep the best group
    (matchcode/models.py:326-373 ranks by (hamming, size_diff, name_diff)
    and keeps all rows tied at rank 1)."""
    fn = F.dense_rank() if keep_ties else F.row_number()
    w = Window.partitionBy(*partition_by).orderBy(*rank_expr)
    return df.withColumn("__rk", fn.over(w)).filter(F.col("__rk") == 1).drop("__rk")


def stable_dedup(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """W7/U3: deterministic dropDuplicates — first row per key under an
    explicit total order (the reference's dict-keyed last-wins /
    DISTINCT ON, packagedb/api.py:1243-1283). Plain dropDuplicates picks an
    arbitrary row under parallelism; this variant is reproducible."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def flag_duplicates_keep_best(
    df: DataFrame,
    dup_key: list[str],
    order_by: list[Column],
    id_col: str,
) -> DataFrame:
    """U5: duplicate-package dedup (minecode/indexing.py:133-195): rows
    sharing `dup_key` form a duplicate set; the first under `order_by` is
    canonical, the rest get is_duplicate=true and a pointer to the canonical
    row (the reference re-points FKs the same way)."""
    w = Window.partitionBy(*dup_key).orderBy(*order_by)
    return df.withColumn(
        "canonical_" + id_col, F.first(F.col(id_col)).over(w)
    ).withColumn(
        "is_duplicate", F.col(id_col) != F.col("canonical_" + id_col)
    )


def merge_intervals(
    df: DataFrame,
    partition_by: list[str],
    start_col: str,
    end_col: str,
    max_gap: Column,
) -> DataFrame:
    """F6/W6: interval ("span") merge — combine intervals per group when the
    next start is within `max_gap` of the running max end
    (matchcode/match.py:290-348 merges match spans ≤16 positions apart;
    identical algebra sessionizes event streams).

    Shape: one shuffle on the group keys, two window passes (running max of
    end, then a session-id running sum over new-interval flags), one groupBy.
    No UDF, no collect — scales to arbitrarily many groups; within-group
    width is bounded by the window sort."""
    w_order = Window.partitionBy(*partition_by).orderBy(start_col, end_col)
    run_max = F.max(F.col(end_col)).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        run_max.isNull() | (F.col(start_col) > run_max + max_gap), 1
    ).otherwise(0)
    with_id = df.withColumn("__new", is_new).withColumn(
        "__span_id", F.sum("__new").over(w_order)
    )
    return (
        with_id.groupBy(*partition_by, "__span_id")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .drop("__span_id")
    )
