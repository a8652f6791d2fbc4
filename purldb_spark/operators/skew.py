"""Skew mitigation — the "salting as last resort" path from DESIGN.md.

Hot keys (a shingle appearing in a million documents, one giant package's
resources) overload single reducers. AQE's skew-join splitting handles most
cases at runtime; these helpers cover the two shapes AQE can't:

- `salted_group_count`: two-phase aggregation — pre-aggregate on
  (key, salt), then merge partials per key. For algebraic aggregates only
  (count/sum/min/max); Spark's own partial aggregation usually suffices,
  but an explicit salt also randomizes the SHUFFLE key, which matters when
  one key dominates a partition even after map-side combine.
- `salt_explode_join`: broadcast-free skewed equi-join — salt the big
  (skewed) side with rand-free deterministic salt, explode the small side
  across all salt values, join on (key, salt). Deterministic (salt derives
  from a unique column, not rand()) so results are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, buckets: int) -> DataFrame:
    """Deterministic salt in [0, buckets): hash of a unique column — NOT
    rand(), which breaks retry/replay determinism."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(buckets)).cast("int")
    )


def salted_group_count(
    df: DataFrame, key: str, unique_col: str, buckets: int = 16
) -> DataFrame:
    """count per key via (key, salt) pre-aggregation + per-key merge."""
    partial = (
        with_salt(df, unique_col, buckets)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(key).agg(F.sum("__n").alias("n"))


def salt_explode_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    big_unique_col: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big` has hot keys: big gets a deterministic salt,
    small is exploded across every salt bucket, and the join key becomes
    (key, salt) — each hot key now spreads over `buckets` reducers."""
    b = with_salt(big, big_unique_col, buckets)
    # generators can't nest in expressions (no .cast around explode); the
    # sequence already yields ints
    s = small.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {buckets - 1})"))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")
