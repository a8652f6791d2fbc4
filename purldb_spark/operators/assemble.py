"""Training-data assembly operators: deterministic sampling, global
shuffle, sequence packing, and mixture weighting over a document corpus.

These are the steps between "deduped corpus" and "training batches" in a
large-scale pipeline. Everything is DETERMINISTIC — randomness comes from
md5 over (seed | id), never from rand() — so runs are reproducible, results
are oracle-checkable in DuckDB, and re-running a failed partition yields
identical output (the property that makes speculative execution and retry
safe at 100 TB).

Hash-uniform convention shared with the DuckDB oracles: the first 8 hex
chars of md5(seed || '|' || id) read as an integer in [0, 2^32) — exact
integer comparisons, no float equality pitfalls across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 1 << 32  # first 8 md5 hex chars


def uniform_hash(col: Column, seed: int | str) -> Column:
    """Integer in [0, 2^32) derived from md5(seed|value) — the shared
    deterministic uniform source (DuckDB twin:
    ``CAST(concat('0x', substring(md5(...), 1, 8)) AS UBIGINT)``)."""
    hexpfx = F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), col.cast("string"))), 1, 8
    )
    return F.conv(hexpfx, 16, 10).cast("long")


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float,
    seed: int | str = 42,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically:
    row kept iff hash(seed|id) < floor(rate * 2^32).

    Scale shape: a pure map-side filter — no shuffle, no state, pushdown-
    friendly. Changing one stratum's rate between runs only adds/removes
    rows of that stratum (hashes are stable), which is what makes
    incremental re-mixes cheap on a 100 TB corpus."""
    threshold = F.lit(int(default_rate * HASH_SPACE))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * HASH_SPACE))
        ).otherwise(threshold)
    h = uniform_hash(F.col(id_col), seed)
    return df.withColumn("h", h).filter(F.col("h") < threshold)


def global_shuffle_rank(
    df: DataFrame, id_col: str, seed: int | str = 7
) -> DataFrame:
    """Reproducible global shuffle: every row gets a total-order position
    ``shuffle_pos`` (0-based) under the pseudo-random order md5(seed|id).

    Scale shape: a single global window would funnel 100 TB through one
    task. Instead the hex key's first character shards the data 16 ways
    (shard-major order == global lexicographic order on the full key, so
    the result is IDENTICAL to a global sort): ranks are computed per
    shard in parallel, then each shard adds the total count of all
    lexicographically-smaller shards — a 16-row aggregate joined back by
    broadcast. This is the DataFrame form of range-partitioned sort +
    per-partition offsets; at higher scale use a longer prefix (256 or
    4096 shards)."""
    hexkey = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    keyed = df.withColumn("_hk", hexkey).withColumn(
        "_shard", F.substring("_hk", 1, 1)
    )
    counts = keyed.groupBy("_shard").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.select(
        "_shard",
        (
            F.sum("_n").over(
                Window.orderBy("_shard").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("_offset"),
    ).fillna({"_offset": 0})
    within = F.row_number().over(
        Window.partitionBy("_shard").orderBy("_hk", id_col)
    )
    return (
        keyed.withColumn("_r", within)
        .join(F.broadcast(offsets), "_shard")
        .withColumn("shuffle_pos", (F.col("_offset") + F.col("_r") - 1))
        .drop("_hk", "_shard", "_r", "_offset", "_n")
    )


def pack_greedy(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    seed: int | str = 7,
) -> DataFrame:
    """Assign documents to fixed-token-budget bins ("sequence packing"):
    within each of 16 hash shards, documents in deterministic hash order
    accumulate tokens, and a document's bin is its starting offset divided
    by the budget.

    Scale shape: one shuffle on the shard key, then a partitioned window
    cumsum — each shard packs independently in parallel, exactly how a
    distributed packer runs in production (bins never span packers).
    Oversized documents (> budget) occupy their own bin run — chunking
    them is the tokenizer's job upstream."""
    hexkey = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    keyed = df.withColumn("_hk", hexkey).withColumn(
        "shard", F.substring("_hk", 1, 1)
    )
    cum = F.sum(tokens_col).over(
        Window.partitionBy("shard").orderBy("_hk", id_col).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    return (
        keyed.withColumn(
            "bin_id",
            F.floor((cum - F.col(tokens_col)) / F.lit(budget)).cast("long"),
        )
        .drop("_hk")
    )


def mixture_rates(
    df: DataFrame,
    stratum_col: str,
    tokens_col: Column,
    weights: dict[str, float],
    default_weight: float,
) -> DataFrame:
    """Per-stratum sampling rates that realize a target token mixture:
    rate_s = min(1, weight_s * total_tokens / tokens_s). Strata with
    more than their share are downsampled; the rest pass through (a rate
    cannot exceed 1 without upsampling, which is a separate choice).

    Scale shape: one aggregation to stratum granularity (tiny), a window
    total over that tiny frame, pure arithmetic after."""
    w = F.lit(default_weight)
    for value, weight in sorted(weights.items()):
        w = F.when(F.col(stratum_col) == value, F.lit(weight)).otherwise(w)
    per = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).alias("n_tokens"),
    )
    total = F.sum("n_tokens").over(
        Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return per.select(
        stratum_col,
        "n_docs",
        "n_tokens",
        w.alias("target_share"),
        F.least(
            F.lit(1.0),
            w * total.cast("double") / F.col("n_tokens").cast("double"),
        ).alias("rate"),
    )
