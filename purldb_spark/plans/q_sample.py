"""Weighted sampling WITHOUT replacement, per group (beyond-reference,
assembly family): Efraimidis & Spirakis 2006 ("Weighted random sampling
with a reservoir") — each item draws key = ln(u) / w and the top-k keys
per group are a weighted sample without replacement. The one-pass
reservoir form of the same keys is the streaming-ingest variant; here the
keys are md5-deterministic so the SAME sample falls out of any retry,
backfill, or engine (the operators/assemble.py convention — this is the
weighted counterpart of `sample_stratified`'s equal-rate threshold and
`select_dsir`'s Gumbel-top-k, which is the k-out-of-all special case).

Use case: sample k documents per language proportional to a quality /
length weight when assembling a training mix — heavier documents more
likely, never twice.

Determinism contract: u = (md5-derived 32-bit int + 0.5) / 2^32 (never 0
or 1), key snapped ONCE to the 1e-6 grid (ln from the same libm on both
engines; floor can flip only within 1 ulp of a grid boundary — the
select_dsir convention), tie-broken by doc_id; the per-group top-k is a
row_number window over that exact BIGINT key.

Scale shape at 100 TB: map-only key computation (no join — the weight is
a column), one shuffle by group for the top-k window; groups are
languages (bounded), and heavy groups cost their own size only. The
labeled alternative at extreme skew is the two-level TakeOrdered of
select_domain_cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query

_WS_K = 3  # sample size per group

# u in (0, 1) from the shared md5 convention; key = ln(u)/w on the e6 grid
# (w >= 1 guarded: an empty document would otherwise divide by zero)
_WKEY_SPARK = (
    "cast(floor(1000000e0 * ln("
    "(cast(conv(substring(md5(concat('wsamp|', cast(doc_id as string))),"
    " 1, 8), 16, 10) as double) + 0.5) / 4294967296e0"
    ") / cast(greatest(n_chars, 1) as double)) as bigint)"
)
_WKEY_SQL = (
    "CAST(floor(1000000e0 * ln("
    "(CAST(CAST(concat('0x', substring(md5('wsamp|' ||"
    " CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE) + 0.5)"
    " / 4294967296e0"
    ") / CAST(greatest(n_chars, 1) AS DOUBLE)) AS BIGINT)"
)


@query(
    "sample_weighted_per_group",
    oracle=f"""
    WITH keyed AS (
      SELECT lang, doc_id, n_chars, {_WKEY_SQL} AS wkey
      FROM documents
    ),
    ranked AS (
      SELECT lang, doc_id, n_chars, wkey,
             row_number() OVER (PARTITION BY lang
                                ORDER BY wkey DESC, doc_id) AS rk
      FROM keyed
    )
    SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars, wkey,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_WS_K}
    """,
)
def sample_weighted_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_WS_K} documents per language by the Efraimidis-Spirakis key
    ln(u)/n_chars — a weighted sample without replacement per group, where
    a document's selection probability at each draw is proportional to its
    length. See the module docstring for the determinism and scale
    contract."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "lang", "doc_id", "n_chars", F.expr(_WKEY_SPARK).alias("wkey")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("wkey"), F.asc("doc_id"))
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _WS_K)
        .select(
            "lang",
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            "wkey",
            F.col("rk").cast("long").alias("rk"),
        )
    )
