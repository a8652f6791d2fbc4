"""Training-data ASSEMBLY queries: the steps between "deduped corpus" and
"training batches" — deterministic stratified sampling, reproducible global
shuffle, fixed-token-budget sequence packing, and target-mixture weighting.

All four are deterministic (md5-seeded, no rand()) so each has an exact
DuckDB oracle; see operators/assemble.py for the 100 TB shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.functions.text import n_tokens_ws
from purldb_spark.operators.assemble import (
    global_shuffle_rank,
    mixture_rates,
    pack_greedy,
    stratified_sample,
)
from purldb_spark.plans.registry import query

_RATES = {f"src{i}": 1.0 for i in range(5)} | {
    f"src{i}": 0.5 for i in range(5, 10)
}
_DEFAULT_RATE = 0.25

_H_SQL = (
    "CAST(concat('0x', substring(md5(concat('42|',"
    " CAST(doc_id AS VARCHAR))), 1, 8)) AS UBIGINT)"
)
_THRESH_SQL = (
    "CASE WHEN source IN ('src0','src1','src2','src3','src4')"
    " THEN 4294967296"
    " WHEN source IN ('src5','src6','src7','src8','src9')"
    " THEN 2147483648"
    " ELSE 1073741824 END"
)


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, source, CAST({_H_SQL} AS BIGINT) AS h
    FROM documents
    WHERE {_H_SQL} < {_THRESH_SQL}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source sampling: keep src0-4 fully, src5-9 at
    50%, the rest at 25% — row kept iff md5-hash(seed|doc_id) falls under
    the stratum threshold. Map-only, shuffle-free, reproducible
    (operators/assemble.py::stratified_sample)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_sample(
        docs, "source", "doc_id", _RATES, _DEFAULT_RATE, seed=42
    ).select("doc_id", "source", "h")


@query(
    "shuffle_global",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY md5(concat('7|', CAST(doc_id AS VARCHAR))), doc_id
           ) - 1 AS BIGINT) AS shuffle_pos
    FROM documents
    """,
)
def shuffle_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global shuffle order for training: total position
    under md5(seed|doc_id). The oracle states the spec as ONE global
    ROW_NUMBER; the Spark plan computes the identical order with 16
    parallel hash shards + broadcast shard offsets — no single-task sort
    (operators/assemble.py::global_shuffle_rank)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return global_shuffle_rank(docs, "doc_id", seed=7).select(
        "doc_id", F.col("shuffle_pos").cast("long").alias("shuffle_pos")
    )


_PACK_BUDGET = 4096


@query(
    "pack_sequences",
    oracle=f"""
    WITH k AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             md5(concat('7|', CAST(doc_id AS VARCHAR))) AS hk
      FROM documents
    ),
    c AS (
      SELECT doc_id, substring(hk, 1, 1) AS shard, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY substring(hk, 1, 1)
               ORDER BY hk, doc_id ROWS UNBOUNDED PRECEDING
             ) AS cum
      FROM k
    )
    SELECT doc_id, shard,
           CAST(floor((cum - n_tokens) / {_PACK_BUDGET}) AS BIGINT) AS bin_id,
           n_tokens
    FROM c
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign each document to a fixed-token-budget bin
    ({_PACK_BUDGET} whitespace tokens) by cumulative token count in
    deterministic hash order, independently within 16 hash shards — the
    distributed-packer shape (operators/assemble.py::pack_greedy)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", n_tokens_ws("text").alias("n_tokens")
    )
    packed = pack_greedy(docs, "doc_id", "n_tokens", _PACK_BUDGET, seed=7)
    return packed.select("doc_id", "shard", "bin_id", "n_tokens")


_WEIGHTS = (
    {f"src{i}": 0.1 for i in range(5)}
    | {f"src{i}": 0.06 for i in range(5, 10)}
)
_DEFAULT_WEIGHT = 0.02  # 5*0.1 + 5*0.06 + 10*0.02 = 1.0

_W_SQL = (
    "CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 0.1"
    " WHEN source IN ('src5','src6','src7','src8','src9') THEN 0.06"
    " ELSE 0.02 END"
)


@query(
    "mix_weights",
    oracle=f"""
    WITH per AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           CAST({_W_SQL} AS DOUBLE) AS target_share,
           LEAST(1.0, CAST({_W_SQL} AS DOUBLE)
                 * CAST(SUM(n_tokens) OVER () AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE)) AS rate
    FROM per
    """,
)
def mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture weighting: per-source sampling rates that realize a
    token-share target (rate_s = min(1, w_s * total / tokens_s)). One
    aggregation to source granularity, then arithmetic on a 20-row frame
    (operators/assemble.py::mixture_rates)."""
    docs = load(spark, sf_dir, "documents").select(
        "source", n_tokens_ws("text").alias("toks")
    )
    return mixture_rates(
        docs, "source", F.col("toks"), _WEIGHTS, _DEFAULT_WEIGHT
    )
