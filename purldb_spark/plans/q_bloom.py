"""Bloom-filter dedup pre-filter (SURVEY.md §8 beyond-reference op).

``dedup_bloom``: build a Bloom filter over the REFERENCE half of the
corpus (sources src0..src4) and probe the other half — the classic
new-batch-vs-corpus membership gate that runs BEFORE any exact or
near-dup join at 100 TB (the streaming twin of dedup_incremental's
band-index probe, one approximate set-membership test per document
instead of a shuffle join).

Approximate semantics made oracle-exact: a Bloom filter's answer is a
deterministic function of its hash family and bit array, so with the
cross-engine md5 bucket convention (operators/assemble.py) both engines
compute the IDENTICAL filter — including its false positives. The query
returns both verdicts per probe document (``maybe_dup`` from the filter,
``exact_dup`` from the md5 ground truth), so the false-positive rows are
first-class, checkable output: at the chosen sizing (k=3, m=1024, the
reference half of sf0.01 sets ~350 bits) the FP rate is a visible ~2%
(8 of 375 probes at sf0.01), deliberately demonstrable rather than
negligible.

Scale shape: the "bit array" is a DISTINCT-position table that is AT
MOST m rows regardless of corpus size — the build is one
map-side-combined distinct over k map-only hashes of the reference scan,
and the probe side joins against a broadcast that can never exceed m
entries (production sizing: m = -n*ln(p)/ln(2)^2 bits, still bytes per
billion keys; here m stays a table because the oracle needs relational
semantics, a real deployment packs it into longs like
functions/halohash.py packs BAH128 chunks). The md5 ``exact_dup``
verify is the shuffle semi-join the Bloom gate exists to prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query

_M = 1024  # filter bits
_K = 3     # hash functions
_REF_PRED_SPARK = "source IN ('src0','src1','src2','src3','src4')"
_REF_PRED_SQL = _REF_PRED_SPARK


def _bucket_spark(j: int) -> str:
    return (
        f"pmod(cast(conv(substring(md5(concat('bloom{j}|', text)),"
        f" 1, 8), 16, 10) as bigint), {_M})"
    )


def _bucket_sql(j: int) -> str:
    return (
        f"CAST(CAST(concat('0x', substring(md5('bloom{j}|' || text),"
        f" 1, 8)) AS UBIGINT) % {_M} AS BIGINT)"
    )


@query(
    "dedup_bloom",
    oracle=f"""
    WITH ref AS (SELECT text FROM documents WHERE {_REF_PRED_SQL}),
    bits AS (
      SELECT DISTINCT b FROM (
        {" UNION ALL ".join(f"SELECT {_bucket_sql(j)} AS b FROM ref" for j in range(_K))}
      )
    ),
    probe AS (
      SELECT doc_id, text FROM documents WHERE NOT ({_REF_PRED_SQL})
    ),
    ppos AS (
      SELECT doc_id, b FROM (
        {" UNION ALL ".join(f"SELECT doc_id, {_bucket_sql(j)} AS b FROM probe" for j in range(_K))}
      )
    ),
    hits AS (
      SELECT p.doc_id, COUNT(bits.b) AS nhit
      FROM ppos p LEFT JOIN bits ON bits.b = p.b
      GROUP BY p.doc_id
    )
    SELECT h.doc_id,
           h.nhit = {_K} AS maybe_dup,
           md5(p.text) IN (SELECT md5(text) FROM ref) AS exact_dup
    FROM hits h JOIN probe p ON p.doc_id = h.doc_id
    """,
)
def dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership gate: per probe document, the filter verdict
    (``maybe_dup`` — all k bit positions set by the reference half) next
    to the exact md5 ground truth (``exact_dup``), making the filter's
    false positives part of the checked result. See module docstring for
    the broadcast-bounded scale argument."""
    docs = load(spark, sf_dir, "documents")
    ref = docs.where(F.expr(_REF_PRED_SPARK)).select("text")
    probe = docs.where(~F.expr(_REF_PRED_SPARK)).select("doc_id", "text")

    # the "bit array": at most m rows, whatever the corpus size
    bits = (
        ref.select(
            F.explode(
                F.array(*[F.expr(_bucket_spark(j)) for j in range(_K)])
            ).alias("b")
        )
        .distinct()
    )
    ppos = probe.select(
        "doc_id",
        F.explode(
            F.array(*[F.expr(_bucket_spark(j)) for j in range(_K)])
        ).alias("b"),
    )
    hits = (
        ppos.join(F.broadcast(bits), "b", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("nhit"))
    )
    exact = ref.select(F.md5("text").alias("h")).distinct()
    return (
        probe.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            (F.coalesce(F.col("nhit"), F.lit(0)) == _K).alias("maybe_dup"),
            F.md5("text").alias("h"),
        )
        # NO broadcast hint: the exact-md5 set is corpus-sized at scale
        # (the q_cluster.py 'dropped' lesson) — AQE picks BHJ when small
        .join(exact.withColumn("exact_dup", F.lit(True)), "h", "left")
        .select(
            "doc_id",
            "maybe_dup",
            F.coalesce(F.col("exact_dup"), F.lit(False)).alias("exact_dup"),
        )
    )
