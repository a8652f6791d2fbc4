"""Multimodal-column queries: binary payloads synthesized from documents
(content = utf-8 bytes of text, media_type 'fake/image') so the Pandas-UDF
plumbing is exercised end-to-end AND oracle-checkable: md5-of-bytes and the
deterministic stub decode are both computable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.multimodal.binaryops import extract_meta, sample_frames
from purldb_spark.plans.registry import query


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("fake/image").alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
    )


@query(
    "mm_decode_meta",
    oracle="""
    SELECT doc_id AS media_id,
           'fake/image' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash,
           CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height
    FROM documents
    """,
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction through mapInPandas (Arrow batches,
    stub decoder): the full multimodal plumbing — schema, batch iteration,
    hash, decode — verified against a SQL oracle computing the same
    deterministic facts."""
    return extract_meta(_media(spark, sf_dir))


@query(
    "mm_frame_stats",
    oracle="""
    SELECT doc_id AS media_id, CAST(4 AS BIGINT) AS n_frames,
           CAST(octet_length(encode(text)) // 4 * 4 AS BIGINT) AS sampled_bytes
    FROM documents
    WHERE octet_length(encode(text)) >= 4
    """,
)
def mm_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: 1 blob -> 4 chunk rows inside mapInPandas,
    then an aggregate over the exploded frames (count + bytes). Oracle
    reproduces the chunk arithmetic (4 chunks of floor(n/4) bytes)."""
    frames = sample_frames(_media(spark, sf_dir), n_frames=4)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.length("frame")).alias("sampled_bytes"),
        )
        .filter(F.col("sampled_bytes") >= 4)  # == oracle's octet_length >= 4
    )
