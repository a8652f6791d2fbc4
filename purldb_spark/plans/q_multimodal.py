"""Multimodal-column queries: binary payloads synthesized from documents
so the Pandas-UDF plumbing is exercised end-to-end AND oracle-checkable.

Two tiers: the fake/* tier (content = utf-8 text bytes, stub decode —
md5 and byte-length facts DuckDB can restate), and since r13 the REAL
tier: mm_bmp_roundtrip / mm_wav_roundtrip encode genuine uncompressed
BMP / RIFF-PCM WAV blobs per document and decode them with the
pure-Python parsers (multimodal/binaryops.decode_bmp / decode_wav) —
dimensions, channel means, sample rate, duration, RMS all come off real
binary columns, with the oracle predicting each stat arithmetically
from doc_id. Only genuinely-compressed codecs (png/jpeg/mp3) remain
behind NotImplementedError.
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


@query(
    "mm_bmp_roundtrip",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(doc_id % 16 + 1 AS INTEGER) AS width,
           CAST(doc_id % 8 + 1 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST((doc_id % 16 + 1) * (doc_id % 8 + 1) AS BIGINT) AS n_pixels,
           CAST((doc_id % 256) * 1000 AS BIGINT) AS mean_b_e3,
           CAST(((doc_id // 3) % 256) * 1000 AS BIGINT) AS mean_g_e3,
           CAST(((doc_id // 7) % 256) * 1000 AS BIGINT) AS mean_r_e3
    FROM documents
    """,
)
def mm_bmp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image bytes through the full Arrow pipeline: per document,
    ENCODE a genuine 24-bit padded bottom-up BMP (solid color + dims
    derived from doc_id), then DECODE it with the pure-Python header/
    pixel parser (binaryops.decode_bmp via image_stats) — exercising row
    padding (widths 1..16), pixel offsets, and per-channel means on real
    binary columns. The oracle predicts every decoded stat arithmetically
    from doc_id, so an encoder/decoder bug that shifts a byte or counts a
    padding column breaks the match. Blobs are built and decoded inside
    mapInPandas batches — nothing but (id, stats) leaves the worker."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import encode_bmp, image_stats

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": [
                        encode_bmp(
                            int(i) % 16 + 1,
                            int(i) % 8 + 1,
                            (
                                int(i) % 256,
                                (int(i) // 3) % 256,
                                (int(i) // 7) % 256,
                            ),
                        )
                        for i in pdf["doc_id"]
                    ],
                }
            )

    media = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .mapInPandas(enc, schema="media_id long, content binary")
    )
    return image_stats(media)


@query(
    "mm_wav_roundtrip",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS channels,
           CAST(16 AS INTEGER) AS bits,
           CAST((doc_id % 50 + 1) * 8 AS BIGINT) AS n_frames,
           CAST(doc_id % 50 + 1 AS BIGINT) AS duration_ms,
           CAST((doc_id % 8) * 125 AS BIGINT) AS rms_e3
    FROM documents
    """,
)
def mm_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio bytes through the full Arrow pipeline: per document,
    ENCODE a genuine RIFF/PCM WAV (8 kHz mono 16-bit alternating-sign
    square wave, amplitude (doc_id % 8) x 4096 so the decoded RMS is an
    exact integer multiple of 125 e3-units), then DECODE with the
    pure-Python chunk walker (binaryops.decode_wav via audio_stats). The
    oracle predicts rate/frames/duration/RMS arithmetically from doc_id —
    a chunk-alignment or sample-width bug breaks the match."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import audio_stats, encode_wav

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                amp = (i % 8) * 4096
                n = (i % 50 + 1) * 8
                samples = [amp if k % 2 == 0 else -amp for k in range(n)]
                outs.append(encode_wav(8000, 1, 16, samples))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    media = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .mapInPandas(enc, schema="media_id long, content binary")
    )
    return audio_stats(media)
