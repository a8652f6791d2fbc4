"""Multimodal ingest stream — the streaming face of the REAL binary
decode path (multimodal/binaryops.decode_bmp / decode_wav, the r13
upgrade from codec stubs to real bytes).

Per micro-batch of (media_id, media_type, content) blobs: dispatch each
row to its decoder (image_stats for image/bmp, audio_stats for
audio/wav, and since r15 the container walks — mp4_meta_stats for
video/mp4, mp3_meta_stats for audio/mpeg — the same Arrow mapInPandas
faces the batch queries mm_bmp_roundtrip / mm_wav_roundtrip /
mm_mp4_meta / mm_mp3_meta verify against the SQL oracle),
and append one typed stats row per blob to the stats table. Decode
failures follow the faces' poison-blob contract (sentinel row,
decoded = false) — at 100 TB a torn upload must never kill the ingest
stream, and the sentinel rows ARE the quarantine queue a re-fetch job
reads.

State taxonomy: ledger (the bloom/funnel recipe) — appends anti-join
the media ids already in the stats table, so a replayed epoch
re-decodes identical stats and writes nothing. Decode is pure (bytes ->
stats), so unlike the band indexes there is no cross-batch state to
compact: the table only grows by one bounded row per blob, and the
payload column never leaves the mapInPandas worker — the stats table
carries no binary.

At 100 TB: blobs arrive partitioned by ingest path; decode is map-only
(zero shuffle — the anti-join ships only the thin id column), so the
stream scales with executor count alone. The one exception is
within-batch id-dedup, which repartitions the MICRO-BATCH by media_id
(bounded by contract — the same cost dropDuplicates already paid, now
with a deterministic winner). The 16th face in the
streaming catalogue (DESIGN.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.multimodal.binaryops import audio_stats, image_stats

# one unified stats row for both modalities: image columns null for
# audio rows and vice versa; `decoded` false = poison/unknown-type
STATS_COLS = [
    "media_id",
    "media_type",
    "decoded",
    "width",
    "height",
    "channels",
    "sample_rate",
    "n_frames",
    "duration_ms",
]


def decode_stats_batch(batch: DataFrame) -> DataFrame:
    """(media_id, media_type, content) -> one unified stats row per blob.
    Each modality rides its own mapInPandas face; unknown media types
    yield decoded=false sentinel rows (the quarantine queue)."""
    img = image_stats(
        batch.filter(F.col("media_type") == "image/bmp").select(
            "media_id", "content"
        )
    ).select(
        "media_id",
        F.lit("image/bmp").alias("media_type"),
        (F.col("width") >= 0).alias("decoded"),
        "width",
        "height",
        F.col("channels").cast("int").alias("channels"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("long").alias("n_frames"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    aud = audio_stats(
        batch.filter(F.col("media_type") == "audio/wav").select(
            "media_id", "content"
        )
    ).select(
        "media_id",
        F.lit("audio/wav").alias("media_type"),
        (F.col("sample_rate") >= 0).alias("decoded"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        "sample_rate",
        "n_frames",
        "duration_ms",
    )
    from purldb_spark.multimodal.containers import (
        mp3_meta_stats,
        mp4_meta_stats,
    )

    mp4 = mp4_meta_stats(
        batch.filter(F.col("media_type") == "video/mp4").select(
            "media_id", "content"
        )
    ).select(
        "media_id",
        F.lit("video/mp4").alias("media_type"),
        (F.col("width") >= 0).alias("decoded"),
        "width",
        "height",
        F.lit(None).cast("int").alias("channels"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.col("n_samples").alias("n_frames"),
        "duration_ms",
    )
    mp3 = mp3_meta_stats(
        batch.filter(F.col("media_type") == "audio/mpeg").select(
            "media_id", "content"
        )
    ).select(
        "media_id",
        F.lit("audio/mpeg").alias("media_type"),
        (F.col("sample_rate") >= 0).alias("decoded"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("channels"),
        "sample_rate",
        F.col("audio_frames").alias("n_frames"),
        "duration_ms",
    )
    other = batch.filter(
        ~F.col("media_type").isin(
            "image/bmp", "audio/wav", "video/mp4", "audio/mpeg"
        )
    ).select(
        "media_id",
        "media_type",
        F.lit(False).alias("decoded"),
        *[
            F.lit(None).cast(t).alias(c)
            for c, t in (
                ("width", "int"),
                ("height", "int"),
                ("channels", "int"),
                ("sample_rate", "int"),
                ("n_frames", "long"),
                ("duration_ms", "long"),
            )
        ],
    )
    return (
        img.unionByName(aud)
        .unionByName(mp4)
        .unionByName(mp3)
        .unionByName(other)
        .select(*STATS_COLS)
    )


def index_media_batch(
    spark: SparkSession, batch: DataFrame, stats_dir: str
) -> None:
    """One micro-batch body: decode stats for blobs not yet in the stats
    table, append them. Replay-idempotent via the id anti-join (ledger
    pattern); the anti-join runs BEFORE decode so a replay pays no
    Python time for rows that already landed.

    Within-batch duplicates of one media_id pick a DETERMINISTIC
    representative — min by (content md5, media_type) — not
    dropDuplicates' arbitrary row: with conflicting payloads under one
    id, the stats row that lands must be the same one on every replay,
    or the anti-join silently pins whichever survivor a recomputation
    happened to produce first (r13 advice)."""
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy(
        F.md5(F.col("content")), F.col("media_type")
    )
    fresh = (
        batch.select("media_id", "media_type", "content")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if os.path.isdir(stats_dir):
        seen = (
            batch.sparkSession.read.parquet(stats_dir)
            .select("media_id")
            .dropDuplicates()
        )
        fresh = fresh.join(seen, "media_id", "left_anti")
    decode_stats_batch(fresh).write.mode("append").parquet(stats_dir)


def quarantine(spark: SparkSession, stats_dir: str) -> DataFrame:
    """The undecodable rows — what a re-fetch/repair job consumes."""
    return (
        spark.read.parquet(stats_dir)
        .filter(~F.col("decoded"))
        .select("media_id", "media_type")
    )


def media_sink(spark: SparkSession, stats_dir: str):
    """foreachBatch callable wiring index_media_batch into a blob
    stream."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        index_media_batch(spark, batch, stats_dir)

    return process
