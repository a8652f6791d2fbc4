"""Audio segmentation queries — the speech-corpus ops over REAL decoded
audio: voice-activity segmentation (the audio twin of the video shot
chain) over frame-aligned WAV windows.

Same oracle discipline as the container family: per document a genuine
RIFF/PCM WAV is encoded with per-window amplitudes derived from doc_id,
sliced into frame-aligned windows each decoded independently
(binaryops.audio_window_stats — real chunk walks, not stats passed
through), and the segmentation chain runs on the decoded RMS values.
The oracle re-derives window RMS arithmetically and replays the chain
in SQL, so a slice misalignment, a decode error, or a chain bug each
breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from purldb_spark.catalog.tables import load
from purldb_spark.conf import spread_small_input
from purldb_spark.plans.registry import query

_SILENCE_E3 = 250  # amp levels 0 and 1 (rms 0 / 125 e3) are silence


@query(
    "mm_audio_segments",
    oracle=f"""
    WITH win AS (
      SELECT doc_id AS media_id, t.w AS window_idx,
             ((doc_id + 3 * t.w) % 8) * 125 AS rms_e3
      FROM documents, unnest([0, 1, 2, 3]) AS t(w)
    ),
    flagged AS (
      SELECT *,
             rms_e3 >= {_SILENCE_E3} AS voiced,
             CASE WHEN rms_e3 >= {_SILENCE_E3}
                   AND coalesce(lag(rms_e3) OVER w2 < {_SILENCE_E3}, TRUE)
                  THEN 1 ELSE 0 END AS seg_start
      FROM win
      WINDOW w2 AS (PARTITION BY media_id ORDER BY window_idx)
    ),
    segs AS (
      SELECT *, sum(seg_start) OVER (
        PARTITION BY media_id ORDER BY window_idx
        ROWS UNBOUNDED PRECEDING) AS seg_id
      FROM flagged
    )
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(seg_id AS BIGINT) AS seg_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(min(window_idx) AS BIGINT) AS start_window,
           CAST(max(window_idx) AS BIGINT) AS end_window,
           CAST(sum(media_id % 50 + 1) AS BIGINT) AS duration_ms,
           CAST(max(rms_e3) AS BIGINT) AS max_rms_e3
    FROM segs
    WHERE voiced
    GROUP BY media_id, seg_id
    """,
)
def mm_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segmentation over REAL decoded audio — the speech
    training-data op (VAD segments feed ASR corpus builds): per
    document a genuine WAV whose four quarters carry amplitudes
    ((doc + 3w) % 8) * 4096 (alternating-sign square waves, so each
    decoded window's RMS is exactly ((doc + 3w) % 8) * 125 e3-units) is
    sliced into frame-aligned windows and DECODED window by window
    (audio_window_stats — the mm_wav_windows plumbing); windows at or
    above the 250 e3 silence gate are voiced, a voiced window following
    silence (or the start) opens a new segment, and voiced runs roll up
    to (n_windows, start/end, duration, peak RMS). The chain is the
    shot-segmentation shape on the audio axis: lag + flag + running sum
    + rollup, all JVM-side after the map-only Arrow decode, ONE
    bounded-fanout shuffle by media_id. The oracle re-derives every
    window RMS arithmetically and replays the chain: a frame-misaligned
    slice or a sign error in the square wave shifts an RMS and breaks
    the match. Each window holds (doc%50+1)*8 frames at 8 kHz, so its
    duration is exactly doc%50+1 ms (frame count divisible by 4x8 keeps
    quarters whole-ms, the mm_wav_windows construction)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from purldb_spark.multimodal.binaryops import (
        WINDOW_STATS_SCHEMA,
        audio_window_stats_batches,
        encode_wav,
        fuse,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                n = (i % 50 + 1) * 32
                q = n // 4
                samples = []
                for w in range(4):
                    amp = ((i + 3 * w) % 8) * 4096
                    samples.extend(
                        amp if k % 2 == 0 else -amp for k in range(q)
                    )
                outs.append(encode_wav(8000, 1, 16, samples))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    win = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(
            fuse(enc, audio_window_stats_batches(4)),
            schema=WINDOW_STATS_SCHEMA,
        )
        .select("media_id", "window_idx", "duration_ms", "rms_e3")
    )
    w = Window.partitionBy("media_id").orderBy("window_idx")
    flagged = win.withColumn(
        "voiced", F.col("rms_e3") >= _SILENCE_E3
    ).withColumn(
        "seg_start",
        F.when(
            F.col("rms_e3") >= _SILENCE_E3,
            F.coalesce(
                F.lag("rms_e3").over(w) < _SILENCE_E3, F.lit(True)
            ).cast("int"),
        ).otherwise(F.lit(0)),
    )
    segs = flagged.withColumn(
        "seg_id",
        F.sum("seg_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).filter(F.col("voiced"))
    return segs.groupBy("media_id", "seg_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.min("window_idx").alias("start_window"),
        F.max("window_idx").alias("end_window"),
        F.sum("duration_ms").alias("duration_ms"),
        F.max("rms_e3").alias("max_rms_e3"),
    )


@query(
    "mm_mp3_tags",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(4 AS INTEGER) AS tag_version,
           CAST(CASE WHEN doc_id % 9 = 0 THEN 2 ELSE 3 END AS BIGINT)
             AS n_frames_tag,
           'Track ' || CAST(doc_id AS VARCHAR) AS title,
           'Artist ' || CAST(doc_id % 97 AS VARCHAR) AS artist,
           CASE WHEN doc_id % 9 = 0 THEN NULL
                ELSE 'Album ' || CAST(doc_id % 31 AS VARCHAR) END AS album
    FROM documents
    """,
)
def mm_mp3_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ID3v2.4 frame extraction through the full Arrow pipeline —
    the audio-metadata miner (the binary sibling of the x_* document
    mappers): per document an mp3 stream carries a genuine tag with
    utf-8 TIT2/TPE1 frames (TALB omitted when doc%9=0, so the
    missing-frame null path is hash-checked) and doc%16 padding bytes;
    mp3_tag_stats walks the frames — syncsafe v2.4 sizes, encoding
    bytes, padding stop — and the oracle regenerates every string from
    doc_id. Map-only, zero shuffle, the mm_mp4_meta scale shape."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import fuse
    from purldb_spark.multimodal.containers import (
        MP3_TAG_SCHEMA,
        mp3_tag_batches,
    )
    from purldb_spark.multimodal.mp3 import encode_id3, encode_mp3

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                frames = {
                    "TIT2": f"Track {i}",
                    "TPE1": f"Artist {i % 97}",
                }
                if i % 9 != 0:
                    frames["TALB"] = f"Album {i % 31}"
                outs.append(
                    encode_id3(frames, padding=i % 16)
                    + encode_mp3(32, 32000, 1, lambda k: i)
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(fuse(enc, mp3_tag_batches), schema=MP3_TAG_SCHEMA)
    )


@query(
    "mm_wav24_float_roundtrip",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS channels,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 32 END AS INTEGER)
             AS bits,
           CAST((doc_id % 50 + 1) * 8 AS BIGINT) AS n_frames,
           CAST(doc_id % 50 + 1 AS BIGINT) AS duration_ms,
           CAST((doc_id % 8) * 125 AS BIGINT) AS rms_e3
    FROM documents
    """,
)
def mm_wav24_float_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-bit PCM and IEEE-float WAV through the full Arrow pipeline —
    the two uncompressed layouts the r14 decode still rejected, now
    real: even documents carry packed 3-byte little-endian 24-bit
    frames (amplitude (doc%8) << 20, so RMS is exactly (doc%8)/8 of
    the 2^23 full scale), odd documents 32-bit float frames (amplitude
    (doc%8)/8 — eighths are exactly representable in binary floating
    point, so the RMS is exact in BOTH engines). The oracle predicts
    every stat from doc_id; a sign-extension slip in the 3-byte
    unpack or a float full-scale error shifts rms_e3 and breaks the
    match. Map-only, zero shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        AUDIO_STATS_SCHEMA,
        audio_stats_batches,
        encode_wav,
        fuse,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                n = (i % 50 + 1) * 8
                if i % 2 == 0:
                    amp = (i % 8) << 20
                    samples = [amp if k % 2 == 0 else -amp for k in range(n)]
                    outs.append(encode_wav(8000, 1, 24, samples))
                else:
                    amp = (i % 8) / 8.0
                    samples = [amp if k % 2 == 0 else -amp for k in range(n)]
                    outs.append(encode_wav(8000, 1, 32, samples))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(
            fuse(enc, audio_stats_batches), schema=AUDIO_STATS_SCHEMA
        )
    )
