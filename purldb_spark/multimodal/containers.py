"""Arrow mapInPandas faces over the container parsers (mp4.py / mp3.py)
— the same plumbing contract as binaryops' image/audio faces: opaque
``binary`` columns in, typed per-media (or per-frame) rows out, poison
blobs surfacing as a sentinel row instead of stage death.

Scale notes (as binaryops): payloads ride Arrow buffers; the per-frame
face prunes content before anything downstream — only (id, frame stats)
leave the worker, never the blob; at 100 TB both faces are map-only
passes with no shuffle of their own.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from purldb_spark.multimodal.mp3 import walk_mp3
from purldb_spark.multimodal.mp4 import parse_mp4, sample_bytes

_POISON = (ValueError, NotImplementedError, IndexError, struct.error)

MP4_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("brand", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_chunks", T.LongType()),
        T.StructField("n_sync", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_bytes", T.LongType()),
    ]
)


def mp4_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mp4_meta_stats' per-batch body, exposed for fuse() callers."""
    for pdf in batches:
        rows = []
        for mid, c in zip(pdf["media_id"], pdf["content"]):
            try:
                d = parse_mp4(bytes(c))
                t = d["tracks"][0]
                rows.append(
                    {
                        "media_id": mid,
                        "brand": d["brand"],
                        "codec": t["codec"],
                        "width": t["width"],
                        "height": t["height"],
                        "n_samples": t["n_samples"],
                        "n_chunks": t["n_chunks"],
                        "n_sync": len(t["sync"]),
                        "duration_ms": d["duration_ms"],
                        "sample_bytes": sum(s for _, s in t["samples"]),
                    }
                )
            except _POISON:
                rows.append(
                    {
                        "media_id": mid,
                        "brand": "",
                        "codec": "",
                        "width": -1,
                        "height": -1,
                        "n_samples": -1,
                        "n_chunks": -1,
                        "n_sync": -1,
                        "duration_ms": 0,
                        "sample_bytes": 0,
                    }
                )
        yield pd.DataFrame(rows)


def mp4_meta_stats(df: DataFrame) -> DataFrame:
    """REAL container metadata off (media_id, content) MP4 blobs: brand,
    first video track's codec/dims, resolved sample-table shape and
    total payload volume. Poison contract: undecodable rows -> one
    width = -1 sentinel row, the batch survives."""
    return df.mapInPandas(mp4_meta_batches, schema=MP4_META_SCHEMA)


MP4_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_no", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def mp4_sync_frames_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mp4_sync_frames' per-batch body, exposed for fuse() callers."""
    for pdf in batches:
        rows = []
        for mid, c in zip(pdf["media_id"], pdf["content"]):
            try:
                b = bytes(c)
                d = parse_mp4(b)
                t = d["tracks"][0]
                media_rows = []
                for sno in t["sync"]:
                    payload = sample_bytes(b, t, sno)
                    media_rows.append(
                        {
                            "media_id": mid,
                            "sample_no": sno,
                            "ts_ms": t["ts"][sno - 1]
                            * 1000
                            // t["timescale"],
                            "n_bytes": len(payload),
                            "byte_sum": sum(payload),
                        }
                    )
                rows.extend(media_rows)
            except _POISON:
                rows.append(
                    {
                        "media_id": mid,
                        "sample_no": -1,
                        "ts_ms": 0,
                        "n_bytes": 0,
                        "byte_sum": 0,
                    }
                )
        yield pd.DataFrame(rows)


def mp4_sync_frames(df: DataFrame) -> DataFrame:
    """REAL video frame-sampling: per MP4 blob, extract every SYNC
    sample's payload bytes via the resolved sample table (stss x
    stsc/stco/stsz) and emit one row per keyframe — 1-based sample
    number, decode timestamp in ms, extracted size and byte sum. The
    blob never leaves the worker. Poison contract (all-or-nothing per
    media, the audio_window_stats discipline): rows for a media are
    committed only after every sync sample extracted; on any failure a
    single sample_no = -1 sentinel row stands in."""
    return df.mapInPandas(mp4_sync_frames_batches, schema=MP4_FRAME_SCHEMA)


MP3_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bitrate_kbps", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("audio_frames", T.LongType()),
        T.StructField("is_vbr", T.BooleanType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("id3_bytes", T.LongType()),
        T.StructField("junk_bytes", T.LongType()),
        T.StructField("stream_bytes", T.LongType()),
    ]
)


def mp3_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mp3_meta_stats' per-batch body, exposed for fuse() callers."""
    for pdf in batches:
        rows = []
        for mid, c in zip(pdf["media_id"], pdf["content"]):
            try:
                d = walk_mp3(bytes(c))
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": d["sample_rate"],
                        "bitrate_kbps": d["bitrate_kbps"],
                        "n_frames": d["n_frames"],
                        "audio_frames": d["audio_frames"],
                        "is_vbr": d["is_vbr"],
                        "duration_ms": d["duration_ms"],
                        "id3_bytes": d["id3_bytes"],
                        "junk_bytes": d["junk_bytes"],
                        "stream_bytes": d["stream_bytes"],
                    }
                )
            except _POISON:
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": -1,
                        "bitrate_kbps": -1,
                        "n_frames": -1,
                        "audio_frames": -1,
                        "is_vbr": False,
                        "duration_ms": 0,
                        "id3_bytes": 0,
                        "junk_bytes": 0,
                        "stream_bytes": 0,
                    }
                )
        yield pd.DataFrame(rows)


def mp3_meta_stats(df: DataFrame) -> DataFrame:
    """REAL mp3 frame-layer metadata off (media_id, content): walked
    physical frames, Xing-aware audio frame count and duration, tag /
    junk / stream byte accounting. Poison contract: undecodable rows ->
    one sample_rate = -1 sentinel row."""
    return df.mapInPandas(mp3_meta_batches, schema=MP3_META_SCHEMA)


MP4_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("caption_idx", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("end_ts_ms", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def mp4_text_samples_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mp4_text_samples' per-batch body, exposed for fuse() callers."""
    from purldb_spark.multimodal.mp4 import parse_tx3g
    for pdf in batches:
        rows = []
        for mid, c in zip(pdf["media_id"], pdf["content"]):
            try:
                b = bytes(c)
                d = parse_mp4(b)
                text_tracks = [
                    t for t in d["tracks"] if t["kind"] == "text"
                ]
                if not text_tracks:
                    continue
                t = text_tracks[0]
                scale = t["timescale"]
                media_rows = []
                for k in range(t["n_samples"]):
                    start = t["ts"][k]
                    end = (
                        t["ts"][k + 1]
                        if k + 1 < t["n_samples"]
                        else t["duration"]
                    )
                    media_rows.append(
                        {
                            "media_id": mid,
                            "caption_idx": k + 1,
                            "ts_ms": start * 1000 // scale,
                            "end_ts_ms": end * 1000 // scale,
                            "text": parse_tx3g(
                                sample_bytes(b, t, k + 1)
                            ),
                        }
                    )
                rows.extend(media_rows)
            except _POISON:
                rows.append(
                    {
                        "media_id": mid,
                        "caption_idx": -1,
                        "ts_ms": 0,
                        "end_ts_ms": 0,
                        "text": "",
                    }
                )
        yield pd.DataFrame(
            rows, columns=[f.name for f in MP4_TEXT_SCHEMA.fields]
        )


def mp4_text_samples(df: DataFrame) -> DataFrame:
    """REAL subtitle-track extraction: for each MP4 blob, decode every
    sample of the first 'text' track as a tx3g timed-text sample —
    1-based caption index, stts start timestamp, end timestamp (next
    sample's start; the mdhd duration for the last), and the utf-8
    text itself. A container WITHOUT a text track contributes zero rows
    (absence is a fact, not poison); a torn container contributes one
    caption_idx = -1 sentinel row (all-or-nothing per media, as
    mp4_sync_frames)."""
    return df.mapInPandas(mp4_text_samples_batches, schema=MP4_TEXT_SCHEMA)


MP3_TAG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("tag_version", T.IntegerType()),
        T.StructField("n_frames_tag", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("artist", T.StringType()),
        T.StructField("album", T.StringType()),
    ]
)


def mp3_tag_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mp3_tag_stats' per-batch body, exposed for fuse() callers."""
    from purldb_spark.multimodal.mp3 import parse_id3_frames
    for pdf in batches:
        rows = []
        for mid, c in zip(pdf["media_id"], pdf["content"]):
            try:
                d = parse_id3_frames(bytes(c))
                f = d["frames"]
                rows.append(
                    {
                        "media_id": mid,
                        "tag_version": d["version"],
                        "n_frames_tag": d["n_frames"],
                        "title": f.get("TIT2"),
                        "artist": f.get("TPE1"),
                        "album": f.get("TALB"),
                    }
                )
            except _POISON:
                rows.append(
                    {
                        "media_id": mid,
                        "tag_version": -1,
                        "n_frames_tag": -1,
                        "title": None,
                        "artist": None,
                        "album": None,
                    }
                )
        yield pd.DataFrame(
            rows, columns=[f.name for f in MP3_TAG_SCHEMA.fields]
        )


def mp3_tag_stats(df: DataFrame) -> DataFrame:
    """REAL ID3v2 FRAME extraction (not just tag skip): per blob the
    leading tag's text frames decode to (title TIT2, artist TPE1,
    album TALB — null when the frame is absent) plus version and frame
    count. Poison contract: no tag / malformed tag -> one
    tag_version = -1 sentinel row."""
    return df.mapInPandas(mp3_tag_batches, schema=MP3_TAG_SCHEMA)


MP4_FRAG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("base_ts_ms", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("frag_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def mp4_fragment_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mp4_fragment_stats' per-batch body, exposed for fuse() callers."""
    from purldb_spark.multimodal.mp4 import parse_fmp4
    for pdf in batches:
        rows = []
        for mid, c in zip(pdf["media_id"], pdf["content"]):
            try:
                b = bytes(c)
                d = parse_fmp4(b)
                scale = d["timescale"]
                media_rows = []
                for f in d["fragments"]:
                    media_rows.append(
                        {
                            "media_id": mid,
                            "seq": f["seq"],
                            "base_ts_ms": f["base_ts"] * 1000 // scale,
                            "n_samples": len(f["samples"]),
                            "frag_bytes": sum(
                                s for _, s, _ in f["samples"]
                            ),
                            "byte_sum": sum(
                                sum(b[o : o + s])
                                for o, s, _ in f["samples"]
                            ),
                        }
                    )
                rows.extend(media_rows)
            except _POISON:
                rows.append(
                    {
                        "media_id": mid,
                        "seq": -1,
                        "base_ts_ms": 0,
                        "n_samples": 0,
                        "frag_bytes": 0,
                        "byte_sum": 0,
                    }
                )
        yield pd.DataFrame(rows)


def mp4_fragment_stats(df: DataFrame) -> DataFrame:
    """REAL fragmented-MP4 (DASH/HLS) walk: one row per moof fragment —
    mfhd sequence, tfdt base decode time in ms, trun-resolved sample
    count, byte volume and extracted byte sum. Poison contract
    (all-or-nothing per media): one seq = -1 sentinel row."""
    return df.mapInPandas(mp4_fragment_batches, schema=MP4_FRAG_SCHEMA)


MP4_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("codec", T.StringType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_bytes", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def mp4_audio_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mp4_audio_stats' per-batch body, exposed for fuse() callers."""
    for pdf in batches:
        rows = []
        for mid, c in zip(pdf["media_id"], pdf["content"]):
            try:
                d = parse_mp4(bytes(c))
                souns = [t for t in d["tracks"] if t["kind"] == "soun"]
                if not souns:
                    continue
                t = souns[0]
                rows.append(
                    {
                        "media_id": mid,
                        "codec": t["codec"],
                        "channels": t["audio_channels"],
                        "sample_rate": t["audio_rate"],
                        "n_samples": t["n_samples"],
                        "sample_bytes": sum(
                            sz for _, sz in t["samples"]
                        ),
                        "duration_ms": t["duration"]
                        * 1000
                        // t["timescale"],
                    }
                )
            except _POISON:
                rows.append(
                    {
                        "media_id": mid,
                        "codec": "",
                        "channels": -1,
                        "sample_rate": -1,
                        "n_samples": 0,
                        "sample_bytes": 0,
                        "duration_ms": 0,
                    }
                )
        yield pd.DataFrame(
            rows, columns=[f.name for f in MP4_AUDIO_SCHEMA.fields]
        )


def mp4_audio_stats(df: DataFrame) -> DataFrame:
    """REAL MP4 audio-track metadata: the first 'soun' track's
    AudioSampleEntry fields (codec fourcc, channel count, 16.16
    sample rate), resolved sample count/volume and media duration in
    ms. Containers WITHOUT an audio track contribute nothing; torn
    containers one channels = -1 sentinel row."""
    return df.mapInPandas(mp4_audio_batches, schema=MP4_AUDIO_SCHEMA)
