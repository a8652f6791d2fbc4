"""Multimodal ingest stream (streaming/media_stream.py): REAL BMP/WAV
decode per micro-batch — and since r15 the MP4/MP3 container walks —
unified stats rows, replay idempotence (ledger anti-join), the
poison-blob quarantine, and a real AvailableNow drain."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from purldb_spark.multimodal.binaryops import encode_bmp, encode_wav
from purldb_spark.streaming.media_stream import (
    index_media_batch,
    media_sink,
    quarantine,
)

SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _rows(spark, stats_dir):
    if not os.path.isdir(stats_dir):
        return {}
    return {r.media_id: r for r in spark.read.parquet(stats_dir).collect()}


def _blob(mid):
    if mid % 3 == 0:
        return (mid, "image/bmp", bytearray(encode_bmp(4, 2, (mid % 256, 1, 2))))
    if mid % 3 == 1:
        return (
            mid,
            "audio/wav",
            bytearray(encode_wav(8000, 1, 16, [1024, -1024] * 4)),
        )
    return (mid, "application/x-unknown", bytearray(b"no codec for this"))


def test_batch_decodes_both_modalities_and_quarantines(spark, tmp_path):
    stats_dir = str(tmp_path / "stats")
    batch = spark.createDataFrame([_blob(i) for i in range(3, 9)], SCHEMA)
    index_media_batch(spark, batch, stats_dir)

    got = _rows(spark, stats_dir)
    assert len(got) == 6
    img = got[3]
    assert (img.decoded, img.width, img.height, img.channels) == (True, 4, 2, 3)
    aud = got[4]
    assert (aud.decoded, aud.sample_rate, aud.n_frames, aud.duration_ms) == (
        True, 8000, 8, 1,
    )
    assert aud.width is None and img.sample_rate is None
    bad = got[5]
    assert not bad.decoded
    q = {(r.media_id, r.media_type) for r in quarantine(spark, stats_dir).collect()}
    assert q == {(5, "application/x-unknown"), (8, "application/x-unknown")}


def test_replay_appends_nothing(spark, tmp_path):
    stats_dir = str(tmp_path / "stats")
    batch = spark.createDataFrame([_blob(i) for i in range(3, 7)], SCHEMA)
    index_media_batch(spark, batch, stats_dir)
    first = {(m, r.decoded) for m, r in _rows(spark, stats_dir).items()}
    index_media_batch(spark, batch, stats_dir)  # replayed epoch
    assert {(m, r.decoded) for m, r in _rows(spark, stats_dir).items()} == first
    assert spark.read.parquet(stats_dir).count() == 4  # no duplicate rows


def test_poison_blob_does_not_block_the_batch(spark, tmp_path):
    stats_dir = str(tmp_path / "stats")
    rows = [
        (1, "image/bmp", bytearray(encode_bmp(2, 2, (7, 8, 9)))),
        (2, "image/bmp", bytearray(b"BM torn upload, way too short")),
        (3, "audio/wav", bytearray(b"RIFFjunk")),
    ]
    index_media_batch(spark, spark.createDataFrame(rows, SCHEMA), stats_dir)
    got = _rows(spark, stats_dir)
    assert got[1].decoded and got[1].width == 2
    assert not got[2].decoded and not got[3].decoded


def test_sink_drains_through_a_real_stream(spark, tmp_path):
    src = str(tmp_path / "in")
    stats_dir = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(media_sink(spark, stats_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for batch in ([_blob(3), _blob(5)], [_blob(4)]):
        spark.createDataFrame(batch, SCHEMA).write.mode("append").parquet(src)
        drain()
    got = _rows(spark, stats_dir)
    assert len(got) == 3
    assert got[3].decoded and got[4].decoded and not got[5].decoded


def test_within_batch_duplicate_id_picks_deterministic_representative(
    spark, tmp_path
):
    """r13 advice: one media_id carrying DIFFERENT payloads in a single
    micro-batch must land a deterministic stats row — min by (content
    md5, media_type) — not whichever row dropDuplicates happened to
    keep, or a replay recomputing from a different survivor silently
    diverges behind the anti-join."""
    import hashlib

    a = bytearray(encode_bmp(4, 2, (10, 20, 30)))
    b = bytearray(encode_bmp(6, 3, (40, 50, 60)))
    winner = min(
        [(hashlib.md5(bytes(a)).hexdigest(), "image/bmp", a),
         (hashlib.md5(bytes(b)).hexdigest(), "image/bmp", b)]
    )
    exp_w = 4 if bytes(winner[2]) == bytes(a) else 6

    for order in ([a, b], [b, a]):  # arrival order must not matter
        stats_dir = str(tmp_path / f"stats_{exp_w}_{order[0][20]}")
        batch = spark.createDataFrame(
            [(7, "image/bmp", order[0]), (7, "image/bmp", order[1])], SCHEMA
        ).repartition(2)
        index_media_batch(spark, batch, stats_dir)
        rows = _rows(spark, stats_dir)
        assert len(rows) == 1 and rows[7].width == exp_w


def test_container_formats_decode_and_torn_ones_quarantine(spark, tmp_path):
    """r15: video/mp4 and audio/mpeg ride the container walks — a well-
    formed blob lands real duration/frame stats, a torn one quarantines
    without blocking the batch."""
    from purldb_spark.multimodal.mp3 import encode_mp3
    from purldb_spark.multimodal.mp4 import encode_mp4

    stats_dir = str(tmp_path / "stats")
    mp4_ok = encode_mp4(32, 16, [b"aa", b"bbb"], delta=25)
    mp3_ok = encode_mp3(64, 32000, 4, lambda k: k)
    batch = spark.createDataFrame(
        [
            (1, "video/mp4", bytearray(mp4_ok)),
            (2, "video/mp4", bytearray(mp4_ok[:20])),  # torn
            (3, "audio/mpeg", bytearray(mp3_ok)),
            (4, "audio/mpeg", bytearray(b"\x00" * 64)),  # no sync
        ],
        SCHEMA,
    )
    index_media_batch(spark, batch, stats_dir)
    got = _rows(spark, stats_dir)
    v = got[1]
    assert (v.decoded, v.width, v.height, v.n_frames, v.duration_ms) == (
        True, 32, 16, 2, 50,
    )
    a = got[3]
    assert (a.decoded, a.sample_rate, a.n_frames) == (True, 32000, 4)
    assert a.duration_ms == 4 * 1152 * 1000 // 32000
    assert not got[2].decoded and not got[4].decoded
    q = {r.media_id for r in quarantine(spark, stats_dir).collect()}
    assert q == {2, 4}
