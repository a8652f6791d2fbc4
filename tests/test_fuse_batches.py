"""r16 focused test: fuse() — the single-pass composition of encode and
decode/stats batch generators — is row-identical to chaining the
mapInPandas faces it replaced (guide §4: one Arrow boundary instead of
two; the blob stays inside the worker).

Pins, for each face the r16 fusion touched:
  df.mapInPandas(fuse(enc, X_batches), schema) == X(df.mapInPandas(enc))
including the 3-stage resize chain and the poison-blob sentinel path
(fusion must not change the per-row error containment).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pytest

from purldb_spark.multimodal.binaryops import (
    AUDIO_STATS_SCHEMA,
    IMAGE_STATS_SCHEMA,
    WINDOW_STATS_SCHEMA,
    audio_stats,
    audio_stats_batches,
    audio_window_stats,
    audio_window_stats_batches,
    encode_bmp,
    encode_wav,
    fuse,
    image_stats,
    image_stats_batches,
    resize_media,
    resize_media_batches,
)

ENC_SCHEMA = "media_id long, content binary"


def _bmp_enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        outs = []
        for i in pdf["id"]:
            i = int(i)
            if i == 7:  # poison: not a decodable blob
                outs.append(b"\x00garbage")
            else:
                outs.append(
                    encode_bmp(i % 5 + 1, i % 3 + 1, (i % 256, 2 * i % 256, 3 * i % 256))
                )
        yield pd.DataFrame({"media_id": pdf["id"], "content": outs})


def _wav_enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        outs = []
        for i in pdf["id"]:
            i = int(i)
            amp = (i % 8) * 4096
            samples = [amp if k % 2 == 0 else -amp for k in range(8 * (i % 4 + 1))]
            outs.append(encode_wav(8000, 1, 16, samples))
        yield pd.DataFrame({"media_id": pdf["id"], "content": outs})


def _rows(df):
    return sorted(map(repr, df.collect()))


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 40, 1, 4)


def test_fused_image_stats_identical(spark, ids):
    chained = image_stats(ids.mapInPandas(_bmp_enc, schema=ENC_SCHEMA))
    fused = ids.mapInPandas(
        fuse(_bmp_enc, image_stats_batches), schema=IMAGE_STATS_SCHEMA
    )
    rows = _rows(fused)
    assert rows == _rows(chained)
    # the poison row survived as the sentinel, inside the fused pass too
    assert any("width=-1" in r for r in rows)


def test_fused_audio_stats_identical(spark, ids):
    chained = audio_stats(ids.mapInPandas(_wav_enc, schema=ENC_SCHEMA))
    fused = ids.mapInPandas(
        fuse(_wav_enc, audio_stats_batches), schema=AUDIO_STATS_SCHEMA
    )
    assert _rows(fused) == _rows(chained)


def test_fused_window_stats_identical(spark, ids):
    chained = audio_window_stats(
        ids.mapInPandas(_wav_enc, schema=ENC_SCHEMA), n_windows=4
    )
    fused = ids.mapInPandas(
        fuse(_wav_enc, audio_window_stats_batches(4)),
        schema=WINDOW_STATS_SCHEMA,
    )
    assert _rows(fused) == _rows(chained)


def test_fused_three_stage_resize_identical(spark, ids):
    media = ids.mapInPandas(_bmp_enc, schema=ENC_SCHEMA)
    chained = image_stats(
        resize_media(media, 3, 3).select("media_id", "content")
    )
    fused = ids.mapInPandas(
        fuse(_bmp_enc, resize_media_batches(3, 3), image_stats_batches),
        schema=IMAGE_STATS_SCHEMA,
    )
    assert _rows(fused) == _rows(chained)


def test_fuse_is_plain_generator_composition():
    # driver-side, no Spark: fuse(f, g) must equal g(f(.)) batch-for-batch
    def double(batches):
        for pdf in batches:
            yield pdf.assign(x=pdf["x"] * 2)

    def add_one(batches):
        for pdf in batches:
            yield pdf.assign(x=pdf["x"] + 1)

    src = [pd.DataFrame({"x": [1, 2]}), pd.DataFrame({"x": [3]})]
    out = list(fuse(double, add_one)(iter(src)))
    expect = list(add_one(double(iter(src))))
    assert len(out) == len(expect) == 2
    for a, b in zip(out, expect):
        pd.testing.assert_frame_equal(a, b)
