"""REAL BMP/WAV decode (multimodal/binaryops): literal-byte goldens
(independent of the encoder, so a complementary encode/decode bug cannot
hide), format-variant coverage (8/24/32-bit BMP, top-down rows, 8-bit and
stereo PCM, extra RIFF chunks), the poison-blob contract of the Spark
faces, and the narrowed NotImplementedError boundary."""

from __future__ import annotations

import struct

import pytest

from purldb_spark.multimodal.binaryops import (
    audio_stats,
    decode_bmp,
    decode_media,
    decode_wav,
    encode_bmp,
    encode_wav,
    image_stats,
)


def _bmp(width, height, bits, pixel_bytes, compression=0):
    hdr = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, bits, compression, len(pixel_bytes), 0, 0, 0, 0,
    )
    return hdr + pixel_bytes


def test_bmp_literal_bytes_golden():
    # 2x2 24-bit, bottom-up, rows padded 6 -> 8 bytes; distinct pixels so
    # a stride or padding bug shifts the means
    rows = bytes([1, 2, 3, 4, 5, 6, 0xEE, 0xEE]) + bytes(
        [7, 8, 9, 10, 11, 12, 0xEE, 0xEE]
    )
    d = decode_bmp(_bmp(2, 2, 24, rows))
    assert (d["width"], d["height"], d["channels"], d["n_pixels"]) == (2, 2, 3, 4)
    # means over the 4 real pixels only — 0xEE padding must be excluded
    assert d["mean_b_e3"] == round((1 + 4 + 7 + 10) / 4 * 1000)
    assert d["mean_g_e3"] == round((2 + 5 + 8 + 11) / 4 * 1000)
    assert d["mean_r_e3"] == round((3 + 6 + 9 + 12) / 4 * 1000)


def test_bmp_top_down_and_widths():
    # negative height = top-down; means identical either way
    row = bytes([10, 20, 30]) + b"\x00"  # width 1, padded to 4
    up = decode_bmp(_bmp(1, 3, 24, row * 3))
    down = decode_bmp(_bmp(1, -3, 24, row * 3))
    assert up == down and up["height"] == 3
    # widths 1..9 exercise every padding remainder
    for w in range(1, 10):
        d = decode_bmp(encode_bmp(w, 2, (9, 8, 7)))
        assert (d["width"], d["n_pixels"]) == (w, 2 * w)
        assert (d["mean_b_e3"], d["mean_g_e3"], d["mean_r_e3"]) == (
            9000, 8000, 7000,
        )


def _bmp8(width, height, idxs, pal_bgr):
    """8-bit paletted BMP: palette entries are (B, G, R, 0) quads between
    the header and the pixel rows; pix_off points past them."""
    pal = b"".join(bytes(e) + b"\x00" for e in pal_bgr)
    pix_off = 54 + len(pal)
    stride = (width + 3) & ~3
    rows = b"".join(
        bytes(idxs[y * width : (y + 1) * width]) + b"\x00" * (stride - width)
        for y in range(height)
    )
    hdr = struct.pack(
        "<2sIHHI", b"BM", pix_off + len(rows), 0, 0, pix_off
    ) + struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 8, 0, len(rows), 0, 0, len(pal_bgr), 0,
    )
    return hdr + pal + rows


def test_bmp_8bit_and_32bit_variants():
    # 8-bit pixels are palette INDICES (r13 advice): a color palette must
    # decode to its BGR entries, not report the raw index bytes
    c = decode_bmp(_bmp8(2, 1, [0, 1], [(10, 20, 30), (50, 60, 70)]))
    assert (c["channels"], c["mean_b_e3"], c["mean_g_e3"], c["mean_r_e3"]) == (
        3, 30000, 40000, 50000,
    )
    # grayscale-identity palette: all three channels read the gray level
    g = decode_bmp(_bmp8(3, 1, [100, 100, 100], [(i, i, i) for i in range(256)]))
    assert (g["channels"], g["mean_b_e3"], g["mean_g_e3"]) == (3, 100000, 100000)
    px = bytes([1, 2, 3, 4] * 2)  # 2 BGRA pixels, stride already aligned
    a = decode_bmp(_bmp(2, 1, 32, px))
    assert (a["channels"], a["n_pixels"], a["mean_b_e3"]) == (4, 2, 1000)


def test_bmp_8bit_palette_rejections():
    # no palette between header and pixels -> poison, not silent garbage
    with pytest.raises(ValueError):
        decode_bmp(_bmp(3, 1, 8, bytes([100, 100, 100]) + b"\x00"))
    # pixel index beyond the declared palette -> poison
    with pytest.raises(ValueError):
        decode_bmp(_bmp8(2, 1, [0, 3], [(1, 1, 1), (2, 2, 2)]))


def test_bmp_rejections():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG nonsense that is long enough to pass the length gate" * 2)
    with pytest.raises(NotImplementedError):
        decode_bmp(_bmp(2, 2, 4, bytes(16), compression=2))  # RLE4
    with pytest.raises(ValueError):
        decode_bmp(_bmp(2, 2, 24, bytes(16), compression=1))  # RLE8@24bit
    with pytest.raises(NotImplementedError):
        decode_bmp(_bmp(2, 2, 4, bytes(16)))  # 4-bit paletted


def test_wav_literal_bytes_golden():
    # 4 frames mono 16-bit @ 1000 Hz: [100, -100, 200, -200]
    data = struct.pack("<4h", 100, -100, 200, -200)
    fmt = struct.pack("<HHIIHH", 1, 1, 1000, 2000, 2, 16)
    wav = (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )
    d = decode_wav(wav)
    assert (d["sample_rate"], d["channels"], d["bits"], d["n_frames"]) == (
        1000, 1, 16, 4,
    )
    assert d["duration_ms"] == 4
    rms = ((100**2 + 100**2 + 200**2 + 200**2) / 4) ** 0.5
    assert d["rms_e3"] == round(rms / 32768 * 1000)


def test_wav_extra_chunk_and_odd_size_alignment():
    # a LIST chunk with an ODD size before data: the walker must apply
    # word alignment or it desyncs and misses the data chunk
    data = struct.pack("<2h", 4096, -4096)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        struct.pack("<4sI4s", b"RIFF", 0, b"WAVE")
        + struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # pad byte
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )
    d = decode_wav(wav)
    assert (d["n_frames"], d["rms_e3"]) == (2, 125)


def test_wav_8bit_stereo():
    # stereo 8-bit: 3 frames of (+50, -50) around the 128 bias
    d = decode_wav(encode_wav(4000, 2, 8, [50, -50] * 3))
    assert (d["channels"], d["bits"], d["n_frames"]) == (2, 8, 3)
    assert d["rms_e3"] == round(50 / 128 * 1000)


def test_wav_rejections():
    with pytest.raises(ValueError):
        decode_wav(b"OggS definitely not riff")
    # format tag 85 = MP3-in-WAV: a genuine codec boundary
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)
    wav = (
        struct.pack("<4sI4s", b"RIFF", 0, b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", 2) + b"\x00\x00"
    )
    with pytest.raises(NotImplementedError):
        decode_wav(wav)


def test_decode_media_dispatch_narrowed():
    bmp = encode_bmp(5, 4, (1, 2, 3))
    assert decode_media("image/bmp", bmp) == (5, 4)
    # r14: PNG decodes for real (stdlib zlib); r15: baseline JPEG too
    from purldb_spark.multimodal.binaryops import encode_png
    from purldb_spark.multimodal.jpeg import encode_jpeg_gray_mosaic

    assert decode_media("image/png", encode_png(6, 2, 2, (9, 9, 9))) == (6, 2)
    assert decode_media(
        "image/jpeg", encode_jpeg_gray_mosaic(10, 9, lambda bx, by: 7)
    ) == (10, 9)
    with pytest.raises(ValueError):
        decode_media("image/jpeg", b"\xff\xd8\xff\xe0 torn jfif bytes")
    # r15: MP4 container dims are real (tkhd through the box walk)
    from purldb_spark.multimodal.mp4 import encode_mp4

    assert decode_media("video/mp4", encode_mp4(32, 24, [b"xx"])) == (32, 24)
    # frame-payload DSP is the remaining genuine codec boundary
    with pytest.raises(NotImplementedError):
        decode_media("audio/mp3", b"\xff\xfb whatever")
    assert decode_media("fake/image", b"x" * 10) == (11, 11)


def test_spark_faces_decode_and_poison_contract(spark):
    rows = [
        (1, bytearray(encode_bmp(4, 3, (10, 20, 30)))),
        (2, bytearray(b"not an image at all, long enough to check magic")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in image_stats(df).collect()}
    assert (got[1].width, got[1].height, got[1].mean_r_e3) == (4, 3, 30000)
    assert got[2].width == -1  # poison blob survives the batch

    arows = [
        (1, bytearray(encode_wav(8000, 1, 16, [8192, -8192] * 4))),
        (2, bytearray(b"junk bytes")),
    ]
    adf = spark.createDataFrame(arows, "media_id long, content binary")
    agot = {r.media_id: r for r in audio_stats(adf).collect()}
    assert (agot[1].sample_rate, agot[1].n_frames, agot[1].rms_e3) == (
        8000, 8, 250,
    )
    assert agot[2].sample_rate == -1


def test_real_feature_vectors_from_decoded_bytes(spark):
    """r13: embed_media computes REAL features for decodable formats —
    BMP color statistics and WAV energy/zero-crossing/spectral stats —
    while fake/* and poison rows keep the deterministic md5 fallback
    (the embedding-space twin of the sentinel contract)."""
    import numpy as np

    from purldb_spark.multimodal.binaryops import (
        bmp_features,
        embed_media,
        wav_features,
    )

    bmp = encode_bmp(8, 4, (255, 0, 128))
    wav = encode_wav(8000, 1, 16, [16384, -16384] * 50)
    rows = [
        (1, "image/bmp", bytearray(bmp)),
        (2, "audio/wav", bytearray(wav)),
        (3, "fake/image", bytearray(b"hello")),
        (4, "image/bmp", bytearray(b"torn")),
    ]
    df = spark.createDataFrame(rows, "media_id long, media_type string, content binary")
    got = {r.media_id: list(r.embedding) for r in embed_media(df).collect()}
    assert all(len(v) == 16 for v in got.values())

    # image: spark vector equals the pure-python features; solid color
    # means per-channel std 0 and mean == channel/255
    exp = bmp_features(bmp)
    assert np.allclose(got[1], np.array(exp, dtype=np.float32), atol=1e-6)
    assert abs(exp[0] - 1.0) < 1e-9 and exp[1] == 0.0  # B: mean 1, std 0
    assert exp[4] == 0.0  # G mean 0

    # audio: rms of a +/-0.5 square wave is 0.5; zero-crossing rate ~1
    expw = wav_features(wav)
    assert np.allclose(got[2], np.array(expw, dtype=np.float32), atol=1e-6)
    assert abs(expw[0] - 0.5) < 1e-6
    assert expw[1] > 0.9

    # fallback paths: md5-derived, bounded [0,1]
    assert all(0.0 <= v <= 1.0 for v in got[3])
    assert got[3] != got[4]


# ---------------------------------------------------------------- property --

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=80, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 20),
    bgr=st.tuples(
        st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
    ),
)
def test_bmp_roundtrip_property(w, h, bgr):
    """encode->decode is exact for every (width, height, color): dims,
    pixel count, and per-channel means (solid color -> mean = c*1000
    exactly) — every 4-byte padding remainder and both dims covered."""
    d = decode_bmp(encode_bmp(w, h, bgr))
    assert (d["width"], d["height"], d["n_pixels"]) == (w, h, w * h)
    assert (d["mean_b_e3"], d["mean_g_e3"], d["mean_r_e3"]) == tuple(
        c * 1000 for c in bgr
    )


@settings(max_examples=60, deadline=None)
@given(
    rate=st.sampled_from([1000, 8000, 16000, 44100]),
    channels=st.integers(1, 2),
    bits=st.sampled_from([8, 16]),
    samples=st.lists(st.integers(-120, 120), min_size=2, max_size=200),
)
def test_wav_roundtrip_property(rate, channels, bits, samples):
    """encode->decode preserves rate/channels/bits/frame count and the
    RMS matches a direct numpy computation over the same samples (8-bit
    values stay in the signed-byte range by construction)."""
    import numpy as np

    # frames must divide evenly into channels
    if len(samples) % channels:
        samples = samples[: len(samples) - (len(samples) % channels)]
    if not samples:
        samples = [0] * channels
    d = decode_wav(encode_wav(rate, channels, bits, samples))
    assert (d["sample_rate"], d["channels"], d["bits"]) == (
        rate, channels, bits,
    )
    assert d["n_frames"] == len(samples) // channels
    arr = np.array(samples, dtype=np.int64)
    full = 32768.0 if bits == 16 else 128.0
    rms = float(np.sqrt((arr * arr).mean()))
    assert d["rms_e3"] == round(rms / full * 1000)
    assert d["duration_ms"] == round(d["n_frames"] * 1000 / rate)


def test_poison_blobs_hit_sentinels_not_stage_failures(spark):
    """r13 review findings: decode paths raise ValueError (bad magic) and
    struct.error (truncated fmt chunk) — every Spark face must map ALL of
    them to sentinels, and feature extraction must enforce the same
    format boundary as the stats face (a 16-bit BMP used to embed as
    silent garbage while image_stats correctly rejected it)."""
    import struct as _struct

    from pyspark.sql import functions as F

    from purldb_spark.multimodal.binaryops import bmp_features, embed_media, extract_meta

    # truncated fmt chunk: struct.error inside decode_wav
    torn_wav = (
        _struct.pack("<4sI4s", b"RIFF", 20, b"WAVE")
        + _struct.pack("<4sI", b"fmt ", 4) + b"\x01\x00\x01\x00"
    )
    # 4-bit BMP: decode_bmp raises NotImplementedError (16-bit RGB555
    # decodes for real since r15 — see test_bmp16_literal_bytes_golden)
    bmp16 = _bmp(2, 2, 4, bytes(16))
    rows = [
        (1, "audio/wav", bytearray(torn_wav)),
        (2, "image/bmp", bytearray(b"BM torn upload")),
        (3, "image/bmp", bytearray(bmp16)),
    ]
    df = spark.createDataFrame(rows, "media_id long, media_type string, content binary")

    a = {r.media_id: r for r in audio_stats(df.filter("media_id = 1").select("media_id", "content")).collect()}
    assert a[1].sample_rate == -1

    # extract_meta (the mm_decode_meta face) must survive ValueError BMPs
    m = {r.media_id: r for r in extract_meta(df).collect()}
    assert m[2].width == -1 and m[3].width == -1

    # the feature extractor takes the md5 fallback for BOTH rejects
    got = {r.media_id: list(r.embedding) for r in embed_media(df).collect()}
    import hashlib as _h

    for mid in (2, 3):
        blob = bytes(rows[mid - 1][2])
        exp = [x / 255.0 for x in _h.md5(blob).digest()[:16]]
        assert got[mid] == [float(f"{v:.7g}") if False else v for v in [round(x, 10) for x in exp]] or all(
            abs(g - e) < 1e-6 for g, e in zip(got[mid], exp)
        )
    with pytest.raises(NotImplementedError):
        bmp_features(bmp16)  # same boundary as decode_bmp


def test_wav_features_are_exactly_embed_dim_with_rate(spark):
    """The sample-rate dim must survive (it was silently truncated when
    the window profile used 8 windows): two WAVs differing only in rate
    embed differently, and the vector is exactly EMBED_DIM long."""
    from purldb_spark.multimodal.binaryops import EMBED_DIM, wav_features

    a = wav_features(encode_wav(8000, 1, 16, [1000, -1000] * 10))
    b = wav_features(encode_wav(16000, 1, 16, [1000, -1000] * 10))
    assert len(a) == len(b) == EMBED_DIM
    assert a[:-1] == b[:-1] and a[-1] != b[-1]


# -------------------------------------------------------------------- png --


def _png_chunks_raw(ihdr_fields, idat_raw, plte=None):
    """Hand-build PNG bytes straight from zlib — independent of
    encode_png, so a complementary encode/decode bug cannot hide."""
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d)
        )

    out = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(idat_raw)) + chunk(b"IEND", b"")


def test_png_literal_bytes_golden_with_up_filter():
    """2x2 RGB, row 0 filter None, row 1 filter Up: the reconstructed
    second row is row0 + deltas — a filter bug shifts every mean."""
    from purldb_spark.multimodal.binaryops import decode_png

    row0 = bytes([0]) + bytes([10, 20, 30, 40, 50, 60])
    row1 = bytes([2]) + bytes([5, 5, 5, 5, 5, 5])  # Up -> 15..65
    d = decode_png(_png_chunks_raw((2, 2, 8, 2, 0, 0, 0), row0 + row1))
    assert (d["width"], d["height"], d["channels"], d["n_pixels"]) == (2, 2, 3, 4)
    assert d["mean_r_e3"] == round((10 + 40 + 15 + 45) / 4 * 1000)
    assert d["mean_g_e3"] == round((20 + 50 + 25 + 55) / 4 * 1000)
    assert d["mean_b_e3"] == round((30 + 60 + 35 + 65) / 4 * 1000)


def test_png_sub_and_paeth_filters_golden():
    """Sub (left-predictor) and Paeth rows hand-computed: filt bytes are
    raw - predictor mod 256, so decode must invert them exactly."""
    from purldb_spark.multimodal.binaryops import decode_png

    # 3px-wide grayscale. raw row0 = [100, 110, 130], Sub filt = [100, 10, 20]
    row0 = bytes([1]) + bytes([100, 10, 20])
    # row1 raw = [90, 120, 125]; Paeth predictors: a=0,b=100,c=0 -> 100;
    # then a=90,b=110,c=100 -> p=100,pa=10,pb=10,pc=0 -> c=100;
    # then a=120,b=130,c=110 -> p=140,pa=20,pb=10,pc=30 -> b=130
    row1 = bytes([4]) + bytes([(90 - 100) & 0xFF, (120 - 100) & 0xFF, (125 - 130) & 0xFF])
    d = decode_png(_png_chunks_raw((3, 2, 8, 0, 0, 0, 0), row0 + row1))
    mean = (100 + 110 + 130 + 90 + 120 + 125) / 6
    assert d["channels"] == 1
    assert d["mean_r_e3"] == d["mean_g_e3"] == d["mean_b_e3"] == round(mean * 1000)


def test_png_paletted():
    from purldb_spark.multimodal.binaryops import decode_png

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 128])
    row = bytes([0]) + bytes([0, 1, 2, 1])
    d = decode_png(_png_chunks_raw((4, 1, 8, 3, 0, 0, 0), row, plte=pal))
    assert d["channels"] == 3
    assert d["mean_r_e3"] == round(255 / 4 * 1000)
    assert d["mean_g_e3"] == round(510 / 4 * 1000)
    assert d["mean_b_e3"] == round(128 / 4 * 1000)
    # index past the palette end -> poison
    with pytest.raises(ValueError):
        decode_png(
            _png_chunks_raw((1, 1, 8, 3, 0, 0, 0), bytes([0, 7]), plte=pal)
        )


def test_png_rejections_and_boundaries():
    from purldb_spark.multimodal.binaryops import decode_png

    with pytest.raises(ValueError):
        decode_png(b"BM this is a bmp not a png, padded to length......")
    # 16-bit depth decodes for real since r15 (high-byte reduction)
    d16 = decode_png(_png_chunks_raw((1, 1, 16, 2, 0, 0, 0), bytes(7)))
    assert (d16["width"], d16["n_pixels"]) == (1, 1)
    # Adam7 interlace decodes for real since r15: a 1x1 interlaced RGB
    # is one pass-1 scanline (filter byte + 3 samples)
    d = decode_png(_png_chunks_raw((1, 1, 8, 2, 0, 0, 1), bytes(4)))
    assert (d["width"], d["height"], d["n_pixels"]) == (1, 1, 1)
    # interlace methods beyond 0/1 are malformed, not a boundary
    with pytest.raises(ValueError):
        decode_png(_png_chunks_raw((1, 1, 8, 2, 0, 0, 2), bytes(4)))
    # truncated scanline stream (fewer rows than height) -> poison
    with pytest.raises(ValueError):
        decode_png(_png_chunks_raw((2, 3, 8, 2, 0, 0, 0), bytes([0]) + bytes(6)))


from hypothesis import given as _given  # noqa: E402
from hypothesis import settings as _settings  # noqa: E402
from hypothesis import strategies as _st  # noqa: E402


@_settings(max_examples=60, deadline=None)
@_given(
    w=_st.integers(1, 24),
    h=_st.integers(1, 12),
    ct=_st.sampled_from([0, 2, 6]),
    rgb=_st.tuples(
        _st.integers(0, 255), _st.integers(0, 255), _st.integers(0, 255)
    ),
)
def test_png_roundtrip_property(w, h, ct, rgb):
    """encode->decode is exact for every (dims, color type, color); the
    encoder cycles the row filter through all five types, so any
    unfilter branch that mis-reconstructs (incl. Paeth) breaks the
    solid-color means."""
    from purldb_spark.multimodal.binaryops import decode_png, encode_png

    d = decode_png(encode_png(w, h, ct, rgb))
    assert (d["width"], d["height"], d["n_pixels"]) == (w, h, w * h)
    if ct == 0:
        assert d["mean_r_e3"] == d["mean_g_e3"] == d["mean_b_e3"] == rgb[0] * 1000
    else:
        assert (d["mean_r_e3"], d["mean_g_e3"], d["mean_b_e3"]) == tuple(
            c * 1000 for c in rgb
        )
    assert d["channels"] == {0: 1, 2: 3, 6: 4}[ct]


def test_png_features_and_image_stats_dispatch(spark):
    """png_features matches the bmp feature layout so PNG media land in
    the same embedding space; image_stats sniffs PNG magic and decodes
    both formats in one face."""
    from purldb_spark.multimodal.binaryops import (
        encode_png,
        image_stats,
        png_features,
    )

    png = encode_png(4, 3, 2, (51, 102, 204))
    f = png_features(png)
    assert len(f) == 16
    # canonical B,G,R dim order (r15 fix): dims 0/4/8 are B/G/R means
    assert abs(f[0] - 204 / 255) < 1e-12 and f[1] == 0.0  # B mean/std
    assert abs(f[4] - 102 / 255) < 1e-12  # G mean
    assert abs(f[8] - 51 / 255) < 1e-12  # R mean
    # the SAME color through BMP and PNG must featurize IDENTICALLY —
    # the one-comparable-embedding-space contract the r14 RGB-order
    # png_features silently broke for colored images
    from purldb_spark.multimodal.binaryops import bmp_features

    fb = bmp_features(encode_bmp(4, 3, (204, 102, 51)))  # BGR arg order
    assert f == fb
    rows = [
        (1, bytearray(png)),
        (2, bytearray(encode_bmp(4, 3, (51, 102, 204)))),
        (3, bytearray(b"neither format, long enough to pass length gates")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in image_stats(df).collect()}
    # PNG is RGB, BMP arg order is BGR: same stats when colors mirror
    assert (got[1].mean_r_e3, got[1].mean_g_e3, got[1].mean_b_e3) == (
        51000, 102000, 204000,
    )
    assert (got[2].mean_b_e3, got[2].mean_g_e3, got[2].mean_r_e3) == (
        51000, 102000, 204000,
    )
    assert got[3].width == -1


# ------------------------------------------------------------------ resize --


def test_resize_image_nearest_neighbor_exact():
    """NN index map is floor(dst*src/dst_dim): 2x2 -> 3x3 duplicates
    source col/row 0 with weights 4:2:2:1 — checked pixel-exact, not
    just via means."""
    import numpy as np

    from purldb_spark.multimodal.binaryops import (
        _bmp_pixels,
        encode_bmp_pixels,
        resize_image,
    )

    src = np.array(
        [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8
    )
    out = resize_image(encode_bmp_pixels(src), 3, 3)
    pix, w, h = _bmp_pixels(out)
    assert (w, h) == (3, 3)
    grid = pix.reshape(3, 3, 3)
    exp = src[np.ix_([0, 0, 1], [0, 0, 1])]
    assert (grid == exp).all()
    # downscale 2x2 -> 1x1 keeps pixel (0,0)
    one = _bmp_pixels(resize_image(encode_bmp_pixels(src), 1, 1))[0]
    assert list(one[0]) == [1, 2, 3]


def test_resize_image_png_input_flips_to_bgr_and_gray_replicates():
    from purldb_spark.multimodal.binaryops import (
        _bmp_pixels,
        encode_png,
        resize_image,
    )

    # PNG stores RGB; the BMP output must store BGR of the same color
    out = resize_image(encode_png(2, 2, 2, (10, 20, 30)), 2, 2)
    pix, _, _ = _bmp_pixels(out)
    assert list(pix[0]) == [30, 20, 10]
    # grayscale PNG replicates its channel
    g = resize_image(encode_png(2, 2, 0, (77, 0, 0)), 4, 4)
    gp, w, h = _bmp_pixels(g)
    assert (w, h) == (4, 4) and list(gp[0]) == [77, 77, 77]


def test_resize_media_real_path_and_fallback(spark):
    """Decodable blobs take the REAL NN path (output is a BMP whose
    stats decode to the resample); undecodable blobs keep the
    byte-cycle fallback with n_bytes == width*height."""
    from purldb_spark.multimodal.binaryops import decode_bmp, resize_media

    rows = [
        (1, bytearray(encode_bmp(8, 8, (5, 6, 7)))),
        (2, bytearray(b"not an image, just bytes")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in resize_media(df, 4, 2).collect()}
    d = decode_bmp(bytes(got[1].content))
    assert (d["width"], d["height"]) == (4, 2)
    assert (d["mean_b_e3"], d["mean_g_e3"], d["mean_r_e3"]) == (
        5000, 6000, 7000,
    )
    assert got[1].n_bytes == len(bytes(got[1].content))
    assert got[2].n_bytes == 8 and len(bytes(got[2].content)) == 8


@_settings(max_examples=80, deadline=None)
@_given(
    w=_st.integers(1, 12),
    h=_st.integers(1, 10),
    ct=_st.sampled_from([0, 2, 6]),
    seed=_st.integers(0, 2**31),
)
def test_png_random_pixels_roundtrip_pixel_exact(w, h, ct, seed):
    """Filter/unfilter round-trip on ARBITRARY pixel grids, checked
    PIXEL-exact (not via means): solid images filter to mostly-zero
    bytes that can cancel an indexing or Average-rounding bug — random
    content cannot. The encoder cycles all five filter types, so with
    h >= 5 every unfilter branch runs against random data."""
    import random

    import numpy as np

    from purldb_spark.multimodal.binaryops import (
        _png_pixels,
        encode_png_pixels,
    )

    rng = random.Random(seed)
    ch = {0: 1, 2: 3, 6: 4}[ct]
    rows = [
        bytes(rng.randrange(256) for _ in range(w * ch)) for _ in range(h)
    ]
    pix, gw, gh = _png_pixels(encode_png_pixels(rows, ct))
    assert (gw, gh) == (w, h)
    exp = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h * w, ch)
    assert (pix == exp).all()


def test_png_corrupt_deflate_is_poison_not_stage_death(spark):
    """zlib.error from a torn IDAT must translate to the poison-blob
    ValueError contract — it is NOT in the Spark faces' catch tuples,
    so an untranslated corrupt-deflate PNG would kill the batch."""
    import struct as _struct
    import zlib as _zlib

    from purldb_spark.multimodal.binaryops import decode_png, image_stats

    def chunk(t, d):
        return _struct.pack(">I", len(d)) + t + d + _struct.pack(
            ">I", _zlib.crc32(t + d)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = _struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    torn = (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"\x78\x9c not really deflate")
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(torn)
    df = spark.createDataFrame(
        [(1, bytearray(torn))], "media_id long, content binary"
    )
    row = image_stats(df).collect()[0]
    assert row.width == -1  # sentinel, batch survived


def test_wav_window_slicing_frame_aligned_with_remainder():
    """slice_wav_windows: frames never split (slices are block_align
    multiples), the remainder rides in the last window, every window is
    an independently-decodable WAV with the source fmt — checked on
    stereo 16-bit where a byte-level split would desync channels."""
    from purldb_spark.multimodal.binaryops import (
        decode_wav,
        encode_wav,
        slice_wav_windows,
    )

    # stereo, 11 frames (22 samples): 4 windows of 2,2,2,5 frames
    samples = [(100 * (i + 1)) * (1 if i % 2 == 0 else -1) for i in range(22)]
    wav = encode_wav(4000, 2, 16, samples)
    wins = slice_wav_windows(wav, 4)
    assert len(wins) == 4
    stats = [decode_wav(w) for w in wins]
    assert [s["n_frames"] for s in stats] == [2, 2, 2, 5]
    assert all(s["channels"] == 2 and s["sample_rate"] == 4000 for s in stats)
    # total energy conserved: sum of per-window sum-of-squares equals the
    # whole file's (frame alignment means no sample lost or duplicated)
    import numpy as np

    whole = np.array(samples, dtype=np.int64)
    parts = []
    for w in wins:
        d = bytes(w)
        off = d.rindex(b"data") + 8
        parts.append(np.frombuffer(d[off:], dtype="<i2").astype(np.int64))
    assert sum(int((p * p).sum()) for p in parts) == int((whole * whole).sum())


def test_audio_window_stats_poison_contract(spark):
    from purldb_spark.multimodal.binaryops import audio_window_stats

    rows = [
        (1, bytearray(encode_wav(8000, 1, 16, [4096, -4096] * 8))),
        (2, bytearray(b"not riff at all")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = sorted(
        (r.media_id, r.window_idx, r.n_frames, r.rms_e3)
        for r in audio_window_stats(df, 4).collect()
    )
    assert got[:4] == [(1, 0, 4, 125), (1, 1, 4, 125), (1, 2, 4, 125), (1, 3, 4, 125)]
    assert got[4] == (2, -1, 0, 0)  # sentinel row, batch survived


def test_audio_window_rows_all_or_nothing(monkeypatch):
    """r14 advice: a window that fails AFTER earlier windows decoded must
    yield the single sentinel, never a mix of real rows + sentinel for
    the same media_id. slice_wav_windows builds all windows up front so
    real bytes cannot fail mid-iteration — stub decode_wav to fail on
    the third call and drive _media_window_rows directly."""
    from purldb_spark.multimodal import binaryops

    wav = encode_wav(8000, 1, 16, [4096, -4096] * 8)
    calls = {"n": 0}
    real = binaryops.decode_wav

    def flaky(content):
        calls["n"] += 1
        if calls["n"] == 3:
            raise ValueError("synthetic late-window failure")
        return real(content)

    monkeypatch.setattr(binaryops, "decode_wav", flaky)
    rows = binaryops._media_window_rows(7, wav, 4)
    assert rows == [
        {
            "media_id": 7,
            "window_idx": -1,
            "n_frames": 0,
            "duration_ms": 0,
            "rms_e3": 0,
        }
    ]
    # slice_wav_windows itself calls decode_wav once to validate, so the
    # third call is window index 1 — a genuinely LATE failure (window 0
    # had already appended a real row before the local list was dropped)
    assert calls["n"] == 3


def test_png_inflate_bomb_bounded_by_declared_geometry():
    """r14 advice: a poison blob declaring tiny IHDR dims but carrying a
    multi-MB highly-compressible IDAT must be rejected by the bounded
    decompressobj (ValueError), not inflate ~1000x toward MemoryError —
    which is NOT in the Spark faces' poison catch tuples."""
    import struct as _struct
    import tracemalloc
    import zlib as _zlib

    from purldb_spark.multimodal.binaryops import decode_png

    def chunk(t, d):
        return _struct.pack(">I", len(d)) + t + d + _struct.pack(
            ">I", _zlib.crc32(t + d)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # declares 1x1 RGB (expected plaintext: 4 bytes) but the IDAT
    # inflates to 64 MiB of zeros (compressed to ~64 KiB)
    bomb = _zlib.compress(bytes(64 * 1024 * 1024))
    png = (
        sig
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    tracemalloc.start()
    with pytest.raises(ValueError, match="past declared geometry"):
        decode_png(png)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 8 * 1024 * 1024  # never materialized the 64 MiB

    # exact-geometry PNGs still decode (the trailer legitimately sits in
    # unconsumed_tail when output lands exactly on max_length)
    from purldb_spark.multimodal.binaryops import encode_png

    d = decode_png(encode_png(5, 4, 2, (10, 20, 30)))
    assert (d["width"], d["height"]) == (5, 4)

    # under-declared stream (inflates SHORT of the geometry) is poison too
    short = (
        sig
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(bytes(5)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="shorter than declared"):
        decode_png(short)


def test_bmp16_literal_bytes_golden():
    """16-bit RGB555 decode (r15): hand-packed pixels, independent of
    encode_bmp16 — u16 LE, 5-bit fields b|g<<5|r<<10, floor(x*255/31)
    scaling, 4-byte row padding excluded."""
    from purldb_spark.multimodal.binaryops import decode_bmp

    # 1x2 bottom-up: rows are 2 bytes + 2 pad; pixel values chosen so
    # every field differs: (r,g,b) = (31,0,0) and (0,16,7)
    p1 = (31 << 10) | (0 << 5) | 0
    p2 = (0 << 10) | (16 << 5) | 7
    rows = struct.pack("<H", p2) + b"\xee\xee" + struct.pack("<H", p1) + b"\xee\xee"
    d = decode_bmp(_bmp(1, 2, 16, rows))
    assert (d["width"], d["height"], d["channels"], d["n_pixels"]) == (1, 2, 3, 2)
    assert d["mean_r_e3"] == round((255 + 0) / 2 * 1000)
    assert d["mean_g_e3"] == round((0 + 16 * 255 // 31) / 2 * 1000)
    assert d["mean_b_e3"] == round((0 + 7 * 255 // 31) / 2 * 1000)


def test_png_adam7_literal_bytes_golden():
    """Hand-built 2x2 interlaced RGB: non-empty passes are 1 (pixel
    (0,0)), 6 (pixel (1,0)) and 7 (row y=1) — built with raw filter-0
    scanlines, independent of encode_png_adam7."""
    from purldb_spark.multimodal.binaryops import decode_png

    px = {(0, 0): (10, 20, 30), (1, 0): (40, 50, 60),
          (0, 1): (70, 80, 90), (1, 1): (100, 110, 120)}
    stream = (
        bytes([0]) + bytes(px[(0, 0)])          # pass 1
        + bytes([0]) + bytes(px[(1, 0)])        # pass 6
        + bytes([0]) + bytes(px[(0, 1)] + px[(1, 1)])  # pass 7
    )
    d = decode_png(_png_chunks_raw((2, 2, 8, 2, 0, 0, 1), stream))
    assert (d["width"], d["height"], d["n_pixels"]) == (2, 2, 4)
    assert d["mean_r_e3"] == round((10 + 40 + 70 + 100) / 4 * 1000)
    assert d["mean_g_e3"] == round((20 + 50 + 80 + 110) / 4 * 1000)
    assert d["mean_b_e3"] == round((30 + 60 + 90 + 120) / 4 * 1000)


def test_png_adam7_matches_progressive_on_random_content():
    """The deinterlacer must reproduce EXACTLY what the progressive
    path decodes for the same pixels, across sizes that exercise empty
    passes, 1-pixel lattices and all color types."""
    import numpy as np

    from purldb_spark.multimodal.binaryops import (
        decode_png,
        encode_png_adam7,
        encode_png_pixels,
    )

    rng = np.random.RandomState(7)
    for (w, h, ct, ch) in [
        (1, 1, 0, 1), (2, 3, 2, 3), (7, 5, 2, 3), (8, 8, 6, 4),
        (13, 11, 0, 1), (16, 9, 2, 3), (3, 17, 6, 4),
    ]:
        arr = rng.randint(0, 256, size=(h, w * ch), dtype=np.uint8)
        rows = [bytes(arr[y]) for y in range(h)]
        assert decode_png(encode_png_pixels(rows, ct)) == decode_png(
            encode_png_adam7(rows, ct)
        )


def test_png_adam7_stream_length_mismatch_is_poison():
    from purldb_spark.multimodal.binaryops import decode_png, encode_png_adam7

    good = encode_png_adam7([bytes([1, 2, 3] * 4)] * 4, 2)
    # shrink declared height so the stream holds surplus pass bytes
    i = good.index(b"IHDR")
    mut = bytearray(good)
    mut[i + 8 : i + 12] = struct.pack(">I", 2)  # height 4 -> 2
    with pytest.raises(ValueError):
        decode_png(bytes(mut))


def test_wav_24bit_and_float_golden():
    """24-bit packed PCM (3-byte LE, sign-extended) and 32-bit IEEE
    float (format tag 3) decode for real since r15."""
    from purldb_spark.multimodal.binaryops import decode_wav, encode_wav

    A = 1 << 22  # half of 24-bit full scale
    d = decode_wav(encode_wav(8000, 1, 24, [A, -A] * 8))
    assert (d["bits"], d["n_frames"], d["rms_e3"]) == (24, 16, 500)
    # extreme negatives exercise the sign extension
    d2 = decode_wav(encode_wav(8000, 1, 24, [-(1 << 23), (1 << 23) - 1]))
    assert d2["rms_e3"] == 1000
    # hand-packed golden, independent of encode_wav: one frame 0x123456
    data = b"\x56\x34\x12"
    fmt = struct.pack("<HHIIHH", 1, 1, 1000, 3000, 3, 24)
    wav = (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )
    d3 = decode_wav(wav)
    assert d3["n_frames"] == 1
    assert d3["rms_e3"] == round(0x123456 / (1 << 23) * 1000)
    # float: eighths are exact in binary FP, stereo interleave
    d4 = decode_wav(encode_wav(16000, 2, 32, [0.5, -0.5] * 6))
    assert (d4["bits"], d4["channels"], d4["n_frames"], d4["rms_e3"]) == (
        32, 2, 6, 500,
    )
    # float tags other than 32-bit stay a boundary
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 64000, 8, 64)
    wav64 = (
        struct.pack("<4sI4s", b"RIFF", 36, b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", 8) + b"\x00" * 8
    )
    with pytest.raises(NotImplementedError):
        decode_wav(wav64)


def test_bmp_rle8_roundtrip_and_escapes():
    """BI_RLE8 decode (r15): runs, absolute mode, end-of-line/bitmap;
    the delta escape and grid-overrun poison via hand-built streams."""
    import numpy as np

    from purldb_spark.multimodal.binaryops import (
        _bmp_pixels,
        decode_bmp,
        encode_bmp_rle8,
    )

    pal = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120)]
    rng = np.random.RandomState(3)
    for (w, h) in [(1, 1), (4, 3), (7, 5), (16, 2), (9, 9)]:
        idxs = []
        for _y in range(h):
            row = []
            while len(row) < w:
                if rng.rand() < 0.5:
                    row += [int(rng.randint(4))] * min(
                        int(rng.randint(1, 5)), w - len(row)
                    )
                else:
                    row.append(int(rng.randint(4)))
            idxs += row[:w]
        chan, ww, hh = _bmp_pixels(encode_bmp_rle8(w, h, idxs, pal))
        assert (ww, hh) == (w, h)
        assert (chan == np.array([pal[i] for i in idxs], dtype=np.uint8)).all()

    def _rle(stream, w, h, npal=2):
        palb = b"".join(bytes((j, j, j)) + b"\x00" for j in range(npal))
        pix_off = 54 + len(palb)
        hdr = struct.pack(
            "<2sIHHI", b"BM", pix_off + len(stream), 0, 0, pix_off
        ) + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(stream), 0, 0, npal, 0
        )
        return hdr + palb + stream

    # delta escape skips cells (they stay index 0), hand-built
    d = decode_bmp(_rle(b"\x00\x02\x02\x01" + b"\x02\x01" + b"\x00\x00" + b"\x00\x01", 4, 2))
    # bottom row: skip (2,1)... delta moved to x=2,y=1 then run of 2 ones
    assert d["n_pixels"] == 8
    # truncated stream / run past width -> poison
    with pytest.raises(ValueError):
        decode_bmp(_rle(b"\x05\x01", 4, 2))  # run of 5 in width-4 row
    with pytest.raises(ValueError):
        decode_bmp(_rle(b"\x02\x01", 4, 2))  # no end-of-bitmap
    # RLE8 with non-8-bit depth is malformed
    blob = encode_bmp_rle8(2, 1, [0, 1], pal)
    mut = bytearray(blob)
    struct.pack_into("<H", mut, 28, 24)
    with pytest.raises(ValueError):
        decode_bmp(bytes(mut))


def test_png_16bit_and_gray_alpha():
    """Depth-16 decode (r15): high-byte reduction with noise low bytes,
    filters at bpp = channels*2; gray+alpha excludes alpha from means."""
    import numpy as np

    from purldb_spark.multimodal.binaryops import (
        decode_png,
        encode_png_pixels,
        encode_png_pixels16,
    )

    rng = np.random.RandomState(5)
    for (w, h, ct, ch) in [(3, 2, 0, 1), (4, 3, 2, 3), (2, 5, 6, 4)]:
        hi = rng.randint(0, 256, size=(h, w * ch))
        lo = rng.randint(0, 256, size=(h, w * ch))
        rows16 = [
            [int(hi[y][i]) << 8 | int(lo[y][i]) for i in range(w * ch)]
            for y in range(h)
        ]
        rows8 = [bytes(int(v) for v in hi[y]) for y in range(h)]
        # 16-bit high bytes must decode to the SAME stats as the 8-bit
        # image of those bytes — low-byte noise must not leak in
        assert decode_png(encode_png_pixels16(rows16, ct)) == decode_png(
            encode_png_pixels(rows8, ct)
        )
    # 8-bit gray+alpha: 2 channels, alpha excluded
    d = decode_png(encode_png_pixels([bytes([200, 7, 100, 250])], 4))
    assert d["channels"] == 2
    assert d["mean_r_e3"] == d["mean_g_e3"] == d["mean_b_e3"] == 150000
    # 16-bit gray+alpha through the 2-byte-bpp filter path
    d16 = decode_png(
        encode_png_pixels16([[200 << 8 | 9, 7 << 8, 100 << 8 | 255, 250 << 8]], 4)
    )
    assert d16["mean_r_e3"] == 150000 and d16["channels"] == 2
    # 16-bit paletted is spec-invalid -> poison, not a boundary
    with pytest.raises(ValueError):
        decode_png(_png_chunks_raw((1, 1, 16, 3, 0, 0, 0), bytes(3)))
    # sub-8-bit depths decode for real too (test_png_sub8_depths);
    # an out-of-spec depth value is the remaining boundary error
    with pytest.raises(NotImplementedError):
        decode_png(_png_chunks_raw((1, 1, 3, 0, 0, 0, 0), bytes(2)))


def test_png_sub8_depths():
    """1/2/4-bit packed-sample decode (r15): MSB-first unpacking,
    bytewise bpp-1 filters, exact 255/85/17 gray scaling, palette
    expansion, row-tail discard; sub-8 Adam7 stays a boundary."""
    import numpy as np

    from purldb_spark.multimodal.binaryops import decode_png, encode_png_sub8

    rng = np.random.RandomState(11)
    for d in (1, 2, 4):
        mx = 1 << d
        scale = 255 // (mx - 1)
        for (w, h) in [(1, 1), (3, 2), (8, 3), (11, 5)]:
            rows = [[int(rng.randint(mx)) for _ in range(w)] for _ in range(h)]
            flat = [v for r in rows for v in r]
            g = decode_png(encode_png_sub8(rows, d, 0))
            assert (g["channels"], g["n_pixels"]) == (1, w * h)
            assert g["mean_r_e3"] == round(
                sum(v * scale for v in flat) * 1000 / (w * h)
            )
            pal = [(7 + 16 * j, 11 + 16 * j, 13 + 16 * j) for j in range(mx)]
            p = decode_png(encode_png_sub8(rows, d, 3, palette=pal))
            assert p["channels"] == 3
            assert p["mean_g_e3"] == round(
                sum(11 + 16 * v for v in flat) * 1000 / (w * h)
            )
    # literal golden, independent of the encoder: 2-bit gray 5x1 row
    # [3,0,2,1,2] packs to 0b11001001, 0b10000000 -> bytes 0xC9 0x80
    d = decode_png(_png_chunks_raw((5, 1, 2, 0, 0, 0, 0), bytes([0, 0xC9, 0x80])))
    assert d["n_pixels"] == 5
    assert d["mean_r_e3"] == round((3 + 0 + 2 + 1 + 2) * 85 * 1000 / 5)
    # palette overrun is poison; sub-8 RGB is malformed; sub-8 Adam7 stays out
    with pytest.raises(ValueError):
        decode_png(encode_png_sub8([[3, 3]], 2, 3, palette=[(1, 1, 1)] * 2))
    with pytest.raises(ValueError):
        decode_png(_png_chunks_raw((2, 1, 4, 2, 0, 0, 0), bytes(2)))
    with pytest.raises(NotImplementedError):
        decode_png(_png_chunks_raw((2, 1, 4, 0, 0, 0, 1), bytes(2)))
