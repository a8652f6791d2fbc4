"""Baseline JPEG codec (multimodal/jpeg.py): literal-byte goldens,
independent-IDCT coefficient parity, pixel-exact DC-only roundtrips,
restart markers, sampling variants, codec boundaries, the Spark poison
contract, and the floor-boundary scan that certifies the registry
query's chroma ranges."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from purldb_spark.multimodal.jpeg import (
    ZIGZAG,
    decode_jpeg,
    decode_jpeg_pixels,
    encode_jpeg_coeff_blocks,
    encode_jpeg_gray_mosaic,
    encode_jpeg_solid_ycbcr,
    jpeg_sums,
    make_huff_lengths,
)


def _ref_idct(coef: np.ndarray) -> np.ndarray:
    """Independent O(N^4) direct-sum IDCT (T.81 definition, no matrix
    factorization shared with the decoder)."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv / 4 * coef[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = s
    return out


def test_golden_single_block_dc_only():
    """8x8 gray, one block, quantized DC = 5 under quant step 8:
    dequantized DC 40, every pixel = 40/8 + 128 = 133 by hand."""
    comps = [{"id": 1, "h": 1, "v": 1, "q": [8] + [16] * 63,
              "blocks": [[[5] + [0] * 63]]}]
    pix, w, h = decode_jpeg_pixels(encode_jpeg_coeff_blocks(8, 8, comps))
    assert (w, h) == (8, 8)
    assert (pix == 133).all()


def test_golden_single_ac_coefficient():
    """One AC coefficient (u=0, v=1): pixel(x, y) = DC-free cosine ramp
    computed by hand from the T.81 formula — exercises zigzag placement
    (stream index 1 -> natural index 1) and the IDCT basis."""
    blk = [0] * 64
    blk[1] = 13  # natural-order (0,1), quant step 4 -> coefficient 52
    q = [8, 4] + [16] * 62
    comps = [{"id": 1, "h": 1, "v": 1, "q": q, "blocks": [[blk]]}]
    pix, _, _ = decode_jpeg_pixels(encode_jpeg_coeff_blocks(8, 8, comps))
    for y in range(8):
        # f(x, y) = c(0)c(1)/4 * F(0,1) * cos((2y+1)pi/16), c(0)=1/sqrt(2)
        exp = 52 / (4 * math.sqrt(2)) * math.cos((2 * y + 1) * math.pi / 16)
        want = min(255, max(0, math.floor(exp + 128 + 0.5)))
        assert (pix[:, y, 0] == want).all(), (y, pix[:, y, 0], want)


def test_random_coefficients_match_independent_idct():
    """Arbitrary sparse coefficients through the REAL huffman/zigzag/
    dequant path, with a restart marker between every MCU, must decode
    to the independent direct-sum IDCT exactly."""
    import random

    rng = random.Random(41)
    for _trial in range(4):
        blocks = []
        for _ in range(2):
            blk = [0] * 64
            for _k in range(rng.randrange(1, 14)):
                blk[rng.randrange(64)] = rng.randrange(-255, 256)
            blocks.append(blk)
        comps = [{"id": 1, "h": 1, "v": 1, "q": [1] * 64,
                  "blocks": [[blocks[0], blocks[1]]]}]
        data = encode_jpeg_coeff_blocks(16, 8, comps, dri=1)
        pix, _, _ = decode_jpeg_pixels(data)
        for bi in range(2):
            coef = np.array(blocks[bi], dtype=float).reshape(8, 8)
            exp = np.clip(np.floor(_ref_idct(coef) + 128 + 0.5), 0, 255)
            assert (pix[0:8, bi * 8 : bi * 8 + 8, 0] == exp).all()


def test_gray_mosaic_pixel_exact_with_edge_crop():
    w, h = 21, 13  # non-multiple-of-8: edge blocks cropped

    def vals(bx, by):
        return (37 + 17 * bx + 29 * by) % 256

    pix, gw, gh = decode_jpeg_pixels(encode_jpeg_gray_mosaic(w, h, vals))
    assert (gw, gh) == (w, h)
    for y in range(h):
        for x in range(w):
            assert pix[y, x, 0] == vals(x // 8, y // 8)


def test_solid_color_444_and_420_exact():
    for sub in (False, True):
        for ycc in [(128, 128, 128), (200, 90, 160), (0, 255, 0),
                    (255, 0, 255)]:
            y_, cb, cr = ycc
            pix, w, h = decode_jpeg_pixels(
                encode_jpeg_solid_ycbcr(19, 11, ycc, subsample=sub)
            )
            assert (w, h) == (19, 11)
            r = min(255, max(0, math.floor(y_ + 1.402 * (cr - 128) + 0.5)))
            g = min(255, max(0, math.floor(
                y_ - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)))
            b = min(255, max(0, math.floor(y_ + 1.772 * (cb - 128) + 0.5)))
            uniq = np.unique(pix.reshape(-1, 3), axis=0)
            assert len(uniq) == 1 and tuple(uniq[0]) == (r, g, b)


def test_422_horizontal_subsampling():
    """Y at 2x1 vs chroma 1x1 (4:2:2): kron upsample along one axis."""
    nbx = 2  # Y: 2 blocks wide per MCU; image 16x8 -> 1 MCU
    comps = [
        {"id": 1, "h": 2, "v": 1, "q": [8] + [16] * 63,
         "blocks": [[[10] + [0] * 63 for _ in range(nbx)]]},
        {"id": 2, "h": 1, "v": 1, "q": [8] + [16] * 63,
         "blocks": [[[0] + [0] * 63]]},
        {"id": 3, "h": 1, "v": 1, "q": [8] + [16] * 63,
         "blocks": [[[0] + [0] * 63]]},
    ]
    pix, w, h = decode_jpeg_pixels(encode_jpeg_coeff_blocks(16, 8, comps))
    assert (w, h) == (16, 8) and pix.shape == (8, 16, 3)
    # Y=138 solid, Cb=Cr=128 -> gray R=G=B=138
    assert (pix == 138).all()


def test_multi_length_huffman_and_kraft_guard():
    enc = make_huff_lengths([7, 3, 9], [2, 1, 2])
    # canonical: symbol 3 at length 1 (code 0), then 7 and 9 at length 2
    assert enc[3] == (0, 1) and enc[7] == (2, 2) and enc[9] == (3, 2)
    with pytest.raises(ValueError):
        make_huff_lengths([1, 2, 3], [1, 1, 1])  # Kraft > 1


def test_rejections_and_boundaries():
    with pytest.raises(ValueError):
        decode_jpeg(b"BM not a jpeg, padded out to some length.......")
    good = encode_jpeg_gray_mosaic(8, 8, lambda bx, by: 50)
    # progressive: flip SOF0 marker to SOF2
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog)
    # truncated entropy data
    with pytest.raises(ValueError):
        decode_jpeg(good[:-4])
    # declared geometry bomb: patch SOF dims to 65535 x 65535
    i = good.index(b"\xff\xc0")
    bomb = bytearray(good)
    struct.pack_into(">HH", bomb, i + 5, 65535, 65535)
    with pytest.raises(ValueError, match="geometry too large"):
        decode_jpeg(bytes(bomb))
    # sampling factor 3
    comps = [{"id": 1, "h": 3, "v": 1, "q": [8] + [16] * 63,
              "blocks": [[[0] + [0] * 63] * 3]}]
    with pytest.raises(NotImplementedError):
        decode_jpeg(encode_jpeg_coeff_blocks(24, 8, comps))


def test_registry_chroma_ranges_clear_of_floor_boundaries():
    """mm_jpeg_roundtrip's oracle replays the color transform on exact
    integers while the decoder sees IDCT outputs off by ~1e-13; the two
    agree iff no (cb, cr) in the query's ranges lands a transform term
    within eps of a floor boundary. Scan the full ranges (cb 96..159,
    cr 80..143) — the only boundary-dangerous values in 0..255 are
    cb in {3, 253} and (cb, cr) in {(78, 178), (178, 78)}, all outside."""
    eps = 1e-9

    def frac_ok(t):
        f = (t + 0.5) % 1.0
        return eps < f < 1 - eps

    for cr in range(80, 144):
        assert frac_ok(1.402 * (cr - 128))
    for cb in range(96, 160):
        assert frac_ok(1.772 * (cb - 128))
        for cr in range(80, 144):
            assert frac_ok(-0.344136 * (cb - 128) - 0.714136 * (cr - 128))


def test_jpeg_sums_and_stats_faces():
    b = encode_jpeg_gray_mosaic(9, 9, lambda bx, by: 10 + bx + by)
    s = jpeg_sums(b)
    # blocks: (0,0)=10 over 64px, (1,0)=11 over 8, (0,1)=11 over 8, (1,1)=12 over 1
    assert s["sum_r"] == 64 * 10 + 8 * 11 + 8 * 11 + 12
    assert s["n_pixels"] == 81 and s["channels"] == 1
    d = decode_jpeg(encode_jpeg_solid_ycbcr(4, 4, (77, 128, 128)))
    assert d["mean_r_e3"] == d["mean_g_e3"] == d["mean_b_e3"] == 77000


def test_poison_contract_through_spark_faces(spark):
    from purldb_spark.multimodal.binaryops import image_stats, jpeg_sum_stats

    good = encode_jpeg_gray_mosaic(8, 8, lambda bx, by: 90)
    torn = good[:18]  # cut inside the header: no SOF/SOS ever arrives
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(torn))],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in jpeg_sum_stats(df).collect()}
    assert rows[1].sum_r == 64 * 90 and rows[2].width == -1
    # image_stats magic-byte dispatch reaches decode_jpeg too
    st = {r.media_id: r for r in image_stats(df).collect()}
    assert st[1].mean_r_e3 == 90000 and st[2].width == -1


def test_jpeg_features_and_resize_parity():
    """jpeg_features lands in the same descriptor space as bmp/png
    (solid-color images of equal RGB produce near-identical feature
    heads), and resize_image accepts JPEG input, flipping RGB->BGR into
    the canonical BMP like the PNG path."""
    from purldb_spark.multimodal.binaryops import (
        decode_bmp,
        encode_png,
        jpeg_features,
        png_features,
        resize_image,
    )

    # gray 4:2:0 solid: Y=140, Cb=Cr=128 -> RGB (140,140,140)
    j = encode_jpeg_solid_ycbcr(12, 6, (140, 128, 128), subsample=True)
    fj = jpeg_features(j)
    fp = png_features(encode_png(12, 6, 2, (140, 140, 140)))
    assert len(fj) == 16
    assert fj == fp  # identical dims + identical solid pixels

    # COLORED cross-codec parity in the canonical B,G,R dim order:
    # (Y,Cb,Cr)=(100,150,170) decodes to RGB (159,62,139) by the floor
    # transform; the same color through PNG must featurize identically
    fc = jpeg_features(encode_jpeg_solid_ycbcr(8, 8, (100, 150, 170)))
    assert fc == png_features(encode_png(8, 8, 2, (159, 62, 139)))
    assert abs(fc[0] - 139 / 255) < 1e-12  # dim 0 is the B mean

    out = resize_image(j, 3, 2)
    d = decode_bmp(out)
    assert (d["width"], d["height"]) == (3, 2)
    assert d["mean_r_e3"] == d["mean_g_e3"] == d["mean_b_e3"] == 140000


def test_embed_media_dispatches_jpeg(spark):
    from purldb_spark.multimodal.binaryops import embed_media, jpeg_features

    j = encode_jpeg_gray_mosaic(16, 8, lambda bx, by: 60 + 10 * bx)
    df = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(j))],
        "media_id long, media_type string, content binary",
    )
    got = embed_media(df).collect()[0]
    # EMBED_SCHEMA carries float32: compare at that precision
    assert got.embedding == pytest.approx(jpeg_features(j), rel=1e-6)


from hypothesis import assume as _assume  # noqa: E402
from hypothesis import given as _given  # noqa: E402
from hypothesis import settings as _settings  # noqa: E402
from hypothesis import strategies as _st  # noqa: E402


@_settings(max_examples=40, deadline=None)
@_given(w=_st.integers(1, 40), h=_st.integers(1, 28), seed=_st.integers(0, 2**31))
def test_jpeg_mosaic_roundtrip_property(w, h, seed):
    """Random block mosaics of every geometry (incl. single-pixel and
    non-multiple-of-8 dims) roundtrip pixel-exactly — the DC-difference
    chain, edge cropping and huffman paths under fuzzing."""
    import random

    rng = random.Random(seed)
    grid = {
        (bx, by): rng.randrange(256)
        for bx in range(-(-w // 8))
        for by in range(-(-h // 8))
    }
    pix, gw, gh = decode_jpeg_pixels(
        encode_jpeg_gray_mosaic(w, h, lambda bx, by: grid[(bx, by)])
    )
    assert (gw, gh) == (w, h)
    for y in range(gh):
        for x in range(gw):
            assert pix[y, x, 0] == grid[(x // 8, y // 8)]


@_settings(max_examples=40, deadline=None)
@_given(
    y=_st.integers(0, 255),
    cb=_st.integers(0, 255),
    cr=_st.integers(0, 255),
    sub=_st.booleans(),
)
def test_jpeg_solid_color_roundtrip_property(y, cb, cr, sub):
    """Any YCbCr solid (4:4:4 and 4:2:0) decodes to the floor-transform
    RGB exactly — away from the four floor-boundary chroma values where
    the decoder's ~1e-13 IDCT jitter may legitimately round across."""
    _assume(cb not in (3, 253))
    _assume((cb, cr) not in ((78, 178), (178, 78)))
    pix, w, h = decode_jpeg_pixels(
        encode_jpeg_solid_ycbcr(10, 7, (y, cb, cr), subsample=sub)
    )
    r = min(255, max(0, math.floor(y + 1.402 * (cr - 128) + 0.5)))
    g = min(255, max(0, math.floor(
        y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)))
    b = min(255, max(0, math.floor(y + 1.772 * (cb - 128) + 0.5)))
    uniq = np.unique(pix.reshape(-1, 3), axis=0)
    assert len(uniq) == 1 and tuple(uniq[0]) == (r, g, b)
