"""Multimodal columns: image/audio/video as opaque BINARY columns with typed
metadata, processed via Arrow-batched Pandas UDFs (mapInPandas).

Decode is REAL for the formats stdlib+numpy can carry: BMP (header +
padded BGR rows + 8-bit palette, decode_bmp), PNG (chunk walk + zlib
inflate + per-row unfilter incl. Paeth, decode_png — PNG's only
compression is DEFLATE, which is stdlib ``zlib``), baseline JPEG
(huffman decode + dequant + IDCT + YCbCr->RGB, multimodal/jpeg.py —
r15), and RIFF/PCM WAV (chunk walk + frames, decode_wav), surfaced as
the image_stats / jpeg_sum_stats / audio_stats mapInPandas faces. The
MP4 (ISO-BMFF box tree + sample tables, multimodal/mp4.py) and MP3
(frame-header walk, mp3.py) CONTAINER layers are real too (r15), so
only frame-payload DSP — H.264/HEVC entropy + transform, mp3 huffman +
IMDCT + polyphase — stays behind NotImplementedError in
`decode_media`; a codec drop-in inherits the schema, batch iteration,
UDF signatures, and partition sizing unchanged.

Scale notes: binary payloads ride Arrow buffers between JVM and Python, so
`spark.sql.execution.arrow.maxRecordsPerBatch` (and for 100 MB+ blobs,
per-batch byte budgeting inside the generator) bounds Python memory; payload
columns should be pruned before any join (carry (id, meta), join, then
re-attach content) so blobs never shuffle.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _bmp_header(content: bytes) -> tuple[int, int, int, int, int]:
    """Validated BMP header parse shared by decode_bmp and bmp_features:
    (pix_off, width, height, bits, compression). Raises ValueError on
    bad magic, NotImplementedError for unsupported compressions / bit
    depths — both consumers enforce the SAME format boundary (a feature
    extractor that skipped validation produced silent garbage vectors
    for blobs the stats face correctly rejected). Compression 0 (BI_RGB)
    for every depth; compression 1 (BI_RLE8, 8-bit only) decodes for
    real since r15."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP file")
    pix_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", content, 14)
    _planes, bits = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if hdr_size < 40:
        raise NotImplementedError("pre-BITMAPINFOHEADER BMP — codec boundary")
    if compression == 1:
        if bits != 8:
            raise ValueError("BI_RLE8 requires 8-bit pixels")
    elif compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} — codec boundary"
        )
    if bits not in (8, 16, 24, 32):
        raise NotImplementedError(f"{bits}-bit BMP — codec boundary")
    return pix_off, width, height, bits, compression


def _bmp_rle8_indices(content: bytes, pix_off: int, width: int, h: int):
    """Decode a BI_RLE8 stream to the (h, width) palette-index grid —
    real run-length decompression: (count, value) runs; escape 0
    followed by 0 = end of line, 1 = end of bitmap, 2 = (dx, dy) delta,
    n >= 3 = n absolute indices padded to a word boundary. Rows in the
    stream are BOTTOM-UP like uncompressed BMPs (the caller flips).
    Overruns of the declared grid or a truncated stream raise ValueError
    (the poison contract); skipped cells stay index 0, per spec."""
    import numpy as np

    grid = np.zeros((h, width), dtype=np.uint8)
    pos = pix_off
    x = y = 0
    while True:
        if pos + 2 > len(content):
            raise ValueError("RLE8 stream truncated")
        count, val = content[pos], content[pos + 1]
        pos += 2
        if count > 0:  # run
            if y >= h or x + count > width:
                raise ValueError("RLE8 run outside declared grid")
            grid[y, x : x + count] = val
            x += count
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return grid
        elif val == 2:  # delta
            if pos + 2 > len(content):
                raise ValueError("RLE8 delta truncated")
            x += content[pos]
            y += content[pos + 1]
            pos += 2
            if x > width or y > h:
                raise ValueError("RLE8 delta outside declared grid")
        else:  # absolute mode: `val` literal indices, word-padded
            n = val
            if pos + n > len(content):
                raise ValueError("RLE8 absolute run truncated")
            if y >= h or x + n > width:
                raise ValueError("RLE8 absolute run outside declared grid")
            grid[y, x : x + n] = np.frombuffer(
                content, dtype=np.uint8, count=n, offset=pos
            )
            x += n
            pos += n + (n & 1)


def _bmp_pixels(content: bytes):
    """Shared pixel extraction behind decode_bmp and bmp_features:
    validated header, 4-byte row padding dropped, and — for 8-bit BMPs —
    the MANDATORY color palette applied (pixel bytes are palette INDICES,
    not intensities; reading them as grayscale silently reported index
    values as color for any non-identity palette — r13 advice). Returns
    (pixels ndarray of shape (n_px, n_channels) uint8, width, height);
    8-bit rows come back palette-expanded to 3 BGR channels. A missing or
    overrun palette raises ValueError (the poison-blob contract)."""
    import numpy as np

    pix_off, width, height, bits, compression = _bmp_header(content)
    h = abs(height)
    if compression == 1:
        grid = _bmp_rle8_indices(content, pix_off, width, h)
        if height > 0:  # bottom-up like uncompressed rows
            grid = np.flipud(grid)
        idx = grid.reshape(-1)
        pal, n_entries = _bmp_palette(content, pix_off)
        if len(idx) and int(idx.max()) >= n_entries:
            raise ValueError("8-bit BMP pixel index outside the palette")
        return pal[idx], int(width), int(h)
    if bits == 16:
        # RGB555 (BI_RGB 16-bit): little-endian u16 per pixel,
        # b = v & 31, g = (v >> 5) & 31, r = (v >> 10) & 31, each
        # 5-bit value scaled to 8 bits by floor(x * 255 / 31) — an
        # integer expression a SQL oracle replays exactly
        row_bytes = width * 2
        stride = (row_bytes + 3) & ~3
        px = np.frombuffer(
            content, dtype=np.uint8, count=stride * h, offset=pix_off
        )
        v = (
            px.reshape(h, stride)[:, :row_bytes]
            .reshape(h * width, 2)
            .astype(np.uint16)
        )
        v = v[:, 0] | (v[:, 1] << 8)
        chan = np.stack(
            [
                ((v & 31) * 255 // 31),
                (((v >> 5) & 31) * 255 // 31),
                (((v >> 10) & 31) * 255 // 31),
            ],
            axis=1,
        ).astype(np.uint8)  # BGR
        return chan, int(width), int(h)
    channels = bits // 8
    row_bytes = width * channels
    stride = (row_bytes + 3) & ~3  # each row padded to 4 bytes
    px = np.frombuffer(content, dtype=np.uint8, count=stride * h, offset=pix_off)
    chan = px.reshape(h, stride)[:, :row_bytes].reshape(h * width, channels)
    if bits == 8:
        pal, n_entries = _bmp_palette(content, pix_off)
        idx = chan.reshape(-1)
        if len(idx) and int(idx.max()) >= n_entries:
            raise ValueError("8-bit BMP pixel index outside the palette")
        chan = pal[idx]  # (n_px, 3) BGR
    return chan, int(width), int(h)


def _bmp_palette(content: bytes, pix_off: int):
    """(palette as (n, 3) BGR uint8 array, entry count) from the color
    table between the info header and the pixel data — shared by the
    uncompressed 8-bit and RLE8 paths."""
    import numpy as np

    hdr_size = struct.unpack_from("<I", content, 14)[0]
    clr_used = struct.unpack_from("<I", content, 46)[0]
    pal_off = 14 + hdr_size
    n_entries = min(clr_used or 256, max((pix_off - pal_off) // 4, 0))
    if n_entries <= 0:
        raise ValueError("8-bit BMP missing its color palette")
    pal = np.frombuffer(
        content, dtype=np.uint8, count=n_entries * 4, offset=pal_off
    ).reshape(n_entries, 4)[:, :3]  # entries are (B, G, R, reserved)
    return pal, n_entries


def decode_bmp(content: bytes) -> dict:
    """REAL pure-Python BMP decode (uncompressed BITMAPINFOHEADER layouts
    — the format needs no codec library, just the spec): returns width,
    height, channels, n_pixels, and per-channel mean in milli-units
    (mean_*_e3, BMP stores BGR; 8-bit paletted images decode through
    their palette to 3 BGR channels). Rows are 4-byte padded and
    bottom-up (negative height = top-down) — neither affects per-channel
    means, but padding bytes must be excluded, which is the part a naive
    byte-mean gets wrong."""
    chan, width, h = _bmp_pixels(content)
    sums = chan.astype("int64").sum(axis=0)
    n_px = h * width
    means = [int(round(int(s) * 1000 / n_px)) if n_px else 0 for s in sums]
    means += [0] * (3 - min(len(means), 3))
    return {
        "width": width,
        "height": h,
        "channels": int(chan.shape[1]),
        "n_pixels": int(n_px),
        "mean_b_e3": means[0],
        "mean_g_e3": means[1],
        "mean_r_e3": means[2],
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> bytes:
    """Reverse the per-row PNG filters (types 0-4: None/Sub/Up/Average/
    Paeth) over the inflated scanline stream — the only stateful part of
    PNG decode; everything else is stdlib zlib. Pure-Python per-row loop:
    Sub/Average/Paeth reconstruct left-to-right so the row cannot be
    numpy-vectorized; fixture images are tiny and a production cluster
    drops PIL into decode_media instead."""
    stride = width * channels
    bpp = channels
    out = bytearray(height * stride)
    prior = bytes(stride)
    pos = 0
    for y in range(height):
        if pos + 1 + stride > len(raw):
            raise ValueError("PNG scanline stream truncated")
        ft = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y * stride : (y + 1) * stride] = line
        prior = bytes(line)
    return bytes(out)


# channels per PNG color type: gray, RGB, palette, gray+alpha, RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _adam7_passes(width: int, height: int):
    """(x0, y0, dx, dy, pass_w, pass_h) for each NON-EMPTY Adam7 pass —
    an empty pass (zero width or height) contributes no scanlines at
    all, which is the spec subtlety small images exercise."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            out.append((x0, y0, dx, dy, pw, ph))
    return out


def _png_adam7_pixels(raw: bytes, width: int, height: int, channels: int):
    """Deinterlace an Adam7 scanline stream: each pass is its own
    filtered sub-image (the filter predictor chain RESETS per pass),
    unfiltered independently and scattered onto the output grid at the
    pass's (start, step) lattice."""
    import numpy as np

    out = np.zeros((height, width, channels), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
        n = ph * (1 + pw * channels)
        sub = _png_unfilter(raw[pos : pos + n], pw, ph, channels)
        pos += n
        arr = np.frombuffer(sub, dtype=np.uint8).reshape(ph, pw, channels)
        out[y0::dy, x0::dx, :] = arr
    if pos != len(raw):
        raise ValueError("Adam7 stream length mismatch")
    return out.reshape(height * width, channels)


def _png_pixels(content: bytes):
    """Shared pixel extraction behind decode_png and png_features:
    IHDR/PLTE/IDAT chunk walk, stdlib-zlib inflate, per-row unfilter,
    PLTE expansion for paletted images. Returns (pixels ndarray of shape
    (n_px, channels) uint8 in PNG's R,G,B(,A) order, width, height)."""
    import zlib

    import numpy as np

    if len(content) < 8 + 25 or content[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos, ihdr, plte, idat = 8, None, b"", []
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("PNG chunk truncated")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 8 + length + 4  # skip CRC
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("bad PNG compression/filter method")
    if depth not in (1, 2, 4, 8, 16) or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG depth {depth} color type {color_type} — codec boundary"
        )
    if depth == 16 and color_type == 3:
        raise ValueError("16-bit paletted PNG is spec-invalid")
    if depth < 8 and color_type not in (0, 3):
        raise ValueError(
            f"sub-8-bit PNG allows gray/palette only, not type {color_type}"
        )
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if depth < 8 and interlace == 1:
        raise NotImplementedError(
            "Adam7 at sub-8-bit depth — residual boundary"
        )
    channels = _PNG_CHANNELS[color_type]
    # PNG filters operate on BYTES with bpp = channels * bytes-per-sample
    # (the spec rule 16-bit decode hinges on), so the unfilter runs with
    # the byte-channel count and 16-bit samples resolve afterwards
    if depth < 8:
        # packed samples: scanlines are ceil(width*d/8) bytes and the
        # filters run bytewise at bpp = 1 (the spec's sub-byte rule)
        bch = 1
        row_bytes = (width * depth + 7) // 8
    else:
        bps = depth // 8
        bch = channels * bps
        row_bytes = width * bch
    # Bounded inflate: declared geometry fixes the plaintext size at
    # height * (1 filter byte + width*channels). An unbounded
    # zlib.decompress would let a poison blob with tiny IHDR dims but a
    # multi-MB highly-compressible IDAT inflate ~1000x and exhaust
    # executor memory (MemoryError is NOT in the poison catch tuples) —
    # max_length caps the output at exactly what the geometry admits,
    # and any surplus is the same poison ValueError as corrupt DEFLATE.
    if interlace == 0:
        expected = height * (1 + row_bytes)
    else:
        expected = sum(
            ph * (1 + pw * bch)
            for _x0, _y0, _dx, _dy, pw, ph in _adam7_passes(width, height)
        )
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), expected)
        # unconsumed_tail may legitimately hold the stream trailer when
        # the output lands exactly on max_length — only surplus OUTPUT
        # (capped at 1 byte) proves over-declaration, not leftover input
        surplus = (
            dec.decompress(dec.unconsumed_tail, 1)
            if dec.unconsumed_tail
            else b""
        )
    except zlib.error as exc:
        # corrupt DEFLATE must surface as the poison-blob ValueError the
        # Spark faces already catch — zlib.error is not in their catch
        # tuples, and a torn PNG must never kill a 100 TB stage
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from exc
    if surplus:
        raise ValueError("PNG IDAT inflates past declared geometry")
    if len(raw) < expected:
        raise ValueError("PNG IDAT shorter than declared geometry")
    if depth < 8:
        # unfilter at one byte per "pixel" over the packed scanline,
        # then unpack MSB-first d-bit samples and drop the row tail
        flat = np.frombuffer(
            _png_unfilter(raw, row_bytes, height, 1), dtype=np.uint8
        ).reshape(height, row_bytes)
        bits = np.unpackbits(flat, axis=1)[:, : width * depth]
        weights = 1 << np.arange(depth - 1, -1, -1)
        vals = (
            bits.reshape(height, width, depth) * weights
        ).sum(axis=2).astype(np.uint8)
        if color_type == 0:
            # exact integer scaling: 255/(2^d - 1) is 255, 85 or 17
            vals = (vals * (255 // ((1 << depth) - 1))).astype(np.uint8)
        pix = vals.reshape(width * height, 1)
    elif interlace == 0:
        pix = np.frombuffer(
            _png_unfilter(raw, width, height, bch), dtype=np.uint8
        ).reshape(width * height, bch)
    else:
        pix = _png_adam7_pixels(raw, width, height, bch)
    if depth == 16:
        # big-endian u16 samples: the HIGH byte is the spec-sanctioned
        # 8-bit reduction (floor(v / 257 + eps) ~ v >> 8)
        pix = pix.reshape(width * height, channels, 2)[:, :, 0]
    if color_type == 3:
        if not plte or len(plte) % 3:
            raise ValueError("paletted PNG missing/odd PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)  # RGB
        idx = pix.reshape(-1)
        if len(idx) and int(idx.max()) >= len(pal):
            raise ValueError("PNG pixel index outside the palette")
        pix = pal[idx]
    return pix, int(width), int(height)


def decode_png(content: bytes) -> dict:
    """REAL pure-Python PNG decode — the DEFLATE inside IDAT is stdlib
    ``zlib``, so unlike JPEG/MP3 no external codec is needed (r13 verdict
    gap): IHDR/PLTE/IDAT chunk walk, zlib inflate, per-row unfilter
    (incl. Paeth), for 8-bit grayscale / RGB / RGBA / paletted, and —
    since r15 — Adam7 interlace (per-pass unfilter + lattice scatter,
    _png_adam7_pixels). Returns the same stat dict as decode_bmp; PNG
    stores RGB (not BGR), paletted images decode through PLTE to 3
    channels, RGBA and gray+alpha exclude alpha from means, and 16-bit
    samples reduce by their high byte (r15 — the spec-sanctioned 8-bit
    reduction; filters run at bpp = channels * 2 bytes per the spec).
    Depths below 8 stay behind NotImplementedError."""
    pix, width, height = _png_pixels(content)
    n_px = width * height
    sums = pix.astype("int64").sum(axis=0)

    def mean_e3(ci: int) -> int:
        if not n_px:
            return 0
        # color channels exclude alpha: gray/gray+alpha read channel 0
        # for all three means, RGB(A) reads R,G,B
        ncolor = 1 if pix.shape[1] <= 2 else 3
        c = min(ci, ncolor - 1)
        return int(round(int(sums[c]) * 1000 / n_px))

    # PNG channel order is R, G, B(, A); alpha excluded from means
    return {
        "width": int(width),
        "height": int(height),
        "channels": int(pix.shape[1]),
        "n_pixels": int(n_px),
        "mean_b_e3": mean_e3(2),
        "mean_g_e3": mean_e3(1),
        "mean_r_e3": mean_e3(0),
    }


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _png_filter_scanlines(rows: list[bytes], channels: int) -> bytes:
    """FORWARD filter transform (filt = raw - predictor mod 256) over one
    scanline group, filter type CYCLING y % 5 — the predictor chain is
    self-contained (prior row starts zeroed), so it serves both the
    whole image (interlace 0) and each Adam7 pass independently."""
    stride = len(rows[0])
    bpp = channels
    lines = []
    prior = bytes(stride)
    for y, raw_row in enumerate(rows):
        ft = y % 5
        filt = bytearray(stride)
        for i in range(stride):
            a = raw_row[i - bpp] if i >= bpp else 0
            up = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (a + up) >> 1
            else:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
            filt[i] = (raw_row[i] - pred) & 0xFF
        lines.append(bytes([ft]) + bytes(filt))
        prior = raw_row
    return b"".join(lines)


def encode_png_pixels(rows: list[bytes], color_type: int) -> bytes:
    """Spec-correct PNG writer from raw scanlines (``rows`` = one bytes
    object of width*channels samples per row, 8-bit): computes the
    FORWARD filter transform with the filter type CYCLING y % 5, so
    decoding exercises every unfilter branch including Paeth — on
    ARBITRARY pixel content, which is the strong test: a solid image
    filters to mostly-zero bytes that can cancel an unfilter indexing
    or Average-rounding bug."""
    import zlib

    channels = _PNG_CHANNELS[color_type]
    if color_type == 3:
        raise ValueError("encode_png writes gray/RGB/RGBA, not paletted")
    stride = len(rows[0])
    width = stride // channels
    ihdr = struct.pack(
        ">IIBBBBB", width, len(rows), 8, color_type, 0, 0, 0
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(
            b"IDAT", zlib.compress(_png_filter_scanlines(rows, channels))
        )
        + _png_chunk(b"IEND", b"")
    )


def encode_png_adam7(rows: list[bytes], color_type: int) -> bytes:
    """ADAM7-INTERLACED PNG writer from full-image scanlines: pixels
    regroup into the 7 pass lattices, each pass filters independently
    (cycling y % 5 within the pass — its own predictor chain, the spec
    rule the deinterlacer must honor), passes concatenate into one
    deflate stream, IHDR declares interlace = 1."""
    import zlib

    channels = _PNG_CHANNELS[color_type]
    if color_type == 3:
        raise ValueError("encode_png writes gray/RGB/RGBA, not paletted")
    stride = len(rows[0])
    width = stride // channels
    height = len(rows)
    stream = b""
    for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
        pass_rows = []
        for yy in range(y0, height, dy):
            row = rows[yy]
            pass_rows.append(
                b"".join(
                    row[xx * channels : (xx + 1) * channels]
                    for xx in range(x0, width, dx)
                )
            )
        stream += _png_filter_scanlines(pass_rows, channels)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 1)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(stream))
        + _png_chunk(b"IEND", b"")
    )


def encode_png(
    width: int,
    height: int,
    color_type: int,
    rgb: tuple[int, int, int],
    cycle_filters: bool = True,  # kept for call-site clarity; always cycles
) -> bytes:
    """Solid-color convenience wrapper over encode_png_pixels — the
    oracle-fixture generator (means predictable from the color)."""
    r, g, b = rgb
    px = {0: (r,), 2: (r, g, b), 6: (r, g, b, 255)}[color_type]
    return encode_png_pixels([bytes(px) * width] * height, color_type)


def decode_wav(content: bytes) -> dict:
    """REAL pure-Python WAV decode (RIFF chunk walk + PCM frames): sample
    rate, channels, bits, frame count, duration in ms, and RMS amplitude
    in milli-units of full scale (rms_e3). Integer PCM at 8 (unsigned),
    16 and — since r15 — 24 bits (packed 3-byte little-endian,
    sign-extended), plus 32-bit IEEE-float frames (format tag 3,
    WAVE_FORMAT_IEEE_FLOAT, full scale 1.0) — every uncompressed layout;
    actual audio codecs (any other format tag) stay behind
    NotImplementedError."""
    import struct

    import numpy as np

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        sz = struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _byte_rate, block_align, bits = fmt
    if tag == 3:
        if bits != 32:
            raise NotImplementedError(
                f"{bits}-bit float WAV — codec boundary"
            )
    elif tag != 1:
        raise NotImplementedError(f"WAV format tag {tag} — codec boundary")
    elif bits not in (8, 16, 24):
        raise NotImplementedError(f"{bits}-bit PCM — codec boundary")
    n_frames = len(data) // block_align if block_align else 0
    if tag == 3:
        s = np.frombuffer(
            data, dtype="<f4", count=n_frames * channels
        ).astype(np.float64)
        full = 1.0
    elif bits == 16:
        s = np.frombuffer(
            data, dtype="<i2", count=n_frames * channels
        ).astype(np.int64)
        full = 32768.0
    elif bits == 24:
        # packed 3-byte little-endian signed: widen to i32 and
        # sign-extend via the top byte
        raw = np.frombuffer(
            data, dtype=np.uint8, count=n_frames * channels * 3
        ).reshape(-1, 3)
        s = (
            raw[:, 0].astype(np.int64)
            | (raw[:, 1].astype(np.int64) << 8)
            | (raw[:, 2].astype(np.int64) << 16)
        )
        s = np.where(s >= 1 << 23, s - (1 << 24), s)
        full = float(1 << 23)
    else:
        s = np.frombuffer(
            data, dtype=np.uint8, count=n_frames * channels
        ).astype(np.int64) - 128
        full = 128.0
    rms = float(np.sqrt((s * s).mean())) if len(s) else 0.0
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits": int(bits),
        "n_frames": int(n_frames),
        "duration_ms": int(round(n_frames * 1000 / rate)) if rate else 0,
        "rms_e3": int(round(rms / full * 1000)),
    }


def encode_bmp(width: int, height: int, bgr: tuple[int, int, int]) -> bytes:
    """Minimal 24-bit uncompressed BMP writer (solid ``bgr`` color) —
    fixture generator for the decode path; real spec layout: 14-byte file
    header + 40-byte BITMAPINFOHEADER + bottom-up 4-byte-padded rows."""
    import struct

    row = bytes(bgr) * width
    pad = (-len(row)) % 4
    pixels = (row + b"\x00" * pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + pixels


def encode_bmp16(width: int, height: int, rgb555: tuple[int, int, int]) -> bytes:
    """Minimal 16-bit RGB555 uncompressed BMP writer (solid color from
    5-bit ``(r, g, b)`` components) — fixture generator for the 16-bit
    decode branch; rows are u16 little-endian, 4-byte padded."""
    import struct

    r, g, b = rgb555
    v = ((r & 31) << 10) | ((g & 31) << 5) | (b & 31)
    row = struct.pack("<H", v) * width
    pad = (-len(row)) % 4
    pixels = (row + b"\x00" * pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 16, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + pixels


def encode_wav(
    rate: int, channels: int, bits: int, samples: list[int]
) -> bytes:
    """Minimal uncompressed WAV writer — fixture generator for the
    decode path; ``samples`` are interleaved frames. bits selects the
    layout: 8 (unsigned), 16, 24 (packed 3-byte LE signed), or the
    sentinel 32 meaning IEEE-float frames (format tag 3; samples are
    floats in [-1, 1])."""
    import struct

    tag = 1
    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    elif bits == 8:
        data = bytes((s + 128) & 0xFF for s in samples)
    elif bits == 24:
        data = b"".join(
            int(s & 0xFFFFFF).to_bytes(3, "little") for s in samples
        )
    elif bits == 32:
        tag = 3
        data = b"".join(struct.pack("<f", s) for s in samples)
    else:
        raise ValueError("encode_wav writes 8/16/24-bit PCM or 32-bit float")
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", tag, channels, rate, rate * block_align, block_align, bits
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def encode_bmp_pixels(arr) -> bytes:
    """24-bit uncompressed BMP from an (h, w, 3) uint8 BGR array, rows
    written in array order — the general-grid twin of encode_bmp (solid
    color). Consumers in this module read means orientation-agnostically;
    resize_image works in storage-row space throughout."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    rows = b"".join(arr[y].tobytes() + pad for y in range(h))
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    return header + rows


def resize_image(content: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resample (r14: the decoders made it
    possible; r15 adds JPEG input): decode BMP/PNG/JPEG via the shared
    pixel extractors, NN-index with integer arithmetic (src = floor(dst
    * src_dim / dst_dim) — two vectorized numpy gathers, no
    interpolation kernel needed), and re-encode as canonical 24-bit
    BMP. Grayscale replicates to 3 channels, alpha is dropped, PNG/JPEG
    RGB flips to BMP's BGR. Operates in storage-row space (a bottom-up
    BMP resamples bottom-up; NN row duplication is
    orientation-dependent at the margin, which is the standard NN
    artifact). Raises the decoders' ValueError / NotImplementedError
    for undecodable input — resize_media maps those to its
    deterministic fallback."""
    import numpy as np

    is_png = content[:8] == _PNG_SIG
    is_jpeg = content[:2] == b"\xff\xd8"
    if is_jpeg:
        from purldb_spark.multimodal.jpeg import decode_jpeg_pixels

        arr3, w, h = decode_jpeg_pixels(content)
        arr = arr3
    else:
        pix, w, h = (_png_pixels if is_png else _bmp_pixels)(content)
        arr = pix.reshape(h, w, pix.shape[1])
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    else:
        arr = arr[:, :, :3]  # drop alpha
    if is_png or is_jpeg:
        arr = arr[:, :, ::-1]  # RGB -> BGR
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return encode_bmp_pixels(np.ascontiguousarray(arr[np.ix_(ys, xs)]))


def decode_media(media_type: str, content: bytes) -> tuple[int, int]:
    """(width, height) decode dispatch. REAL for 'image/bmp' (pure-Python
    header parse), 'image/png' (stdlib-zlib inflate + unfilter, r14),
    'image/jpeg' (baseline huffman + IDCT, multimodal/jpeg.py, r15) and
    'video/mp4' (container-level dims off the tkhd 16.16 fields through
    the full ISO-BMFF walk, multimodal/mp4.py, r15 — the frame PAYLOADS
    stay opaque); deterministic fake for 'fake/*' so the pipeline stays
    oracle-checkable. NotImplementedError now names only the frame/
    sample PAYLOAD codecs (H.264/HEVC entropy + transform, mp3's
    huffman + IMDCT + polyphase) — the genuinely ffmpeg-shaped DSP; the
    container layers are parsed for real (mp4.py, mp3.py)."""
    if media_type == "image/bmp":
        d = decode_bmp(content)
        return (d["width"], d["height"])
    if media_type == "image/png":
        d = decode_png(content)
        return (d["width"], d["height"])
    if media_type == "image/jpeg":
        from purldb_spark.multimodal.jpeg import decode_jpeg

        d = decode_jpeg(content)
        return (d["width"], d["height"])
    if media_type == "video/mp4":
        from purldb_spark.multimodal.mp4 import parse_mp4

        t = parse_mp4(content)["tracks"][0]
        return (t["width"], t["height"])
    if media_type.startswith("fake/"):
        n = len(content)
        return (n % 640 + 1, n % 480 + 1)
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment — the remaining "
        "boundary is frame-payload DSP only (H.264/HEVC entropy+transform, "
        "mp3 huffman+IMDCT+polyphase); container layers are real "
        "(multimodal/mp4.py, mp3.py) and the Spark plumbing is "
        "codec-agnostic"
    )


def fuse(*stages):
    """Compose per-batch pandas generators into ONE mapInPandas pass
    (r16, guide §4): an encode stage and its decode/stats stage chained
    as ``df.mapInPandas(fuse(enc, image_stats_batches), schema)`` cross
    the JVM<->Python Arrow boundary ONCE — the intermediate binary
    column lives and dies inside the worker instead of being serialized
    back to the JVM only to re-enter Python for the next stage. Row
    semantics are identical to chaining the mapInPandas faces: each
    stage sees exactly the batches the previous stage yields."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for stage in stages:
            batches = stage(batches)
        yield from batches

    return run


def extract_meta(df: DataFrame) -> DataFrame:
    """mapInPandas pass: (media_id, media_type, content) -> typed metadata.
    One Arrow batch at a time; the content column never leaves the worker."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h = [], []
            for mt, c in zip(pdf["media_type"], pdf["content"]):
                try:
                    dims = decode_media(mt, bytes(c))
                except (NotImplementedError, ValueError, IndexError, struct.error):
                    # poison/unknown blob -> sentinel; decode_bmp raises
                    # ValueError on bad magic, struct.error on truncation
                    dims = (-1, -1)
                w.append(dims[0])
                h.append(dims[1])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                    "content_hash": [
                        hashlib.md5(bytes(c)).hexdigest() for c in pdf["content"]
                    ],
                    "width": pd.array(w, dtype="int32"),
                    "height": pd.array(h, dtype="int32"),
                }
            )

    return df.mapInPandas(run, schema=META_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_b_e3", T.LongType()),
        T.StructField("mean_g_e3", T.LongType()),
        T.StructField("mean_r_e3", T.LongType()),
    ]
)


def image_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """image_stats' per-batch body, exposed for fuse() callers."""
    from purldb_spark.multimodal.jpeg import decode_jpeg

    for pdf in batches:
        rows = []
        for mid, c in zip(pdf["media_id"], pdf["content"]):
            try:
                b = bytes(c)
                if b[:8] == _PNG_SIG:
                    codec = decode_png
                elif b[:2] == b"\xff\xd8":
                    codec = decode_jpeg
                else:
                    codec = decode_bmp
                d = codec(b)
            except (ValueError, NotImplementedError, IndexError, struct.error):
                d = {
                    "width": -1,
                    "height": -1,
                    "channels": -1,
                    "n_pixels": 0,
                    "mean_b_e3": 0,
                    "mean_g_e3": 0,
                    "mean_r_e3": 0,
                }
            rows.append({"media_id": mid, **d})
        yield pd.DataFrame(rows)


def image_stats(df: DataFrame) -> DataFrame:
    """REAL image decode through the Arrow plumbing: (media_id, content)
    of BMP, PNG or baseline-JPEG blobs -> per-image dimensions +
    per-channel means (magic-byte dispatch to decode_bmp / decode_png /
    decode_jpeg, all pure Python+numpy — BMP is uncompressed, PNG's
    DEFLATE is stdlib zlib, JPEG's huffman+IDCT is multimodal/jpeg.py).
    Undecodable rows (wrong magic, unsupported variant) surface as
    width = -1 rather than failing the batch — at 100 TB a poison blob
    must not kill the stage."""
    return df.mapInPandas(image_stats_batches, schema=IMAGE_STATS_SCHEMA)


IMAGE_SUMS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def jpeg_sum_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """jpeg_sum_stats' per-batch body, exposed for fuse() callers."""
    from purldb_spark.multimodal.jpeg import jpeg_sums

    for pdf in batches:
        rows = []
        for mid, c in zip(pdf["media_id"], pdf["content"]):
            try:
                d = jpeg_sums(bytes(c))
            except (ValueError, NotImplementedError, IndexError,
                    struct.error):
                d = {
                    "width": -1,
                    "height": -1,
                    "channels": -1,
                    "n_pixels": 0,
                    "sum_r": 0,
                    "sum_g": 0,
                    "sum_b": 0,
                }
            rows.append({"media_id": mid, **d})
        yield pd.DataFrame(rows)


def jpeg_sum_stats(df: DataFrame) -> DataFrame:
    """JPEG decode to integer-exact per-channel pixel SUMS (no float
    mean rounding anywhere — the oracle-checkable face for
    mm_jpeg_roundtrip, multimodal/jpeg.jpeg_sums). Poison contract as
    image_stats: undecodable rows -> width = -1 sentinel."""
    return df.mapInPandas(jpeg_sum_stats_batches, schema=IMAGE_SUMS_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_e3", T.LongType()),
    ]
)


def audio_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """audio_stats' per-batch body, exposed for fuse() callers."""
    for pdf in batches:
        rows = []
        for mid, c in zip(pdf["media_id"], pdf["content"]):
            try:
                d = decode_wav(bytes(c))
            except (ValueError, NotImplementedError, IndexError, struct.error):
                d = {
                    "sample_rate": -1,
                    "channels": -1,
                    "bits": -1,
                    "n_frames": 0,
                    "duration_ms": 0,
                    "rms_e3": 0,
                }
            rows.append({"media_id": mid, **d})
        yield pd.DataFrame(rows)


def audio_stats(df: DataFrame) -> DataFrame:
    """REAL audio decode through the Arrow plumbing: (media_id, content)
    of WAV blobs -> rate/channels/bits/frames/duration/RMS (decode_wav,
    pure-Python RIFF walk + PCM frames). Same poison-blob contract as
    image_stats (sample_rate = -1)."""
    return df.mapInPandas(audio_stats_batches, schema=AUDIO_STATS_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling plumbing: 1 binary row -> n_frames chunk rows (what a
    video decoder would emit). mapInPandas so a single input batch can yield
    a larger output batch without a JVM-side explode of the blob."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                b = bytes(c)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def slice_wav_windows(content: bytes, n_windows: int) -> list[bytes]:
    """REAL audio frame-sampling (r14 — the frame-sample verb upgraded
    from byte-chunking for the decodable modality): split a PCM WAV into
    ``n_windows`` frame-ALIGNED windows, each re-wrapped as a complete,
    independently-decodable WAV with the source's fmt chunk — pure byte
    arithmetic, no resample. Frames never split across windows (slices
    are multiples of block_align); the remainder frames ride in the last
    window. Raises the decoders' errors for non-PCM input — callers map
    them to the poison contract."""
    d = decode_wav(content)  # validates + gives block_align via fmt
    # re-walk for the raw chunks (decode_wav returns stats only)
    pos, fmt_raw, data = 12, None, b""
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        sz = struct.unpack_from("<I", content, pos + 4)[0]
        if cid == b"fmt ":
            fmt_raw = content[pos + 8 : pos + 8 + sz]
        elif cid == b"data":
            data = content[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    ba = d["channels"] * d["bits"] // 8
    frames = len(data) // ba if ba else 0
    per = frames // n_windows
    out = []
    for k in range(n_windows):
        lo = k * per * ba
        hi = len(data) if k == n_windows - 1 else (k + 1) * per * ba
        body = data[lo:hi]
        out.append(
            struct.pack(
                "<4sI4s", b"RIFF", 4 + 8 + len(fmt_raw) + 8 + len(body), b"WAVE"
            )
            + struct.pack("<4sI", b"fmt ", len(fmt_raw))
            + fmt_raw
            + struct.pack("<4sI", b"data", len(body))
            + body
        )
    return out


WINDOW_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_e3", T.LongType()),
    ]
)


def _media_window_rows(mid, content: bytes, n_windows: int) -> list[dict]:
    """Per-media window decode with an ALL-OR-NOTHING poison contract:
    either every window decodes (n_windows real rows) or the media
    contributes exactly one window_idx=-1 sentinel. Rows accumulate in a
    local list and commit only after the last window decodes — a later
    window raising after earlier rows were already committed would
    otherwise mix real rows WITH the sentinel for the same media_id,
    contradicting the documented one-sentinel-row contract (r14 advice)."""
    media_rows = []
    try:
        for k, w in enumerate(slice_wav_windows(bytes(content), n_windows)):
            s = decode_wav(w)
            media_rows.append(
                {
                    "media_id": mid,
                    "window_idx": k,
                    "n_frames": s["n_frames"],
                    "duration_ms": s["duration_ms"],
                    "rms_e3": s["rms_e3"],
                }
            )
        return media_rows
    except (
        ValueError,
        NotImplementedError,
        IndexError,
        struct.error,
        ZeroDivisionError,
    ):
        return [
            {
                "media_id": mid,
                "window_idx": -1,
                "n_frames": 0,
                "duration_ms": 0,
                "rms_e3": 0,
            }
        ]


def audio_window_stats_batches(n_windows: int = 4):
    """audio_window_stats' per-batch body as a fuse() stage factory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                rows.extend(_media_window_rows(mid, c, n_windows))
            yield pd.DataFrame(rows)

    return run


def audio_window_stats(df: DataFrame, n_windows: int = 4) -> DataFrame:
    """Frame-sample + decode in one Arrow pass: (media_id, content) WAV
    blobs -> n_windows rows of per-window frame count / duration / RMS,
    each window decoded as its own complete WAV (slice_wav_windows).
    Poison blobs emit one sentinel row (window_idx = -1) instead of
    killing the batch — the windowed twin of audio_stats' contract
    (_media_window_rows holds the all-or-nothing commit)."""
    return df.mapInPandas(
        audio_window_stats_batches(n_windows), schema=WINDOW_STATS_SCHEMA
    )


EMBED_DIM = 16

EMBED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def bmp_features(content: bytes) -> list[float]:
    """REAL 16-dim image feature vector off the decoded pixels — per
    channel (BGR): mean/255, std/255, min/255, max/255, plus log-scaled
    dims and aspect — a classical color-statistics descriptor (the kind
    of global feature a pre-CNN image index used); a learned encoder is
    a drop-in returning the same (media_id, embedding) shape."""
    import math

    pix, width, h = _bmp_pixels(content)
    chan = pix.astype("float64")
    channels = chan.shape[1]
    feats: list[float] = []
    for ci in range(3):
        col = chan[:, ci] if ci < channels else chan[:, 0]
        feats += [
            float(col.mean() / 255.0),
            float(col.std() / 255.0),
            float(col.min() / 255.0),
            float(col.max() / 255.0),
        ]
    feats += [
        math.log1p(width) / 10.0,
        math.log1p(h) / 10.0,
        width / max(h, 1) / 10.0,
        channels / 4.0,
    ]
    return feats


def png_features(content: bytes) -> list[float]:
    """PNG twin of bmp_features: the same 16-dim color-statistics
    descriptor off _png_pixels, emitted in bmp_features' CANONICAL
    B,G,R dim order (PNG stores R,G,B(,A), so the channel axis is
    reversed here — r15 fix: the r14 version emitted PNG dims in RGB
    order, so the same colored image featurized differently by codec,
    silently breaking the one-comparable-embedding-space contract;
    grayscale replicates its one channel, alpha never enters the
    statistics)."""
    import math

    pix, width, h = _png_pixels(content)
    chan = pix.astype("float64")
    channels = chan.shape[1]
    feats: list[float] = []
    for ci in (2, 1, 0):  # B, G, R — the canonical bmp_features order
        col = chan[:, ci] if channels >= 3 else chan[:, 0]
        feats += [
            float(col.mean() / 255.0),
            float(col.std() / 255.0),
            float(col.min() / 255.0),
            float(col.max() / 255.0),
        ]
    feats += [
        math.log1p(width) / 10.0,
        math.log1p(h) / 10.0,
        width / max(h, 1) / 10.0,
        channels / 4.0,
    ]
    return feats


def jpeg_features(content: bytes) -> list[float]:
    """JPEG twin of bmp_features/png_features: the same 16-dim
    color-statistics descriptor off decode_jpeg_pixels, emitted in the
    canonical B,G,R dim order (the decoder returns RGB; grayscale
    replicates its one channel) — JPEG-sourced media land in the same
    comparable embedding space as BMP/PNG for the ANN stack."""
    import math

    from purldb_spark.multimodal.jpeg import decode_jpeg_pixels

    arr, width, h = decode_jpeg_pixels(content)
    chan = arr.reshape(width * h, arr.shape[2]).astype("float64")
    channels = chan.shape[1]
    feats: list[float] = []
    for ci in (2, 1, 0):  # B, G, R — the canonical bmp_features order
        col = chan[:, ci] if channels >= 3 else chan[:, 0]
        feats += [
            float(col.mean() / 255.0),
            float(col.std() / 255.0),
            float(col.min() / 255.0),
            float(col.max() / 255.0),
        ]
    feats += [
        math.log1p(width) / 10.0,
        math.log1p(h) / 10.0,
        width / max(h, 1) / 10.0,
        channels / 4.0,
    ]
    return feats


def wav_features(content: bytes) -> list[float]:
    """REAL 16-dim audio feature vector off the decoded PCM frames:
    rms, zero-crossing rate, peak, mean |amplitude|, 4-band energy
    profile (coarse spectral shape via strided differencing), energy
    over 7 equal time windows, and log sample rate — exactly EMBED_DIM
    dims; classical audio descriptor statistics, no codec or FFT
    library required."""
    import math

    import numpy as np

    d = decode_wav(content)
    # re-walk to the samples (decode_wav returns stats only)
    import struct

    pos, data = 12, b""
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        sz = struct.unpack_from("<I", content, pos + 4)[0]
        if cid == b"data":
            data = content[pos + 8 : pos + 8 + sz]
            break
        pos += 8 + sz + (sz & 1)
    if d["bits"] == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    if len(s) == 0:
        s = np.zeros(1)
    zc = float(np.mean(np.abs(np.diff(np.sign(s))) > 0)) if len(s) > 1 else 0.0
    feats = [
        float(np.sqrt((s * s).mean())),
        zc,
        float(np.abs(s).max()),
        float(np.abs(s).mean()),
    ]
    # coarse spectral profile: energy of k-strided first differences
    for k in (1, 2, 4, 8):
        dk = s[k:] - s[:-k] if len(s) > k else np.zeros(1)
        feats.append(float(np.sqrt((dk * dk).mean())))
    # temporal energy profile over 7 equal windows (4+4+7+1 = EMBED_DIM
    # — with 8 windows the sample-rate dim was silently truncated off)
    win = np.array_split(s, 7)
    feats += [float(np.sqrt((w * w).mean())) if len(w) else 0.0 for w in win]
    feats.append(math.log1p(d["sample_rate"]) / 12.0)
    assert len(feats) == EMBED_DIM
    return feats


def embed_media(df: DataFrame) -> DataFrame:
    """Feature-extraction plumbing: (media_id, media_type, content) ->
    fixed-dim float vector feeding the knn operators directly. REAL
    features for the decodable formats (bmp/png/jpeg_features /
    wav_features — pixel color statistics, PCM energy/zero-crossing/
    spectral-profile stats); the deterministic md5-derived vector
    remains the fallback
    for fake/* and undecodable rows, so the pipeline never drops a row
    (the embedding-space twin of the poison-blob sentinel contract).
    Accepts frames without a media_type column (legacy callers) — those
    take the hash path."""
    return df.mapInPandas(embed_media_batches, schema=EMBED_SCHEMA)


def _embed_vec(mt: str | None, b: bytes) -> list[float]:
    import struct

    try:
        if mt == "image/bmp":
            return bmp_features(b)
        if mt == "image/png":
            return png_features(b)
        if mt == "image/jpeg":
            return jpeg_features(b)
        if mt == "audio/wav":
            return wav_features(b)
    except (ValueError, NotImplementedError, IndexError, struct.error):
        pass
    d = hashlib.md5(b).digest()
    return [x / 255.0 for x in d[:EMBED_DIM]]


def embed_media_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """embed_media's per-batch body, exposed for fuse() callers."""
    for pdf in batches:
        mts = (
            pdf["media_type"]
            if "media_type" in pdf.columns
            else [None] * len(pdf)
        )
        vecs = [
            _embed_vec(mt, bytes(c)) for mt, c in zip(mts, pdf["content"])
        ]
        yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize face: binary in -> fixed-(width, height) binary out. REAL
    nearest-neighbor resample for decodable images (resize_image: BMP/PNG
    in, canonical 24-bit BMP out — r14, upgraded from the byte-cycling
    stub once the decoders landed); undecodable blobs keep the
    deterministic byte-cycle fallback emitting exactly width*height bytes
    (the resize-shaped twin of the poison-blob sentinel — a torn upload
    must not kill the stage, and downstream schema behavior stays
    testable). Blobs stay inside their Arrow batch — no shuffle, no JVM
    copy of the payload beyond the mapInPandas exchange."""
    return df.mapInPandas(
        resize_media_batches(width, height), schema=RESIZE_SCHEMA
    )


def resize_media_batches(width: int, height: int):
    """resize_media's per-batch body as a fuse() stage factory."""
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for c in pdf["content"]:
                b = bytes(c)
                try:
                    outs.append(resize_image(b, width, height))
                except (
                    ValueError,
                    NotImplementedError,
                    IndexError,
                    struct.error,
                ):
                    if not b:
                        outs.append(bytes(target))
                    else:
                        reps = (target // len(b)) + 1
                        outs.append((b * reps)[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array([width] * len(pdf), dtype="int32"),
                    "height": pd.array([height] * len(pdf), dtype="int32"),
                    "content": outs,
                    "n_bytes": pd.array(
                        [len(o) for o in outs], dtype="int64"
                    ),
                }
            )

    return run


def encode_bmp_rle8(
    width: int, height: int, idxs: list[int], pal_bgr: list[tuple[int, int, int]]
) -> bytes:
    """BI_RLE8 BMP writer — fixture generator for the RLE decode path:
    rows (bottom-up, as the spec stores them) compress as maximal runs,
    except runs of length 1 that neighbor another singleton group into
    ABSOLUTE mode (word-padded) so both stream forms are exercised;
    end-of-line after every row, end-of-bitmap last."""
    import struct

    rows = [idxs[y * width : (y + 1) * width] for y in range(height)]
    stream = bytearray()
    for row in reversed(rows):  # bottom-up
        x = 0
        while x < width:
            run = 1
            while x + run < width and row[x + run] == row[x] and run < 255:
                run += 1
            if run == 1:
                # gather a literal stretch of singletons for absolute mode
                lit = [row[x]]
                while (
                    x + len(lit) < width
                    and len(lit) < 255
                    and (
                        x + len(lit) + 1 >= width
                        or row[x + len(lit)] != row[x + len(lit) + 1]
                    )
                ):
                    lit.append(row[x + len(lit)])
                if len(lit) >= 3:
                    stream += bytes([0, len(lit)]) + bytes(lit)
                    if len(lit) & 1:
                        stream += b"\x00"
                    x += len(lit)
                    continue
                stream += bytes([1, row[x]])
                x += 1
            else:
                stream += bytes([run, row[x]])
                x += run
        stream += b"\x00\x00"  # end of line
    stream += b"\x00\x01"  # end of bitmap
    pal = b"".join(bytes(e) + b"\x00" for e in pal_bgr)
    pix_off = 54 + len(pal)
    hdr = struct.pack(
        "<2sIHHI", b"BM", pix_off + len(stream), 0, 0, pix_off
    ) + struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 8, 1, len(stream), 0, 0, len(pal_bgr), 0,
    )
    return hdr + pal + bytes(stream)


def encode_png_pixels16(rows: list[list[int]], color_type: int) -> bytes:
    """16-bit-depth PNG writer from u16 sample rows (big-endian on the
    wire): the forward filter runs at bpp = channels * 2 BYTES — the
    spec rule whose violation is invisible on 8-bit content — with the
    filter type cycling y % 5; pairs with the depth-16 decode branch."""
    import zlib

    channels = _PNG_CHANNELS[color_type]
    if color_type == 3:
        raise ValueError("paletted PNG cannot be 16-bit")
    byte_rows = [
        b"".join(struct.pack(">H", v) for v in row) for row in rows
    ]
    width = len(rows[0]) // channels
    ihdr = struct.pack(
        ">IIBBBBB", width, len(rows), 16, color_type, 0, 0, 0
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(
            b"IDAT",
            zlib.compress(_png_filter_scanlines(byte_rows, channels * 2)),
        )
        + _png_chunk(b"IEND", b"")
    )


def encode_png_sub8(
    rows: list[list[int]],
    depth: int,
    color_type: int,
    palette: list[tuple[int, int, int]] | None = None,
) -> bytes:
    """Sub-8-bit PNG writer (depths 1/2/4, gray or paletted): samples
    pack MSB-first into byte-aligned scanlines, the forward filter runs
    bytewise at bpp = 1 with the type cycling y % 5, and paletted
    images carry their PLTE — pairs with the packed-sample decode
    branch."""
    import zlib

    import numpy as np

    if color_type not in (0, 3):
        raise ValueError("sub-8-bit PNG is gray or paletted only")
    width = len(rows[0])
    byte_rows = []
    for row in rows:
        bits = np.zeros(width * depth, dtype=np.uint8)
        for i, v in enumerate(row):
            for b in range(depth):
                bits[i * depth + b] = (v >> (depth - 1 - b)) & 1
        byte_rows.append(np.packbits(bits).tobytes())
    ihdr = struct.pack(
        ">IIBBBBB", width, len(rows), depth, color_type, 0, 0, 0
    )
    out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("paletted PNG needs a palette")
        out += _png_chunk(
            b"PLTE", b"".join(bytes(e) for e in palette)
        )
    return (
        out
        + _png_chunk(
            b"IDAT", zlib.compress(_png_filter_scanlines(byte_rows, 1))
        )
        + _png_chunk(b"IEND", b"")
    )
