"""Baseline JFIF (SOF0) JPEG decode — stdlib + numpy only, no PIL/ffmpeg
(r14 verdict gap 1: "huffman decode + dequant + IDCT + YCbCr->RGB needs
only stdlib + numpy" — the PNG precedent, one codec further).

Decoder scope (everything else is an explicit boundary error):
  * baseline sequential DCT (SOF0), 8-bit precision
  * 1 (grayscale) or 3 (YCbCr) components, sampling factors 1 or 2
    (covers 4:4:4, 4:2:2, 4:2:0), chroma upsampled by replication
  * restart markers (DRI/RSTn) with DC-predictor reset
  * progressive (SOF2) / arithmetic / 12-bit / hierarchical raise
    NotImplementedError; torn streams raise ValueError — both map to
    the Spark faces' poison-blob sentinel contract, never stage death

The encoder half exists to make the decoder testable WITHOUT external
fixture files (the encode_png recipe): ``encode_jpeg_coeff_blocks``
writes a syntactically complete JPEG from caller-chosen QUANTIZED
coefficients, custom quant tables and custom huffman code lengths —
so tests drive arbitrary AC/zigzag/huffman/restart patterns through the
real bit paths. On top of it, ``encode_jpeg_gray_mosaic`` and
``encode_jpeg_solid_ycbcr`` emit DC-only images that roundtrip
PIXEL-EXACTLY despite JPEG being lossy: a solid 8x8 block's DCT is pure
DC = 8*(v-128), the DC quant step of 8 makes quantization lossless, and
the IDCT of a pure-DC block is constant — so the registry query's
oracle can predict every decoded pixel arithmetically from doc_id.

Cross-engine determinism: the YCbCr->RGB transform rounds with
floor(x + 0.5) (not round-half-even) so a SQL oracle can replay it
verbatim; the float products involved (1.402 * (Cr - 128) etc.) are
single exactly-rounded IEEE ops, identical in every engine.

Reference parity note: the reference system does not decode media — the
multimodal family exists for the 100 TB training-data pipeline
(SURVEY.md LLM-ops mandate); this file cites only the public JPEG
layout (ITU T.81) re-derived from scratch.
"""

from __future__ import annotations

import math
import struct

# natural-order index of the i-th coefficient in zigzag scan order
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# declared-geometry memory guard (the PNG inflate bound's twin): planes
# decode through float64, so a component plane costs 8 bytes/px — 2^24
# px (4096x4096) caps one plane at ~134 MB, safe for a 32-slot executor
# even with 3 components + the uint8 output; a real 100 TB media
# pipeline tiles anything larger upstream
_MAX_PIXELS = 1 << 24


def _idct_matrix():
    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16.0) / 2.0
    return a


_IDCT_A = None


def _idct2(coef):
    """2-D type-III DCT of one 8x8 coefficient block (float64)."""
    global _IDCT_A
    if _IDCT_A is None:
        _IDCT_A = _idct_matrix()
    return _IDCT_A.T @ coef @ _IDCT_A


def _build_huff(counts: list[int], symbols: bytes) -> dict:
    """Canonical JPEG huffman: (length, code) -> symbol."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if k >= len(symbols):
                raise ValueError("DHT symbol count mismatch")
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over entropy-coded data: un-stuffs 0xFF00,
    recognizes RSTn at restart boundaries, treats any other marker as
    end-of-data (reads past it raise ValueError -> torn stream)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("JPEG entropy data truncated at 0xFF")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed literal 0xFF
            else:
                raise ValueError("JPEG marker inside entropy data")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")

    def restart(self, n: int) -> None:
        """Consume the RSTn marker at a restart boundary (byte-aligned)."""
        self.bitbuf, self.nbits = 0, 0  # discard pad bits
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (n & 7)
        ):
            raise ValueError("JPEG restart marker missing/out of order")
        self.pos += 2


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg_pixels(content: bytes):
    """Full baseline decode: returns (pixels ndarray (height, width,
    channels) uint8 — channels 1 (gray) or 3 (RGB), width, height)."""
    import numpy as np

    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    dri = 0
    pos = 2
    scan = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = content[pos + 1]
        if marker == 0xD8:
            raise ValueError("unexpected SOI")
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        seg = content[pos + 4 : pos + 2 + seglen]
        if len(seg) < seglen - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:  # DQT (one or more tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant table")
                if i + 65 > len(seg):
                    raise ValueError("DQT truncated")
                zz = seg[i + 1 : i + 65]
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zz[k]
                qt[tq] = nat
                i += 65
        elif marker == 0xC4:  # DHT (one or more tables)
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                symbols = seg[i + 17 : i + 17 + n]
                tbl = _build_huff(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("non-8-bit JPEG precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG")
            if not w or not h:
                raise ValueError("zero JPEG dimension")
            if w * h > _MAX_PIXELS:
                raise ValueError("JPEG declared geometry too large")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                hs, vs = hv >> 4, hv & 15
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError("JPEG sampling factor > 2")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG (SOF%d)"
                                      % (marker - 0xC0))
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tt >> 4, tt & 15)
            scan = (sel, pos + 2 + seglen)
            break
        elif marker == 0xD9:
            raise ValueError("JPEG EOI before SOS")
        # APPn / COM / others: skip
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    sel, data_pos = scan
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
        if c["tq"] not in qt:
            raise ValueError("JPEG missing quant table")
        if c["id"] not in sel:
            raise ValueError("JPEG scan does not cover component")
        if sel[c["id"]][0] not in huff_dc or sel[c["id"]][1] not in huff_ac:
            raise ValueError("JPEG missing huffman table")
    r = _BitReader(content, data_pos)
    pred = [0] * len(comps)
    rst = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            r.restart(rst)
            rst = (rst + 1) & 7
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            td, ta = sel[c["id"]]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64, dtype=np.float64)
                    size = r.huff(huff_dc[td])
                    if size > 11:
                        raise ValueError("JPEG DC size out of range")
                    pred[ci] += _extend(r.receive(size), size)
                    coef[0] = pred[ci] * q[0]
                    k = 0
                    while k < 63:
                        sym = r.huff(huff_ac[ta])
                        run, s = sym >> 4, sym & 15
                        if s == 0:
                            if sym == 0x00:
                                break  # EOB
                            if sym == 0xF0:
                                k += 16  # ZRL
                                continue
                            raise ValueError("bad JPEG AC symbol")
                        k += run + 1
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        coef[ZIGZAG[k]] = _extend(r.receive(s), s) * q[
                            ZIGZAG[k]
                        ]
                    block = _idct2(coef.reshape(8, 8)) + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample to full resolution by replication, crop to (h, w)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            p = np.kron(p, np.ones((fy, fx)))
        full.append(p[:h, :w])
    if len(comps) == 1:
        gray = np.clip(np.floor(full[0] + 0.5), 0, 255).astype(np.uint8)
        return gray.reshape(h, w, 1), w, h
    y, cb, cr = full
    # floor(x + 0.5) rounding — SQL-replayable (module docstring)
    rr = y + 1.402 * (cr - 128.0)
    gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bb = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [
            np.clip(np.floor(rr + 0.5), 0, 255),
            np.clip(np.floor(gg + 0.5), 0, 255),
            np.clip(np.floor(bb + 0.5), 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)
    return rgb, w, h


def decode_jpeg(content: bytes) -> dict:
    """decode_png-shaped stat dict (channel means; RGB order; grayscale
    replicates into all three means)."""
    pix, width, height = decode_jpeg_pixels(content)
    n_px = width * height
    flat = pix.reshape(n_px, pix.shape[2]).astype("int64")
    sums = flat.sum(axis=0)

    def mean_e3(ci: int) -> int:
        if not n_px:
            return 0
        c = min(ci, flat.shape[1] - 1)
        return int(round(int(sums[c]) * 1000 / n_px))

    return {
        "width": int(width),
        "height": int(height),
        "channels": int(pix.shape[2]),
        "n_pixels": int(n_px),
        "mean_r_e3": mean_e3(0),
        "mean_g_e3": mean_e3(1),
        "mean_b_e3": mean_e3(2),
    }


def jpeg_sums(content: bytes) -> dict:
    """Integer-exact per-channel pixel SUMS (no rounding anywhere) — the
    oracle-checkable face for the registry roundtrip query."""
    pix, width, height = decode_jpeg_pixels(content)
    flat = pix.reshape(width * height, pix.shape[2]).astype("int64")
    sums = flat.sum(axis=0)

    def s(ci: int) -> int:
        return int(sums[min(ci, flat.shape[1] - 1)])

    return {
        "width": int(width),
        "height": int(height),
        "channels": int(pix.shape[2]),
        "n_pixels": int(width * height),
        "sum_r": s(0),
        "sum_g": s(1),
        "sum_b": s(2),
    }


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (the standard pad)."""
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)

    def marker(self, m: int) -> None:
        self.align()
        self.out += bytes([0xFF, m])


def make_huff_lengths(symbols: list[int], lengths: list[int]) -> dict:
    """Canonical code assignment for caller-chosen (symbol, length)
    pairs (sorted by (length, symbol) — the canonical order); returns
    symbol -> (code, length). Kraft-validated."""
    pairs = sorted(zip(lengths, symbols))
    kraft = sum(2.0 ** -l for l, _ in pairs)
    if kraft > 1.0:
        raise ValueError("huffman lengths violate Kraft inequality")
    out, code, prev_len = {}, 0, 0
    for length, sym in pairs:
        code <<= length - prev_len
        out[sym] = (code, length)
        code += 1
        prev_len = length
    return out


def _dht_bytes(tc: int, th: int, enc: dict) -> bytes:
    counts = [0] * 16
    by_len: list[list[int]] = [[] for _ in range(17)]
    for sym, (_code, length) in enc.items():
        counts[length - 1] += 1
        by_len[length].append(sym)
    symbols = bytes(
        s for length in range(1, 17) for s in sorted(by_len[length])
    )
    body = bytes([(tc << 4) | th] + counts) + symbols
    return struct.pack(">HH", 0xFFC4, 2 + len(body)) + body


def _size_of(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _amp(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def encode_jpeg_coeff_blocks(
    w: int,
    h: int,
    comps: list[dict],
    dri: int = 0,
    dc_lengths: dict | None = None,
    ac_lengths: dict | None = None,
) -> bytes:
    """Write a complete baseline JPEG from QUANTIZED coefficients.

    ``comps``: per component a dict with keys ``id``, ``h``, ``v``
    (sampling factors), ``q`` (64 ints, natural order) and ``blocks`` —
    a 2-D list [block_row][block_col] of 64-int natural-order quantized
    coefficient lists covering ceil-to-MCU geometry. All components
    share one quant slot per component index and one DC + one AC huffman
    table (built from ``dc_lengths`` / ``ac_lengths``: symbol -> code
    length; defaults: every DC size at length 4, EOB at 3 and every AC
    run/size at length 9 — a multi-length table so decoders can't pass
    with a fixed-width shortcut)."""
    if dc_lengths is None:
        dc_lengths = {s: 4 for s in range(12)}
    if ac_lengths is None:
        ac_lengths = {0x00: 3}
        for run in range(16):
            for size in range(1, 11):
                ac_lengths[(run << 4) | size] = 9
        ac_lengths[0xF0] = 9
    dc_enc = make_huff_lengths(
        list(dc_lengths.keys()), list(dc_lengths.values())
    )
    ac_enc = make_huff_lengths(
        list(ac_lengths.keys()), list(ac_lengths.values())
    )

    bw = _BitWriter()
    bw.out += b"\xff\xd8"  # SOI
    # APP0 JFIF: identifier, version 1.1, aspect-ratio units, 1:1, no thumb
    bw.out += struct.pack(
        ">HH4sBBBBHHBB", 0xFFE0, 16, b"JFIF", 0, 1, 1, 0, 1, 1, 0, 0
    )
    for ci, c in enumerate(comps):
        zz = bytes(c["q"][ZIGZAG[k]] for k in range(64))
        bw.out += struct.pack(">HHB", 0xFFDB, 67, ci) + zz
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for ci, c in enumerate(comps):
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], ci])
    bw.out += struct.pack(">HH", 0xFFC0, 2 + len(sof)) + sof
    bw.out += _dht_bytes(0, 0, dc_enc)
    bw.out += _dht_bytes(1, 0, ac_enc)
    if dri:
        bw.out += struct.pack(">HHH", 0xFFDD, 4, dri)
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])
    sos += bytes([0, 63, 0])
    bw.out += struct.pack(">HH", 0xFFDA, 2 + len(sos)) + sos

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    pred = [0] * len(comps)
    rst = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            bw.marker(0xD0 + rst)
            rst = (rst + 1) & 7
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = c["blocks"][my * c["v"] + by][mx * c["h"] + bx]
                    diff = blk[0] - pred[ci]
                    pred[ci] = blk[0]
                    size = _size_of(diff)
                    code, length = dc_enc[size]
                    bw.put(code, length)
                    if size:
                        bw.put(_amp(diff, size), size)
                    # AC in zigzag order, run-length coded
                    run = 0
                    for k in range(1, 64):
                        v = blk[ZIGZAG[k]]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, length = ac_enc[0xF0]
                            bw.put(code, length)
                            run -= 16
                        size = _size_of(v)
                        code, length = ac_enc[(run << 4) | size]
                        bw.put(code, length)
                        bw.put(_amp(v, size), size)
                        run = 0
                    if run:
                        code, length = ac_enc[0x00]
                        bw.put(code, length)
    bw.marker(0xD9)  # EOI (align pads with 1s)
    return bytes(bw.out)


def _dc_only_blocks(nby: int, nbx: int, vals) -> list[list[list[int]]]:
    """[row][col] 64-int blocks with only DC set: vals(by, bx) -> DC."""
    return [
        [[int(vals(by, bx))] + [0] * 63 for bx in range(nbx)]
        for by in range(nby)
    ]


_Q_DC8 = [8] + [16] * 63  # DC step 8: lossless for solid blocks


def encode_jpeg_gray_mosaic(w: int, h: int, block_val) -> bytes:
    """Grayscale baseline JPEG whose 8x8 blocks are each SOLID with
    value ``block_val(bx, by)`` in 0..255 — DC-only coefficients under a
    DC quant step of 8 reconstruct every pixel exactly (module
    docstring), while the DC-difference chain across blocks exercises
    the real huffman path."""
    nbx, nby = -(-w // 8), -(-h // 8)
    comps = [
        {
            "id": 1,
            "h": 1,
            "v": 1,
            "q": _Q_DC8,
            "blocks": _dc_only_blocks(
                nby, nbx, lambda by, bx: block_val(bx, by) - 128
            ),
        }
    ]
    return encode_jpeg_coeff_blocks(w, h, comps)


def encode_jpeg_solid_ycbcr(
    w: int, h: int, ycbcr: tuple[int, int, int], subsample: bool = False
) -> bytes:
    """3-component baseline JPEG, every plane solid at the given YCbCr
    values — 4:4:4, or 4:2:0 when ``subsample`` (solid planes make
    subsampling lossless, so the roundtrip stays pixel-exact through
    the floor(x+0.5) color transform)."""
    y, cb, cr = (int(v) & 0xFF for v in ycbcr)
    s = 2 if subsample else 1
    nbx, nby = -(-w // (8 * s)), -(-h // (8 * s))
    comps = [
        {
            "id": 1,
            "h": s,
            "v": s,
            "q": _Q_DC8,
            "blocks": _dc_only_blocks(
                nby * s, nbx * s, lambda by, bx: y - 128
            ),
        },
        {
            "id": 2,
            "h": 1,
            "v": 1,
            "q": _Q_DC8,
            "blocks": _dc_only_blocks(nby, nbx, lambda by, bx: cb - 128),
        },
        {
            "id": 3,
            "h": 1,
            "v": 1,
            "q": _Q_DC8,
            "blocks": _dc_only_blocks(nby, nbx, lambda by, bx: cr - 128),
        },
    ]
    return encode_jpeg_coeff_blocks(w, h, comps)
