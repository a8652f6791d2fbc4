"""ISO-BMFF (MPEG-4 Part 12) container walk — pure stdlib, no ffmpeg.

The r14 verdict filed mp3/mp4 as "legitimately blocked (polyphase/MDCT
codecs + container parsing)". Half of that is overstated the same way
JPEG was: the CONTAINER layer — the box tree and the sample tables — is
plain big-endian struct walking, and it is exactly the layer video
frame-sampling needs. This module parses

  ftyp / moov / mvhd / trak / tkhd / mdia / mdhd / hdlr /
  minf / stbl : stsd / stts / stsz / stsc / stco | co64 / stss

and RESOLVES the sample tables to per-sample ``(offset, size,
decode_ts)`` so sync-sample (keyframe) byte ranges come straight off
``stss x (stsc / stco / stsz)`` — real frame extraction over an opaque
``binary`` column. Only the frame PAYLOAD decode (H.264/HEVC entropy +
transform) stays behind the codec boundary, which after this module is
the genuinely ffmpeg-shaped part.

Bomb guards (the decode_png ``max_length`` discipline): every box size
is validated against its enclosing extent before recursion, table entry
counts are bounded by the bytes that actually back them, and every
resolved sample range must lie inside the file — a crafted header
cannot allocate or read past the blob.

Encoder half (the encode_png / encode_jpeg_coeff_blocks recipe): tests
and registry queries build syntactically complete MP4s from
caller-chosen frame payloads — ftyp + mdat + moov with real chunk
offsets — so every parse path (32/64-bit stco, version-0/1 mvhd/mdhd,
present/omitted stss, multi-sample chunks) is driven without fixture
files, and a SQL oracle can predict every extracted byte from doc_id.

Reference parity note: the reference system does not parse media — the
multimodal family exists for the 100 TB training-data pipeline
(SURVEY.md LLM-ops mandate); this file re-derives only the public
ISO/IEC 14496-12 box layout from scratch.
"""

from __future__ import annotations

import struct

_U16 = struct.Struct(">H")
_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")


def _u16(b: bytes, o: int) -> int:
    return _U16.unpack_from(b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return _U32.unpack_from(b, o)[0]


def _u64(b: bytes, o: int) -> int:
    return _U64.unpack_from(b, o)[0]


def iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    [start, end). Enforces: full 8/16-byte headers, size >= header,
    and the box lying entirely inside its enclosing extent — the
    recursion-level bomb guard."""
    o = start
    while o < end:
        if end - o < 8:
            raise ValueError("truncated box header")
        size = _u32(data, o)
        btype = bytes(data[o + 4 : o + 8])
        hdr = 8
        if size == 1:  # 64-bit largesize
            if end - o < 16:
                raise ValueError("truncated largesize header")
            size = _u64(data, o + 8)
            hdr = 16
        elif size == 0:  # box extends to end of enclosing extent
            size = end - o
        if size < hdr or o + size > end:
            raise ValueError("box size out of range")
        yield btype, o + hdr, o + size
        o += size


def _find(data: bytes, start: int, end: int, name: bytes):
    for btype, s, e in iter_boxes(data, start, end):
        if btype == name:
            return s, e
    return None


def _findall(data: bytes, start: int, end: int, name: bytes):
    return [(s, e) for btype, s, e in iter_boxes(data, start, end) if btype == name]


def _fullbox(data: bytes, s: int, e: int) -> tuple[int, int]:
    """(version, payload_offset) of a FullBox; flags are skipped."""
    if e - s < 4:
        raise ValueError("truncated fullbox")
    return data[s], s + 4


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(msg)


def _counted_u32s(data: bytes, s: int, e: int, count: int, width: int = 4):
    """Bounded table read: `count` entries of `width` bytes starting at
    s must actually be backed by bytes before e (the table bomb guard —
    a 4-byte count field can claim 2^32 entries)."""
    _require(count >= 0 and s + count * width <= e, "table exceeds box")
    if width == 4:
        return [_u32(data, s + 4 * k) for k in range(count)]
    return [_u64(data, s + 8 * k) for k in range(count)]


def resolve_samples(
    stsc_entries: list[tuple[int, int, int]],
    chunk_offsets: list[int],
    sizes: list[int],
) -> list[tuple[int, int]]:
    """Expand (stsc, stco, stsz) into per-sample (offset, size) —
    the classic chunk-run expansion: stsc holds (first_chunk,
    samples_per_chunk, sdi) runs; each run covers chunks up to the next
    run's first_chunk; within a chunk samples are laid out back to
    back starting at the chunk offset."""
    n_chunks = len(chunk_offsets)
    _require(len(stsc_entries) > 0, "empty stsc")
    spc = [0] * n_chunks
    prev_first = 0
    for idx, (first, per, _sdi) in enumerate(stsc_entries):
        _require(first >= 1 and first > prev_first, "stsc first_chunk not increasing")
        _require(per >= 1, "stsc samples_per_chunk < 1")
        prev_first = first
        last = (
            stsc_entries[idx + 1][0] - 1 if idx + 1 < len(stsc_entries) else n_chunks
        )
        _require(last <= n_chunks, "stsc run past stco")
        for c in range(first - 1, last):
            spc[c] = per
    out: list[tuple[int, int]] = []
    si = 0
    for c in range(n_chunks):
        off = chunk_offsets[c]
        for _ in range(spc[c]):
            _require(si < len(sizes), "stsc expands past stsz")
            out.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    _require(si == len(sizes), "sample tables inconsistent (stsz vs stsc/stco)")
    return out


def _parse_trak(data: bytes, s: int, e: int, file_len: int) -> dict:
    tk = _find(data, s, e, b"tkhd")
    _require(tk is not None, "trak missing tkhd")
    v, p = _fullbox(data, *tk)
    # tkhd payload after fullbox: v0 creation/mod/track_id/rsvd/duration
    # = 20 bytes (v1: 32), then rsvd 8 + layer 2 + alt 2 + vol 2 + rsvd 2
    # + matrix 36 = 52, then width/height as 16.16 fixed
    base = p + (32 if v == 1 else 20) + 52
    _require(base + 8 <= tk[1], "truncated tkhd")
    width = _u32(data, base) >> 16
    height = _u32(data, base + 4) >> 16

    md = _find(data, s, e, b"mdia")
    _require(md is not None, "trak missing mdia")
    mh = _find(data, *md, b"mdhd")
    _require(mh is not None, "mdia missing mdhd")
    v, p = _fullbox(data, *mh)
    if v == 1:
        _require(p + 28 <= mh[1], "truncated mdhd v1")
        m_timescale = _u32(data, p + 16)
        m_duration = _u64(data, p + 20)
    else:
        _require(p + 16 <= mh[1], "truncated mdhd")
        m_timescale = _u32(data, p + 8)
        m_duration = _u32(data, p + 12)
    _require(m_timescale > 0, "mdhd timescale 0")

    hd = _find(data, *md, b"hdlr")
    _require(hd is not None, "mdia missing hdlr")
    _, p = _fullbox(data, *hd)
    _require(p + 8 <= hd[1], "truncated hdlr")
    kind = bytes(data[p + 4 : p + 8]).decode("latin-1")

    mi = _find(data, *md, b"minf")
    _require(mi is not None, "mdia missing minf")
    st = _find(data, *mi, b"stbl")
    _require(st is not None, "minf missing stbl")

    sd = _find(data, *st, b"stsd")
    _require(sd is not None, "stbl missing stsd")
    _, p = _fullbox(data, *sd)
    n_desc = _u32(data, p)
    _require(n_desc >= 1 and p + 8 + 8 <= sd[1], "empty stsd")
    codec = bytes(data[p + 8 : p + 12]).decode("latin-1")
    audio_channels = audio_rate = None
    if kind == "soun":
        # AudioSampleEntry: SampleEntry (6 reserved + data_ref_index)
        # then reserved 8, channelcount u16, samplesize u16,
        # pre_defined u16, reserved u16, samplerate 16.16 fixed
        body = p + 12 + 8  # entry payload after size+fourcc+SampleEntry
        _require(body + 20 <= sd[1], "truncated AudioSampleEntry")
        audio_channels = _u16(data, body + 8)
        audio_rate = _u32(data, body + 16) >> 16

    tt = _find(data, *st, b"stts")
    _require(tt is not None, "stbl missing stts")
    _, p = _fullbox(data, *tt)
    n_tt = _u32(data, p)
    _require(p + 4 + 8 * n_tt <= tt[1], "stts table exceeds box")
    stts = [
        (_u32(data, p + 4 + 8 * k), _u32(data, p + 8 + 8 * k)) for k in range(n_tt)
    ]

    sz = _find(data, *st, b"stsz")
    _require(sz is not None, "stbl missing stsz")
    _, p = _fullbox(data, *sz)
    uniform = _u32(data, p)
    n_samples = _u32(data, p + 4)
    # declared-geometry bomb guard: a sample table cannot describe more
    # payload bytes than the file holds
    _require(n_samples <= file_len, "stsz sample_count exceeds file size")
    if uniform == 0:
        sizes = _counted_u32s(data, p + 8, sz[1], n_samples)
    else:
        sizes = [uniform] * n_samples

    sc = _find(data, *st, b"stsc")
    _require(sc is not None, "stbl missing stsc")
    _, p = _fullbox(data, *sc)
    n_sc = _u32(data, p)
    _require(p + 4 + 12 * n_sc <= sc[1], "stsc table exceeds box")
    stsc = [
        (
            _u32(data, p + 4 + 12 * k),
            _u32(data, p + 8 + 12 * k),
            _u32(data, p + 12 + 12 * k),
        )
        for k in range(n_sc)
    ]

    co = _find(data, *st, b"stco")
    if co is not None:
        _, p = _fullbox(data, *co)
        offsets = _counted_u32s(data, p + 4, co[1], _u32(data, p))
    else:
        co = _find(data, *st, b"co64")
        _require(co is not None, "stbl missing stco/co64")
        _, p = _fullbox(data, *co)
        offsets = _counted_u32s(data, p + 4, co[1], _u32(data, p), width=8)

    ss = _find(data, *st, b"stss")
    if ss is not None:
        _, p = _fullbox(data, *ss)
        sync = _counted_u32s(data, p + 4, ss[1], _u32(data, p))
        _require(
            all(1 <= x <= n_samples for x in sync), "stss sample number out of range"
        )
    else:
        # spec: absent stss means every sample is a sync sample
        sync = list(range(1, n_samples + 1))

    samples = resolve_samples(stsc, offsets, sizes)
    for off, size in samples:
        _require(0 <= off and off + size <= file_len, "sample outside file")

    # decode timestamps off the stts run-lengths
    _require(sum(c for c, _ in stts) == n_samples, "stts count != stsz count")
    ts: list[int] = []
    t = 0
    for count, delta in stts:
        for _ in range(count):
            ts.append(t)
            t += delta
    return {
        "kind": kind,
        "codec": codec,
        "audio_channels": audio_channels,
        "audio_rate": audio_rate,
        "width": width,
        "height": height,
        "timescale": m_timescale,
        "duration": m_duration,
        "n_samples": n_samples,
        "n_chunks": len(offsets),
        "samples": samples,
        "sync": sync,
        "ts": ts,
    }


def parse_mp4(content: bytes) -> dict:
    """Full container walk: brand + movie header + every track's
    resolved sample table. Raises ValueError on any malformed/truncated
    structure (-> the Spark faces' poison sentinel), never reads past
    the buffer."""
    data = bytes(content)
    ft = _find(data, 0, len(data), b"ftyp")
    _require(ft is not None and ft[1] - ft[0] >= 8, "missing ftyp")
    brand = bytes(data[ft[0] : ft[0] + 4]).decode("latin-1")

    mv = _find(data, 0, len(data), b"moov")
    _require(mv is not None, "missing moov")
    mh = _find(data, *mv, b"mvhd")
    _require(mh is not None, "moov missing mvhd")
    v, p = _fullbox(data, *mh)
    if v == 1:
        _require(p + 28 <= mh[1], "truncated mvhd v1")
        timescale = _u32(data, p + 16)
        duration = _u64(data, p + 20)
    else:
        _require(p + 16 <= mh[1], "truncated mvhd")
        timescale = _u32(data, p + 8)
        duration = _u32(data, p + 12)
    _require(timescale > 0, "mvhd timescale 0")

    tracks = [
        _parse_trak(data, s, e, len(data)) for s, e in _findall(data, *mv, b"trak")
    ]
    _require(len(tracks) >= 1, "moov has no trak")
    return {
        "brand": brand,
        "timescale": timescale,
        "duration": duration,
        "duration_ms": duration * 1000 // timescale,
        "tracks": tracks,
    }


def sample_bytes(content: bytes, track: dict, sample_no: int) -> bytes:
    """Extract 1-based sample `sample_no`'s payload bytes (frame
    extraction — ranges were validated against the file in parse)."""
    off, size = track["samples"][sample_no - 1]
    return bytes(content[off : off + size])


# ---------------------------------------------------------------- encoder


def _box(btype: bytes, payload: bytes) -> bytes:
    return _U32.pack(8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + payload)


def _visual_sample_entry(codec: bytes, width: int, height: int) -> bytes:
    # ISO 14496-12 VisualSampleEntry: SampleEntry (6 reserved +
    # data_reference_index) + pre_defined/reserved 16 + dims + 72/72 dpi
    # + reserved + frame_count 1 + 32-byte compressorname + depth 24 +
    # pre_defined -1
    p = (
        b"\x00" * 6
        + _U16.pack(1)
        + b"\x00" * 16
        + _U16.pack(width)
        + _U16.pack(height)
        + _U32.pack(0x00480000)
        + _U32.pack(0x00480000)
        + _U32.pack(0)
        + _U16.pack(1)
        + b"\x00" * 32
        + _U16.pack(24)
        + struct.pack(">h", -1)
    )
    return _box(codec, p)


def encode_mp4(
    width: int,
    height: int,
    payloads: list[bytes],
    *,
    delta: int = 40,
    timescale: int = 1000,
    sync_every: int = 1,
    samples_per_chunk: int = 1,
    use_co64: bool = False,
    v1: bool = False,
    codec: bytes = b"mp4v",
    captions: list[str] | None = None,
    caption_delta: int = 50,
    audio_payloads: list[bytes] | None = None,
    audio_rate: int = 8000,
    audio_channels: int = 1,
    audio_delta: int = 1024,
) -> bytes:
    """Write a syntactically complete single-video-track MP4 around
    caller-chosen frame payloads: ftyp + mdat first (so moov's chunk
    offsets are real absolute file offsets), then moov with mvhd/tkhd/
    mdhd (version 1 when v1=True), hdlr 'vide', vmhd/dinf, and the full
    sample-table battery — stts one run of `delta`, per-sample stsz,
    stsc/stco (or co64) grouping `samples_per_chunk` samples per chunk,
    and stss marking samples 1, 1+g, ... (OMITTED when sync_every == 1:
    the spec's all-sync representation, so both parser branches are
    driven). When `captions` is given, a SECOND trak (hdlr 'text',
    tx3g sample entries: u16 length + utf-8 — the 3GPP timed-text
    sample format) rides in the same mdat after the video payloads,
    one caption per `caption_delta` ticks, all in one chunk — the
    subtitle track clip-caption alignment extracts."""
    n = len(payloads)
    if n < 1:
        raise ValueError("need at least one sample")
    cap_payloads = [
        _U16.pack(len(c.encode("utf-8"))) + c.encode("utf-8")
        for c in (captions or [])
    ]
    aud_payloads = list(audio_payloads or [])
    ftyp = _box(b"ftyp", b"isom" + _U32.pack(0) + b"isom" + b"iso2")
    mdat = _box(
        b"mdat",
        b"".join(payloads) + b"".join(cap_payloads) + b"".join(aud_payloads),
    )
    base = len(ftyp) + 8  # first payload byte inside mdat

    sizes = [len(p) for p in payloads]
    chunk_offsets: list[int] = []
    off = base
    for i in range(0, n, samples_per_chunk):
        chunk_offsets.append(off)
        off += sum(sizes[i : i + samples_per_chunk])

    duration = n * delta
    if v1:
        mvhd = _full(
            b"mvhd",
            1,
            _U64.pack(0) * 2
            + _U32.pack(timescale)
            + _U64.pack(duration)
            + _U32.pack(0x00010000)
            + _U16.pack(0x0100)
            + b"\x00" * 10
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + _U32.pack(2),
        )
        mdhd = _full(
            b"mdhd",
            1,
            _U64.pack(0) * 2
            + _U32.pack(timescale)
            + _U64.pack(duration)
            + _U16.pack(0x55C4)
            + _U16.pack(0),
        )
    else:
        mvhd = _full(
            b"mvhd",
            0,
            _U32.pack(0) * 2
            + _U32.pack(timescale)
            + _U32.pack(duration)
            + _U32.pack(0x00010000)
            + _U16.pack(0x0100)
            + b"\x00" * 10
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + _U32.pack(2),
        )
        mdhd = _full(
            b"mdhd",
            0,
            _U32.pack(0) * 2
            + _U32.pack(timescale)
            + _U32.pack(duration)
            + _U16.pack(0x55C4)
            + _U16.pack(0),
        )
    tkhd_body = (
        (_U64.pack(0) * 2 if v1 else _U32.pack(0) * 2)
        + _U32.pack(1)  # track_id
        + _U32.pack(0)
        + (_U64.pack(duration) if v1 else _U32.pack(duration))
        + b"\x00" * 8
        + _U16.pack(0) * 4
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + _U32.pack(width << 16)
        + _U32.pack(height << 16)
    )
    tkhd = _full(b"tkhd", 1 if v1 else 0, tkhd_body)
    hdlr = _full(b"hdlr", 0, _U32.pack(0) + b"vide" + _U32.pack(0) * 3 + b"\x00")
    vmhd = _full(b"vmhd", 0, _U16.pack(0) * 4)
    # url box with the self-contained flag set (flags = 1)
    url = _box(b"url ", bytes([0, 0, 0, 1]))
    dref = _full(b"dref", 0, _U32.pack(1) + url)
    dinf = _box(b"dinf", dref)

    stsd = _full(
        b"stsd", 0, _U32.pack(1) + _visual_sample_entry(codec, width, height)
    )
    stts = _full(b"stts", 0, _U32.pack(1) + _U32.pack(n) + _U32.pack(delta))
    stsz = _full(
        b"stsz",
        0,
        _U32.pack(0) + _U32.pack(n) + b"".join(_U32.pack(s) for s in sizes),
    )
    # a final partial chunk needs its own stsc run (the spec's run-length
    # encoding: each run covers chunks up to the next run's first_chunk)
    runs = [(1, samples_per_chunk)]
    if n % samples_per_chunk:
        if len(chunk_offsets) == 1:
            runs = [(1, n)]
        else:
            runs.append((len(chunk_offsets), n % samples_per_chunk))
    stsc = _full(
        b"stsc",
        0,
        _U32.pack(len(runs))
        + b"".join(
            _U32.pack(first) + _U32.pack(per) + _U32.pack(1) for first, per in runs
        ),
    )
    if use_co64:
        stco = _full(
            b"co64",
            0,
            _U32.pack(len(chunk_offsets))
            + b"".join(_U64.pack(o) for o in chunk_offsets),
        )
    else:
        stco = _full(
            b"stco",
            0,
            _U32.pack(len(chunk_offsets))
            + b"".join(_U32.pack(o) for o in chunk_offsets),
        )
    stbl_children = stsd + stts + stsc + stsz + stco
    if sync_every > 1:
        sync = list(range(1, n + 1, sync_every))
        stbl_children += _full(
            b"stss",
            0,
            _U32.pack(len(sync)) + b"".join(_U32.pack(x) for x in sync),
        )
    stbl = _box(b"stbl", stbl_children)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)

    text_trak = b""
    if cap_payloads:
        nc = len(cap_payloads)
        cdur = nc * caption_delta
        cap_base = base + sum(sizes)  # captions follow the video payloads
        t_tkhd = _full(
            b"tkhd",
            0,
            _U32.pack(0) * 2
            + _U32.pack(2)  # track_id
            + _U32.pack(0)
            + _U32.pack(cdur)
            + b"\x00" * 8
            + _U16.pack(0) * 4
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + _U32.pack(0)  # text tracks carry no visual dims here
            + _U32.pack(0),
        )
        t_mdhd = _full(
            b"mdhd",
            0,
            _U32.pack(0) * 2
            + _U32.pack(timescale)
            + _U32.pack(cdur)
            + _U16.pack(0x55C4)
            + _U16.pack(0),
        )
        t_hdlr = _full(
            b"hdlr", 0, _U32.pack(0) + b"text" + _U32.pack(0) * 3 + b"\x00"
        )
        # tx3g sample entry: SampleEntry header + the 3GPP TextSampleEntry
        # fixed fields (display flags, justification, bg color, box record,
        # style record) zeroed — the parser reads the fourcc; a player
        # would read defaults
        tx3g = _box(
            b"tx3g", b"\x00" * 6 + _U16.pack(1) + b"\x00" * 30
        )
        t_stsd = _full(b"stsd", 0, _U32.pack(1) + tx3g)
        t_stts = _full(
            b"stts", 0, _U32.pack(1) + _U32.pack(nc) + _U32.pack(caption_delta)
        )
        t_stsc = _full(
            b"stsc", 0, _U32.pack(1) + _U32.pack(1) + _U32.pack(nc) + _U32.pack(1)
        )
        t_stsz = _full(
            b"stsz",
            0,
            _U32.pack(0)
            + _U32.pack(nc)
            + b"".join(_U32.pack(len(p)) for p in cap_payloads),
        )
        t_stco = _full(b"stco", 0, _U32.pack(1) + _U32.pack(cap_base))
        t_stbl = _box(b"stbl", t_stsd + t_stts + t_stsc + t_stsz + t_stco)
        nmhd = _full(b"nmhd", 0, b"")
        t_minf = _box(b"minf", nmhd + dinf + t_stbl)
        t_mdia = _box(b"mdia", t_mdhd + t_hdlr + t_minf)
        text_trak = _box(b"trak", t_tkhd + t_mdia)

    audio_trak = b""
    if aud_payloads:
        na = len(aud_payloads)
        adur = na * audio_delta
        aud_base = (
            base + sum(sizes) + sum(len(p) for p in cap_payloads)
        )
        a_tkhd = _full(
            b"tkhd",
            0,
            _U32.pack(0) * 2
            + _U32.pack(3)  # track_id
            + _U32.pack(0)
            + _U32.pack(adur)
            + b"\x00" * 8
            + _U16.pack(0) * 3
            + _U16.pack(0x0100)  # volume, audio convention
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + _U32.pack(0)
            + _U32.pack(0),
        )
        a_mdhd = _full(
            b"mdhd",
            0,
            _U32.pack(0) * 2
            + _U32.pack(audio_rate)  # audio media timescale = sample rate
            + _U32.pack(adur)
            + _U16.pack(0x55C4)
            + _U16.pack(0),
        )
        a_hdlr = _full(
            b"hdlr", 0, _U32.pack(0) + b"soun" + _U32.pack(0) * 3 + b"\x00"
        )
        # mp4a AudioSampleEntry: SampleEntry + reserved 8 + channelcount
        # + samplesize 16 + pre_defined + reserved + samplerate 16.16
        mp4a = _box(
            b"mp4a",
            b"\x00" * 6
            + _U16.pack(1)
            + b"\x00" * 8
            + _U16.pack(audio_channels)
            + _U16.pack(16)
            + _U16.pack(0)
            + _U16.pack(0)
            + _U32.pack(audio_rate << 16),
        )
        a_stsd = _full(b"stsd", 0, _U32.pack(1) + mp4a)
        a_stts = _full(
            b"stts", 0, _U32.pack(1) + _U32.pack(na) + _U32.pack(audio_delta)
        )
        a_stsc = _full(
            b"stsc", 0, _U32.pack(1) + _U32.pack(1) + _U32.pack(na) + _U32.pack(1)
        )
        a_stsz = _full(
            b"stsz",
            0,
            _U32.pack(0)
            + _U32.pack(na)
            + b"".join(_U32.pack(len(p)) for p in aud_payloads),
        )
        a_stco = _full(b"stco", 0, _U32.pack(1) + _U32.pack(aud_base))
        a_stbl = _box(
            b"stbl", a_stsd + a_stts + a_stsc + a_stsz + a_stco
        )
        smhd = _full(b"smhd", 0, _U16.pack(0) + _U16.pack(0))
        a_minf = _box(b"minf", smhd + dinf + a_stbl)
        a_mdia = _box(b"mdia", a_mdhd + a_hdlr + a_minf)
        audio_trak = _box(b"trak", a_tkhd + a_mdia)

    moov = _box(b"moov", mvhd + trak + text_trak + audio_trak)
    return ftyp + mdat + moov


def parse_tx3g(sample: bytes) -> str:
    """Decode one tx3g timed-text sample: u16 length + utf-8 text."""
    if len(sample) < 2:
        raise ValueError("tx3g sample too short")
    n = _u16(sample, 0)
    if 2 + n > len(sample):
        raise ValueError("tx3g length exceeds sample")
    return sample[2 : 2 + n].decode("utf-8")


# ------------------------------------------------- fragmented MP4 (fMP4)

_TRUN_DATA_OFFSET = 0x000001
_TRUN_SAMPLE_DURATION = 0x000100
_TRUN_SAMPLE_SIZE = 0x000200
_TFHD_DEFAULT_DURATION = 0x000008
_TFHD_DEFAULT_SIZE = 0x000010


def parse_fmp4(content: bytes) -> dict:
    """Walk a FRAGMENTED MP4 (the DASH/HLS form): an init segment
    (moov with an mvex/trex carrying track defaults, sample tables
    empty) followed by moof+mdat pairs, each moof holding
    mfhd (sequence number) + traf (tfhd overrides, optional tfdt base
    decode time, trun per-sample table). Sample offsets resolve from
    the trun data_offset RELATIVE TO THE MOOF START (the base-is-moof
    convention encode_fmp4 writes) plus cumulative sizes; sizes and
    durations fall back tfhd -> trex defaults when the trun omits them
    — both branches are real fragment-layer logic a progressive-upload
    pipeline needs. Same bomb discipline as parse_mp4: every table
    bounded by its box, every resolved range bounded by the file.

    Returns {'brand', 'timescale', 'track_id', 'default_size',
    'default_duration', 'fragments': [{'seq', 'base_ts', 'samples':
    [(offset, size, ts)]}]}."""
    data = bytes(content)
    ft = _find(data, 0, len(data), b"ftyp")
    _require(ft is not None, "missing ftyp")
    brand = bytes(data[ft[0] : ft[0] + 4]).decode("latin-1")

    mv = _find(data, 0, len(data), b"moov")
    _require(mv is not None, "missing moov")
    mh = _find(data, *mv, b"mvhd")
    _require(mh is not None, "moov missing mvhd")
    v, p = _fullbox(data, *mh)
    timescale = _u32(data, p + 16 if v == 1 else p + 8)
    _require(timescale > 0, "mvhd timescale 0")

    mx = _find(data, *mv, b"mvex")
    _require(mx is not None, "fragmented file missing mvex")
    tx = _find(data, *mx, b"trex")
    _require(tx is not None, "mvex missing trex")
    _, p = _fullbox(data, *tx)
    _require(p + 20 <= tx[1], "truncated trex")
    track_id = _u32(data, p)
    trex_duration = _u32(data, p + 8)
    trex_size = _u32(data, p + 12)

    fragments = []
    for btype, s, e in iter_boxes(data, 0, len(data)):
        if btype != b"moof":
            continue
        moof_start = s - 8  # offsets are relative to the moof box start
        mf = _find(data, s, e, b"mfhd")
        _require(mf is not None, "moof missing mfhd")
        _, p = _fullbox(data, *mf)
        seq = _u32(data, p)
        tf = _find(data, s, e, b"traf")
        _require(tf is not None, "moof missing traf")
        th = _find(data, *tf, b"tfhd")
        _require(th is not None, "traf missing tfhd")
        flags = int.from_bytes(data[th[0] + 1 : th[0] + 4], "big")
        p = th[0] + 4
        _require(_u32(data, p) == track_id, "tfhd track mismatch")
        p += 4
        if flags & 0x000001:  # base-data-offset present (not written here)
            p += 8
        if flags & 0x000002:  # sample-description-index
            p += 4
        default_duration = trex_duration
        default_size = trex_size
        if flags & _TFHD_DEFAULT_DURATION:
            default_duration = _u32(data, p)
            p += 4
        if flags & _TFHD_DEFAULT_SIZE:
            default_size = _u32(data, p)
            p += 4

        base_ts = 0
        td = _find(data, *tf, b"tfdt")
        if td is not None:
            v, p = _fullbox(data, *td)
            base_ts = _u64(data, p) if v == 1 else _u32(data, p)

        tr = _find(data, *tf, b"trun")
        _require(tr is not None, "traf missing trun")
        tflags = int.from_bytes(data[tr[0] + 1 : tr[0] + 4], "big")
        p = tr[0] + 4
        count = _u32(data, p)
        p += 4
        _require(count <= len(data), "trun sample_count exceeds file")
        _require(tflags & _TRUN_DATA_OFFSET, "trun missing data_offset")
        data_offset = int.from_bytes(
            data[p : p + 4], "big", signed=True
        )
        p += 4
        per = 0
        if tflags & _TRUN_SAMPLE_DURATION:
            per += 4
        if tflags & _TRUN_SAMPLE_SIZE:
            per += 4
        _require(p + count * per <= tr[1], "trun table exceeds box")
        samples = []
        off = moof_start + data_offset
        ts = base_ts
        for _k in range(count):
            dur = default_duration
            size = default_size
            if tflags & _TRUN_SAMPLE_DURATION:
                dur = _u32(data, p)
                p += 4
            if tflags & _TRUN_SAMPLE_SIZE:
                size = _u32(data, p)
                p += 4
            _require(
                0 <= off and off + size <= len(data),
                "fragment sample outside file",
            )
            samples.append((off, size, ts))
            off += size
            ts += dur
        fragments.append({"seq": seq, "base_ts": base_ts, "samples": samples})
    _require(len(fragments) >= 1, "no moof fragments")
    return {
        "brand": brand,
        "timescale": timescale,
        "track_id": track_id,
        "default_size": trex_size,
        "default_duration": trex_duration,
        "fragments": fragments,
    }


def encode_fmp4(
    width: int,
    height: int,
    fragments: list[list[bytes]],
    *,
    delta: int = 40,
    timescale: int = 1000,
    uniform_size: bool = False,
) -> bytes:
    """Write a fragmented MP4: init segment (ftyp 'iso5' + moov whose
    sample tables are EMPTY and whose mvex/trex carries the defaults),
    then one moof+mdat pair per fragment — mfhd sequence numbers from
    1, tfdt carrying the running base decode time, and a trun with
    data_offset relative to the moof start. When uniform_size is True
    (all payloads in a fragment must be equal-sized) the trun OMITS
    per-sample sizes and the tfhd carries default-sample-size — the
    fallback branch; otherwise the trun lists per-sample sizes."""
    _require(len(fragments) >= 1, "need at least one fragment")
    ftyp = _box(b"ftyp", b"iso5" + _U32.pack(0) + b"iso5" + b"isom")

    mvhd = _full(
        b"mvhd",
        0,
        _U32.pack(0) * 2
        + _U32.pack(timescale)
        + _U32.pack(0)
        + _U32.pack(0x00010000)
        + _U16.pack(0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + _U32.pack(2),
    )
    tkhd = _full(
        b"tkhd",
        0,
        _U32.pack(0) * 2
        + _U32.pack(1)
        + _U32.pack(0)
        + _U32.pack(0)
        + b"\x00" * 8
        + _U16.pack(0) * 4
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + _U32.pack(width << 16)
        + _U32.pack(height << 16),
    )
    mdhd = _full(
        b"mdhd",
        0,
        _U32.pack(0) * 2
        + _U32.pack(timescale)
        + _U32.pack(0)
        + _U16.pack(0x55C4)
        + _U16.pack(0),
    )
    hdlr = _full(b"hdlr", 0, _U32.pack(0) + b"vide" + _U32.pack(0) * 3 + b"\x00")
    vmhd = _full(b"vmhd", 0, _U16.pack(0) * 4)
    url = _box(b"url ", bytes([0, 0, 0, 1]))
    dinf = _box(b"dinf", _full(b"dref", 0, _U32.pack(1) + url))
    stsd = _full(
        b"stsd", 0, _U32.pack(1) + _visual_sample_entry(b"mp4v", width, height)
    )
    empty_stts = _full(b"stts", 0, _U32.pack(0))
    empty_stsc = _full(b"stsc", 0, _U32.pack(0))
    empty_stsz = _full(b"stsz", 0, _U32.pack(0) + _U32.pack(0))
    empty_stco = _full(b"stco", 0, _U32.pack(0))
    stbl = _box(b"stbl", stsd + empty_stts + empty_stsc + empty_stsz + empty_stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    trex = _full(
        b"trex",
        0,
        _U32.pack(1)  # track_id
        + _U32.pack(1)  # default sample description index
        + _U32.pack(delta)  # default sample duration
        + _U32.pack(0)  # default sample size (overridden per fragment)
        + _U32.pack(0),
    )
    mvex = _box(b"mvex", trex)
    moov = _box(b"moov", mvhd + trak + mvex)

    out = bytearray(ftyp + moov)
    base_ts = 0
    for fi, payloads in enumerate(fragments):
        _require(len(payloads) >= 1, "empty fragment")
        mfhd = _full(b"mfhd", 0, _U32.pack(fi + 1))
        if uniform_size:
            _require(
                len({len(p) for p in payloads}) == 1,
                "uniform_size fragment with unequal payloads",
            )
            tfhd = _box(
                b"tfhd",
                bytes([0]) + _TFHD_DEFAULT_SIZE.to_bytes(3, "big")
                + _U32.pack(1)
                + _U32.pack(len(payloads[0])),
            )
            tflags = _TRUN_DATA_OFFSET
            trun_samples = b""
        else:
            tfhd = _box(b"tfhd", bytes([0, 0, 0, 0]) + _U32.pack(1))
            tflags = _TRUN_DATA_OFFSET | _TRUN_SAMPLE_SIZE
            trun_samples = b"".join(_U32.pack(len(p)) for p in payloads)
        tfdt = _full(b"tfdt", 0, _U32.pack(base_ts))
        # data_offset = moof size + mdat header (8); moof size depends on
        # trun size, which is fixed once sample count and flags are known
        trun_fixed = 4 + 4 + 4  # version/flags + sample_count + data_offset
        trun_size = 8 + trun_fixed + len(trun_samples)
        traf_size = 8 + len(tfhd) + len(tfdt) + trun_size
        moof_size = 8 + len(mfhd) + traf_size
        trun = _box(
            b"trun",
            bytes([0]) + tflags.to_bytes(3, "big")
            + _U32.pack(len(payloads))
            + struct.pack(">i", moof_size + 8)
            + trun_samples,
        )
        traf = _box(b"traf", tfhd + tfdt + trun)
        moof = _box(b"moof", mfhd + traf)
        assert len(moof) == moof_size
        out += moof + _box(b"mdat", b"".join(payloads))
        base_ts += len(payloads) * delta
    return bytes(out)
