"""MPEG-1 Layer III frame walk — pure stdlib, no ffmpeg.

The frame LAYER of an mp3 stream is plain header arithmetic: an 11-bit
sync word, version/layer bits, bitrate and sample-rate table lookups,
and the Layer-III frame-length formula

    frame_bytes = 144000 * bitrate_kbps // sample_rate + padding

This module walks that layer — ID3v2 skip (syncsafe size), a bounded
forward resync scan, per-frame header validation (consecutive frames
must agree on version/layer/sample-rate; bitrate MAY vary — that is
VBR), Xing/Info VBR-header detection in the first frame's side-info
region, and the duration identity ``frames * 1152 / sample_rate`` —
which is everything metadata extraction and frame-sampling over an
opaque ``binary`` column need. Only the frame PAYLOAD decode (huffman +
IMDCT + polyphase synthesis) stays behind the codec boundary.

Bomb guards: the resync scan is bounded (_RESYNC_LIMIT bytes), header
fields that index reserved table slots raise ValueError, and the walk
never reads past the buffer — a truncated final frame is an error, not
an overread.

Encoder half (the encode_png recipe): ``encode_mp3`` writes a
syntactically complete CBR stream from caller-chosen fill bytes —
optional ID3v2 tag, optional zero-junk prefix (drives the resync
scan), optional Xing block at the spec'd mono/stereo side-info offset —
so tests and the registry query drive every walker branch without
fixture files and a SQL oracle predicts every reported number from
doc_id.

Reference parity note: the reference system does not parse media — the
multimodal family exists for the 100 TB training-data pipeline
(SURVEY.md LLM-ops mandate); this file re-derives only the public
ISO/IEC 11172-3 header layout from scratch.
"""

from __future__ import annotations

# MPEG-1 Layer III bitrate table (index 1..14), kbps
_BITRATE_KBPS = {
    1: 32, 2: 40, 3: 48, 4: 56, 5: 64, 6: 80, 7: 96,
    8: 112, 9: 128, 10: 160, 11: 192, 12: 224, 13: 256, 14: 320,
}
_KBPS_TO_IDX = {v: k for k, v in _BITRATE_KBPS.items()}
# MPEG-1 sample-rate table (index 0..2)
_SAMPLE_RATES = (44100, 48000, 32000)
_SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III
# side-info bytes after the 4-byte header, MPEG-1: 17 mono / 32 stereo —
# the offset at which a Xing/Info block sits
_SIDE_INFO_MONO = 17
_SIDE_INFO_STEREO = 32
_RESYNC_LIMIT = 4096


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(msg)


def skip_id3v2(data: bytes) -> int:
    """Return the offset of the first byte after a leading ID3v2 tag
    (0 when absent). The 4 size bytes are SYNCSAFE (7 bits each) so a
    tag can never alias a frame sync."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    _require(all(b < 0x80 for b in data[6:10]), "ID3v2 size not syncsafe")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    end = 10 + size
    _require(end <= len(data), "ID3v2 size exceeds file")
    return end


def parse_frame_header(data: bytes, o: int) -> dict:
    """Parse + validate one 4-byte header at offset o. Raises ValueError
    for anything that is not MPEG-1 Layer III with a defined bitrate and
    sample rate."""
    _require(o + 4 <= len(data), "truncated frame header")
    b1, b2, b3, b4 = data[o : o + 4]
    _require(b1 == 0xFF and (b2 & 0xE0) == 0xE0, "no frame sync")
    version = (b2 >> 3) & 0x3
    layer = (b2 >> 1) & 0x3
    _require(version == 0b11, "not MPEG-1")
    _require(layer == 0b01, "not Layer III")
    br_idx = (b3 >> 4) & 0xF
    _require(1 <= br_idx <= 14, "reserved/free bitrate index")
    sr_idx = (b3 >> 2) & 0x3
    _require(sr_idx != 3, "reserved sample-rate index")
    padding = (b3 >> 1) & 0x1
    mode = (b4 >> 6) & 0x3
    kbps = _BITRATE_KBPS[br_idx]
    sr = _SAMPLE_RATES[sr_idx]
    return {
        "kbps": kbps,
        "sample_rate": sr,
        "padding": padding,
        "mono": mode == 0b11,
        "frame_bytes": 144000 * kbps // sr + padding,
    }


def _find_sync(data: bytes, start: int) -> int:
    """Bounded forward scan for the next plausible frame sync."""
    limit = min(len(data) - 1, start + _RESYNC_LIMIT)
    o = start
    while o < limit:
        if data[o] == 0xFF and (data[o + 1] & 0xE0) == 0xE0:
            return o
        o += 1
    raise ValueError("no frame sync within resync window")


def walk_mp3(content: bytes) -> dict:
    """Walk every physical frame: ID3v2 skip, bounded resync, per-frame
    header validation (sample rate must not change mid-stream), Xing
    detection in frame 1. Returns the metadata a pipeline needs —
    including per-frame (offset, size) for frame-sampling."""
    data = bytes(content)
    _require(len(data) >= 4, "too short for a frame")
    id3_end = skip_id3v2(data)
    first = _find_sync(data, id3_end)
    frames: list[tuple[int, int]] = []
    sr = None
    kbps_first = None
    o = first
    while o < len(data):
        h = parse_frame_header(data, o)
        if sr is None:
            sr = h["sample_rate"]
            kbps_first = h["kbps"]
        else:
            _require(h["sample_rate"] == sr, "sample rate changed mid-stream")
        _require(o + h["frame_bytes"] <= len(data), "truncated final frame")
        frames.append((o, h["frame_bytes"]))
        o += h["frame_bytes"]

    # Xing/Info VBR block sits right after the first frame's side info
    h0 = parse_frame_header(data, first)
    side = _SIDE_INFO_MONO if h0["mono"] else _SIDE_INFO_STEREO
    xo = first + 4 + side
    is_vbr = False
    audio_frames = len(frames)
    if xo + 8 <= len(data) and data[xo : xo + 4] in (b"Xing", b"Info"):
        is_vbr = data[xo : xo + 4] == b"Xing"
        flags = int.from_bytes(data[xo + 4 : xo + 8], "big")
        if flags & 0x1:
            _require(xo + 12 <= len(data), "truncated Xing frame count")
            # the Xing frame itself carries no audio
            audio_frames = int.from_bytes(data[xo + 8 : xo + 12], "big")
    return {
        "sample_rate": sr,
        "bitrate_kbps": kbps_first,
        "n_frames": len(frames),
        "audio_frames": audio_frames,
        "is_vbr": is_vbr,
        "duration_ms": audio_frames * _SAMPLES_PER_FRAME * 1000 // sr,
        "id3_bytes": id3_end,
        "junk_bytes": first - id3_end,
        "stream_bytes": sum(s for _, s in frames),
        "frames": frames,
    }


# ---------------------------------------------------------------- encoder


def encode_mp3(
    kbps: int,
    sample_rate: int,
    n_frames: int,
    fill,
    *,
    id3_payload: int | None = None,
    junk: int = 0,
    xing_frames: int | None = None,
) -> bytes:
    """Write a syntactically complete CBR mono MPEG-1 Layer III stream:
    optional ID3v2 tag of `id3_payload` bytes, `junk` zero bytes before
    the first sync (drives the bounded resync scan — zeros can never
    alias a sync), then `n_frames` frames whose non-header bytes are
    fill(frame_idx) mod 256; when xing_frames is not None the first
    frame carries a Xing block (frames-present flag) at the mono
    side-info offset."""
    sr_idx = _SAMPLE_RATES.index(sample_rate)
    br_idx = _KBPS_TO_IDX[kbps]
    frame_bytes = 144000 * kbps // sample_rate
    hdr = bytes(
        [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0xC0]
    )  # MPEG-1 L3, no CRC, no padding, mono
    out = bytearray()
    if id3_payload is not None:
        _require(id3_payload < 1 << 28, "ID3 payload too large")
        out += b"ID3" + bytes([4, 0, 0]) + bytes(
            [
                (id3_payload >> 21) & 0x7F,
                (id3_payload >> 14) & 0x7F,
                (id3_payload >> 7) & 0x7F,
                id3_payload & 0x7F,
            ]
        )
        out += b"\x00" * id3_payload
    out += b"\x00" * junk
    for k in range(n_frames):
        body = bytearray([fill(k) % 256] * (frame_bytes - 4))
        if k == 0 and xing_frames is not None:
            xo = _SIDE_INFO_MONO  # offset inside body
            body[xo : xo + 4] = b"Xing"
            body[xo + 4 : xo + 8] = (0x1).to_bytes(4, "big")
            body[xo + 8 : xo + 12] = int(xing_frames).to_bytes(4, "big")
        out += hdr + bytes(body)
    return bytes(out)


def parse_id3_frames(content: bytes) -> dict:
    """Parse the leading ID3v2.3/2.4 tag's FRAMES (not just its size):
    each frame is a 4-char id + 4-byte size (SYNCSAFE in v2.4, plain
    big-endian in v2.3) + 2 flag bytes + payload; text frames ('T...')
    decode as an encoding byte (0 latin-1, 1 utf-16 w/ BOM, 3 utf-8)
    followed by the value, trailing NULs stripped. The walk stops at
    padding (a zero byte where a frame id should start) or the tag end,
    and every declared size is bounded by the tag — the same
    table-vs-backing-bytes discipline as the MP4 walk. Returns
    {'version', 'tag_bytes', 'frames': {id: text}, 'n_frames'}
    (non-text frames are counted but not decoded)."""
    data = bytes(content)
    _require(data[:3] == b"ID3" and len(data) >= 10, "no ID3v2 tag")
    version = data[3]
    _require(version in (3, 4), f"unsupported ID3v2.{version}")
    end = skip_id3v2(data)
    o = 10
    frames: dict[str, str] = {}
    n = 0
    while o + 10 <= end:
        fid = data[o : o + 4]
        if fid[0] == 0:  # padding
            break
        _require(
            all(65 <= b <= 90 or 48 <= b <= 57 for b in fid),
            "malformed frame id",
        )
        if version == 4:
            _require(
                all(b < 0x80 for b in data[o + 4 : o + 8]),
                "frame size not syncsafe",
            )
            size = (
                (data[o + 4] << 21)
                | (data[o + 5] << 14)
                | (data[o + 6] << 7)
                | data[o + 7]
            )
        else:
            size = int.from_bytes(data[o + 4 : o + 8], "big")
        _require(o + 10 + size <= end, "frame exceeds tag")
        payload = data[o + 10 : o + 10 + size]
        n += 1
        if fid[:1] == b"T" and size >= 1:
            enc = payload[0]
            body = payload[1:]
            if enc == 0:
                text = body.decode("latin-1")
            elif enc == 1:
                text = body.decode("utf-16")
            elif enc == 3:
                text = body.decode("utf-8")
            else:
                raise ValueError(f"unknown text encoding {enc}")
            frames[fid.decode("latin-1")] = text.rstrip("\x00")
        o += 10 + size
    return {
        "version": version,
        "tag_bytes": end,
        "frames": frames,
        "n_frames": n,
    }


def encode_id3(frames: dict[str, str], *, padding: int = 0) -> bytes:
    """Write an ID3v2.4 tag holding utf-8 text frames (syncsafe frame
    sizes) plus `padding` zero bytes — prepend to an encode_mp3 stream
    to drive parse_id3_frames without fixture files."""
    body = b""
    for fid, text in frames.items():
        payload = b"\x03" + text.encode("utf-8")
        _require(len(payload) < 1 << 28, "frame too large")
        body += fid.encode("latin-1") + bytes(
            [
                (len(payload) >> 21) & 0x7F,
                (len(payload) >> 14) & 0x7F,
                (len(payload) >> 7) & 0x7F,
                len(payload) & 0x7F,
            ]
        ) + b"\x00\x00" + payload
    body += b"\x00" * padding
    size = len(body)
    _require(size < 1 << 28, "tag too large")
    return b"ID3" + bytes([4, 0, 0]) + bytes(
        [
            (size >> 21) & 0x7F,
            (size >> 14) & 0x7F,
            (size >> 7) & 0x7F,
            size & 0x7F,
        ]
    ) + body
