"""Container-layer walks (multimodal/mp4.py, mp3.py): literal-byte
goldens built with raw struct packing (independent of the encoders, so a
complementary encode/parse bug cannot hide), the chunk-run expansion and
sync-sample extraction, property-test roundtrips over the full variant
matrix (co64 / version-1 headers / multi-sample chunks / omitted stss;
ID3 / junk resync / Xing), the bomb guards, and the Spark faces' poison
contracts."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from purldb_spark.multimodal.mp3 import encode_mp3, walk_mp3
from purldb_spark.multimodal.mp4 import (
    encode_mp4,
    parse_mp4,
    resolve_samples,
    sample_bytes,
)


def _b(t: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + t + payload


def _fb(t: bytes, payload: bytes, version: int = 0) -> bytes:
    return _b(t, bytes([version, 0, 0, 0]) + payload)


def _hand_mp4() -> bytes:
    """A minimal MP4 packed field-by-field from the ISO 14496-12 layout,
    sharing no code with encode_mp4: two frames b'AAA' / b'BBBBB' in one
    chunk, 90 ms deltas at timescale 1000, stss marking only sample 2."""
    ftyp = _b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isomiso2")
    mdat = _b(b"mdat", b"AAABBBBB")
    base = len(ftyp) + 8  # 32
    mvhd = _fb(
        b"mvhd",
        struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", 1000, 180)  # timescale, duration
        + b"\x00" * (4 + 2 + 10 + 36 + 24 + 4),
    )
    tkhd = _fb(
        b"tkhd",
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", 180)
        + b"\x00" * (8 + 2 + 2 + 2 + 2 + 36)
        + struct.pack(">II", 64 << 16, 48 << 16),
    )
    mdhd = _fb(
        b"mdhd",
        struct.pack(">II", 0, 0) + struct.pack(">IIHH", 1000, 180, 0x55C4, 0),
    )
    hdlr = _fb(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 13)
    entry = _b(b"avc1", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70)
    stsd = _fb(b"stsd", struct.pack(">I", 1) + entry)
    stts = _fb(b"stts", struct.pack(">III", 1, 2, 90))
    stsc = _fb(b"stsc", struct.pack(">IIII", 1, 1, 2, 1))
    stsz = _fb(b"stsz", struct.pack(">IIII", 0, 2, 3, 5))
    stco = _fb(b"stco", struct.pack(">II", 1, base))
    stss = _fb(b"stss", struct.pack(">II", 1, 2))
    stbl = _b(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    minf = _b(b"minf", stbl)
    mdia = _b(b"mdia", mdhd + hdlr + minf)
    trak = _b(b"trak", tkhd + mdia)
    moov = _b(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def test_mp4_literal_bytes_golden():
    blob = _hand_mp4()
    d = parse_mp4(blob)
    assert d["brand"] == "isom"
    assert d["timescale"] == 1000 and d["duration_ms"] == 180
    t = d["tracks"][0]
    assert (t["kind"], t["codec"]) == ("vide", "avc1")
    assert (t["width"], t["height"]) == (64, 48)
    assert t["n_samples"] == 2 and t["n_chunks"] == 1
    # resolved offsets: chunk at 32, second sample right after the first
    assert t["samples"] == [(32, 3), (35, 5)]
    assert t["sync"] == [2]
    assert t["ts"] == [0, 90]
    assert sample_bytes(blob, t, 1) == b"AAA"
    assert sample_bytes(blob, t, 2) == b"BBBBB"


def test_mp4_size_zero_box_extends_to_end():
    # a trailing size-0 free box is legal: "extends to end of file"
    blob = _hand_mp4() + struct.pack(">I", 0) + b"free" + b"\x00" * 5
    assert parse_mp4(blob)["tracks"][0]["n_samples"] == 2


def test_resolve_samples_partial_runs():
    # 3 chunks: first two hold 2 samples, last holds 1 (classic stsc runs)
    samples = resolve_samples(
        [(1, 2, 1), (3, 1, 1)], [100, 200, 300], [5, 6, 7, 8, 9]
    )
    assert samples == [(100, 5), (105, 6), (200, 7), (207, 8), (300, 9)]


def test_resolve_samples_inconsistent_tables():
    with pytest.raises(ValueError):
        resolve_samples([(1, 3, 1)], [100], [5, 6])  # stsc past stsz
    with pytest.raises(ValueError):
        resolve_samples([(1, 1, 1)], [100], [5, 6])  # stsz past stsc
    with pytest.raises(ValueError):
        resolve_samples([(2, 1, 1), (1, 1, 1)], [100, 200], [5, 6])


@given(
    n=st.integers(1, 40),
    spc=st.integers(1, 7),
    g=st.integers(1, 6),
    co64=st.booleans(),
    v1=st.booleans(),
    delta=st.integers(1, 200),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_mp4_roundtrip_property(n, spc, g, co64, v1, delta, seed):
    payloads = [
        bytes(((seed + 37 * k + j) % 256) for j in range(1 + (seed + 5 * k) % 60))
        for k in range(n)
    ]
    blob = encode_mp4(
        320, 240, payloads, delta=delta, sync_every=g,
        samples_per_chunk=spc, use_co64=co64, v1=v1,
    )
    d = parse_mp4(blob)
    t = d["tracks"][0]
    assert d["duration_ms"] == n * delta
    assert t["n_samples"] == n
    assert t["n_chunks"] == -(-n // spc)
    assert t["sync"] == list(range(1, n + 1, g))
    assert t["ts"] == [delta * k for k in range(n)]
    assert [sample_bytes(blob, t, k + 1) for k in range(n)] == payloads


def test_mp4_bomb_guards():
    good = encode_mp4(16, 16, [b"abc", b"defg"], samples_per_chunk=2)
    # truncated header / box past extent / huge declared size
    for mut in (good[:6], good[:4] + b"\xff\xff\xff\xff" + good[8:]):
        with pytest.raises(ValueError):
            parse_mp4(mut)
    # stsz claiming more samples than the file has bytes
    i = good.index(b"stsz")
    bombed = bytearray(good)
    bombed[i + 12 : i + 16] = struct.pack(">I", 2**31)  # sample_count
    with pytest.raises(ValueError):
        parse_mp4(bytes(bombed))
    # stco offset pointing past EOF -> "sample outside file"
    i = good.index(b"stco")
    bombed = bytearray(good)
    bombed[i + 12 : i + 16] = struct.pack(">I", len(good) + 1000)
    with pytest.raises(ValueError):
        parse_mp4(bytes(bombed))
    # truncated largesize
    with pytest.raises(ValueError):
        parse_mp4(struct.pack(">I", 1) + b"ftyp" + b"\x00" * 4)


def _hand_mp3() -> bytes:
    # 128 kbps, 44100 Hz, mono, no CRC: FF FB 90 C0; 417-byte frames
    hdr = bytes([0xFF, 0xFB, 0x90, 0xC0])
    return hdr + b"\x11" * 413 + hdr + b"\x22" * 413


def test_mp3_literal_bytes_golden():
    d = walk_mp3(_hand_mp3())
    assert d["sample_rate"] == 44100 and d["bitrate_kbps"] == 128
    assert d["n_frames"] == 2 and d["audio_frames"] == 2
    assert not d["is_vbr"]
    assert d["duration_ms"] == 2 * 1152 * 1000 // 44100  # 52
    assert d["frames"] == [(0, 417), (417, 417)]
    assert d["id3_bytes"] == 0 and d["junk_bytes"] == 0


def test_mp3_id3_skip_and_resync():
    # syncsafe 200 = [0, 0, 1, 72]; then 3 junk zero bytes before sync
    tag = b"ID3" + bytes([4, 0, 0, 0, 0, 1, 72]) + b"\x00" * 200
    d = walk_mp3(tag + b"\x00" * 3 + _hand_mp3())
    assert d["id3_bytes"] == 210 and d["junk_bytes"] == 3
    assert d["n_frames"] == 2
    assert d["frames"][0] == (213, 417)


def test_mp3_xing_vbr_golden():
    # Xing at mono side-info offset 21 inside the first frame
    body = bytearray(b"\x00" * 413)
    body[17:21] = b"Xing"
    body[21:25] = (1).to_bytes(4, "big")  # flags: frames present
    body[25:29] = (57).to_bytes(4, "big")
    hdr = bytes([0xFF, 0xFB, 0x90, 0xC0])
    d = walk_mp3(hdr + bytes(body) + hdr + b"\x00" * 413)
    assert d["is_vbr"] and d["audio_frames"] == 57 and d["n_frames"] == 2
    assert d["duration_ms"] == 57 * 1152 * 1000 // 44100


def test_mp3_poison():
    good = _hand_mp3()
    for mut in (
        b"",
        b"\x00" * 100,  # no sync in window
        good[:-3],  # truncated final frame
        good[:2] + bytes([0xF0]) + good[3:],  # reserved bitrate index
        good[:2] + bytes([0x9C]) + good[3:],  # reserved sample-rate index
        b"ID3" + bytes([4, 0, 0, 0x80, 0, 0, 0]),  # non-syncsafe size
    ):
        with pytest.raises(ValueError):
            walk_mp3(mut)
    # MPEG-2 (version bits 10) is a boundary, not a crash
    v2 = bytes([0xFF, 0xF3]) + good[2:]
    with pytest.raises(ValueError):
        walk_mp3(v2)


@given(
    kbps=st.sampled_from([32, 48, 64, 96, 128, 160, 192, 224]),
    sr=st.sampled_from([44100, 48000, 32000]),
    n=st.integers(1, 40),
    id3=st.one_of(st.none(), st.integers(0, 300)),
    junk=st.integers(0, 10),
    vbr=st.booleans(),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=60, deadline=None)
def test_mp3_roundtrip_property(kbps, sr, n, id3, junk, vbr, seed):
    xing = (n * 3 + 1) if vbr else None
    blob = encode_mp3(
        kbps, sr, n, lambda k: seed + 13 * k,
        id3_payload=id3, junk=junk, xing_frames=xing,
    )
    d = walk_mp3(blob)
    fb = 144000 * kbps // sr
    assert d["sample_rate"] == sr and d["bitrate_kbps"] == kbps
    assert d["n_frames"] == n
    af = xing if vbr else n
    assert d["audio_frames"] == af
    assert d["duration_ms"] == af * 1152 * 1000 // sr
    assert d["id3_bytes"] == (0 if id3 is None else 10 + id3)
    assert d["junk_bytes"] == junk
    assert d["stream_bytes"] == n * fb
    start = d["id3_bytes"] + junk
    assert d["frames"] == [(start + i * fb, fb) for i in range(n)]


def test_mp4_faces_poison_contract(spark):
    from purldb_spark.multimodal.containers import (
        mp3_meta_stats,
        mp4_meta_stats,
        mp4_sync_frames,
    )

    good = encode_mp4(
        16, 8, [b"aa", b"bbb", b"cccc"], delta=10, sync_every=2,
        samples_per_chunk=2,
    )
    mp3_good = encode_mp3(64, 32000, 3, lambda k: k)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a container"))],
        "media_id long, content binary",
    )
    meta = {r["media_id"]: r.asDict() for r in mp4_meta_stats(df).collect()}
    assert meta[1]["brand"] == "isom" and meta[1]["n_samples"] == 3
    assert meta[1]["n_sync"] == 2 and meta[1]["n_chunks"] == 2
    assert meta[1]["duration_ms"] == 30 and meta[1]["sample_bytes"] == 9
    assert meta[2]["width"] == -1 and meta[2]["brand"] == ""

    frames = sorted(
        (r["media_id"], r["sample_no"], r["ts_ms"], r["n_bytes"], r["byte_sum"])
        for r in mp4_sync_frames(df).collect()
    )
    assert frames == [
        (1, 1, 0, 2, 2 * ord("a")),
        (1, 3, 20, 4, 4 * ord("c")),
        (2, -1, 0, 0, 0),
    ]

    df3 = spark.createDataFrame(
        [(1, bytearray(mp3_good)), (2, bytearray(b"\x00" * 64))],
        "media_id long, content binary",
    )
    m3 = {r["media_id"]: r.asDict() for r in mp3_meta_stats(df3).collect()}
    assert m3[1]["n_frames"] == 3 and m3[1]["sample_rate"] == 32000
    assert m3[1]["duration_ms"] == 3 * 1152 * 1000 // 32000
    assert m3[2]["sample_rate"] == -1


def test_caption_track_roundtrip():
    from purldb_spark.multimodal.mp4 import parse_tx3g

    caps = ["hello world", "second", "ünïcode ok"]
    blob = encode_mp4(
        64, 48, [b"AAA", b"BB"], delta=30, captions=caps, caption_delta=45
    )
    d = parse_mp4(blob)
    kinds = [t["kind"] for t in d["tracks"]]
    assert kinds == ["vide", "text"]
    t = d["tracks"][1]
    assert t["codec"] == "tx3g" and t["n_samples"] == 3
    assert t["ts"] == [0, 45, 90] and t["duration"] == 135
    assert [parse_tx3g(sample_bytes(blob, t, k + 1)) for k in range(3)] == caps
    # video samples keep their offsets despite captions in the same mdat
    v = d["tracks"][0]
    assert sample_bytes(blob, v, 1) == b"AAA"
    assert sample_bytes(blob, v, 2) == b"BB"
    # tx3g poison: declared length exceeding the sample
    with pytest.raises(ValueError):
        parse_tx3g(b"\x00\xff")


def test_text_face_rows_and_sentinel(spark):
    from purldb_spark.multimodal.containers import mp4_text_samples

    with_caps = encode_mp4(
        8, 8, [b"x"], captions=["a", "bc"], caption_delta=100
    )
    no_caps = encode_mp4(8, 8, [b"x"])
    df = spark.createDataFrame(
        [
            (1, bytearray(with_caps)),
            (2, bytearray(no_caps)),
            (3, bytearray(b"torn")),
        ],
        "media_id long, content binary",
    )
    rows = sorted(
        (r.media_id, r.caption_idx, r.ts_ms, r.end_ts_ms, r.text)
        for r in mp4_text_samples(df).collect()
    )
    # media 2 (no text track) contributes NOTHING; media 3 one sentinel
    assert rows == [
        (1, 1, 0, 100, "a"),
        (1, 2, 100, 200, "bc"),
        (3, -1, 0, 0, ""),
    ]


def test_id3_frames_golden_v24_and_v23():
    from purldb_spark.multimodal.mp3 import encode_id3, parse_id3_frames

    tag = encode_id3(
        {"TIT2": "My Title", "TPE1": "Ärtist", "TALB": "Album X"}, padding=7
    )
    d = parse_id3_frames(tag)
    assert d["version"] == 4 and d["n_frames"] == 3
    assert d["frames"] == {
        "TIT2": "My Title", "TPE1": "Ärtist", "TALB": "Album X",
    }
    assert d["tag_bytes"] == len(tag)
    # hand-packed v2.3: plain big-endian frame size, latin-1, utf-16
    f1 = b"TIT2" + struct.pack(">I", 6) + b"\x00\x00" + b"\x00Hello"
    u16 = "Wörld".encode("utf-16")
    f2 = b"TPE1" + struct.pack(">I", 1 + len(u16)) + b"\x00\x00" + b"\x01" + u16
    body = f1 + f2
    hdr = b"ID3" + bytes([3, 0, 0]) + bytes(
        [
            (len(body) >> 21) & 0x7F,
            (len(body) >> 14) & 0x7F,
            (len(body) >> 7) & 0x7F,
            len(body) & 0x7F,
        ]
    )
    d23 = parse_id3_frames(hdr + body)
    assert d23["version"] == 3
    assert d23["frames"] == {"TIT2": "Hello", "TPE1": "Wörld"}


def test_id3_frames_poison():
    from purldb_spark.multimodal.mp3 import encode_id3, parse_id3_frames

    good = encode_id3({"TIT2": "x"})
    for mut in (
        b"",
        b"no tag here" + good,  # tag must lead
        good[:3] + bytes([2]) + good[4:],  # unsupported ID3v2.2
        # frame declaring more bytes than the tag holds
        good[:10] + b"TIT2" + struct.pack(">I", 0x7F) + b"\x00\x00",
    ):
        with pytest.raises(ValueError):
            parse_id3_frames(mut)


def test_mp3_tag_face_sentinel(spark):
    from purldb_spark.multimodal.containers import mp3_tag_stats
    from purldb_spark.multimodal.mp3 import encode_id3, encode_mp3

    ok = encode_id3({"TIT2": "T", "TPE1": "A"}) + encode_mp3(
        32, 32000, 1, lambda k: 0
    )
    df = spark.createDataFrame(
        [(1, bytearray(ok)), (2, bytearray(b"\xff\xfbno tag"))],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in mp3_tag_stats(df).collect()}
    assert rows[1].tag_version == 4 and rows[1].title == "T"
    assert rows[1].album is None
    assert rows[2].tag_version == -1


def test_fmp4_roundtrip_and_uniform_branch():
    from purldb_spark.multimodal.mp4 import encode_fmp4, parse_fmp4

    frags = [[b"AA", b"BBBB", b"C"], [b"DDD"], [b"EE", b"FFF"]]
    blob = encode_fmp4(320, 240, frags, delta=25)
    d = parse_fmp4(blob)
    assert d["brand"] == "iso5" and d["track_id"] == 1
    assert [f["seq"] for f in d["fragments"]] == [1, 2, 3]
    # tfdt base times accumulate samples x delta across fragments
    assert [f["base_ts"] for f in d["fragments"]] == [0, 75, 100]
    got = [
        bytes(blob[o : o + s])
        for f in d["fragments"]
        for (o, s, t) in f["samples"]
    ]
    assert got == [p for f in frags for p in f]
    ts = [t for f in d["fragments"] for (o, s, t) in f["samples"]]
    assert ts == [0, 25, 50, 75, 100, 125]
    # default-sample-size branch: tfhd default, trun omits sizes
    u = [[b"XX", b"YY"], [b"ZZZ", b"WWW", b"VVV"]]
    ub = encode_fmp4(64, 64, u, delta=10, uniform_size=True)
    du_ = parse_fmp4(ub)
    got = [
        bytes(ub[o : o + s])
        for f in du_["fragments"]
        for (o, s, t) in f["samples"]
    ]
    assert got == [p for f in u for p in f]


@given(
    nf=st.integers(1, 6),
    m=st.integers(1, 8),
    delta=st.integers(1, 100),
    uniform=st.booleans(),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_fmp4_roundtrip_property(nf, m, delta, uniform, seed):
    from purldb_spark.multimodal.mp4 import encode_fmp4, parse_fmp4

    frags = []
    for f in range(nf):
        if uniform:
            sz = (seed + 9 * f) % 48 + 6
            frags.append(
                [bytes(((seed + 7 * s + j) % 256) for j in range(sz))
                 for s in range(m)]
            )
        else:
            frags.append(
                [bytes(((seed + 7 * s + j) % 256)
                       for j in range((seed + 9 * f + 5 * s) % 48 + 6))
                 for s in range(m)]
            )
    blob = encode_fmp4(128, 96, frags, delta=delta, uniform_size=uniform)
    d = parse_fmp4(blob)
    assert len(d["fragments"]) == nf
    for fi, f in enumerate(d["fragments"]):
        assert f["seq"] == fi + 1
        assert f["base_ts"] == fi * m * delta
        assert [bytes(blob[o : o + s]) for o, s, _ in f["samples"]] == frags[fi]
        assert [t for _, _, t in f["samples"]] == [
            fi * m * delta + k * delta for k in range(m)
        ]


def test_fmp4_poison_and_bombs():
    from purldb_spark.multimodal.mp4 import encode_fmp4, parse_fmp4

    good = encode_fmp4(16, 16, [[b"abc", b"de"]])
    for mut in (
        b"",
        good[:40],
        good.replace(b"mvex", b"zvex"),  # non-fragmented init
        good.replace(b"trun", b"zrun"),
        good.replace(b"mfhd", b"zfhd"),
    ):
        with pytest.raises(ValueError):
            parse_fmp4(mut)
    # trun sample_count bomb
    i = good.index(b"trun")
    bombed = bytearray(good)
    bombed[i + 8 : i + 12] = struct.pack(">I", 2**30)
    with pytest.raises(ValueError):
        parse_fmp4(bytes(bombed))


def test_mp4_audio_track_roundtrip(spark):
    from purldb_spark.multimodal.containers import mp4_audio_stats
    from purldb_spark.multimodal.mp4 import encode_mp4, parse_mp4, sample_bytes

    aud = [bytes([10 + k] * (30 + k)) for k in range(4)]
    blob = encode_mp4(
        32, 16, [b"VID1", b"VID22"], delta=40,
        captions=["c0"], caption_delta=70,
        audio_payloads=aud, audio_rate=16000,
        audio_channels=2, audio_delta=512,
    )
    d = parse_mp4(blob)
    assert [t["kind"] for t in d["tracks"]] == ["vide", "text", "soun"]
    a = d["tracks"][2]
    assert a["codec"] == "mp4a"
    assert (a["audio_channels"], a["audio_rate"]) == (2, 16000)
    # audio media timescale is the sample rate; stts deltas accumulate
    assert a["timescale"] == 16000 and a["ts"] == [0, 512, 1024, 1536]
    assert [sample_bytes(blob, a, k + 1) for k in range(4)] == aud
    # video fields don't leak audio entry fields
    assert d["tracks"][0]["audio_channels"] is None

    df = spark.createDataFrame(
        [(1, bytearray(blob)),
         (2, bytearray(encode_mp4(8, 8, [b"v"]))),   # no audio track
         (3, bytearray(b"torn"))],
        "media_id long, content binary",
    )
    rows = {r.media_id: r for r in mp4_audio_stats(df).collect()}
    assert rows[1].channels == 2 and rows[1].sample_rate == 16000
    assert rows[1].n_samples == 4
    assert rows[1].duration_ms == 4 * 512 * 1000 // 16000
    assert 2 not in rows            # absence is a fact, not poison
    assert rows[3].channels == -1   # torn -> sentinel
