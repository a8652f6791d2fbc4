"""Golden test for the real Maven Nexus java-serialized index decoder
(sources/gzip_index.py decode_nexus_* — wire format per
minecode/pipes/maven.py:391-528).  The encoder below writes the actual
format: version byte + ms-epoch long header, then per entry an int32
field count and [flag byte][2-byte-len mUTF-8 name][int32-len mUTF-8
value] fields, gzipped with trailing garbage appended."""

from __future__ import annotations

import gzip
import struct

from purldb_spark.sources.gzip_index import (
    _GunzipReader,
    build_nexus_artifact,
    decode_modified_utf8,
    decode_nexus_entries,
    read_nexus_index,
)
from purldb_spark.sources.miners import map_maven_artifacts


def _mutf8(s: str) -> bytes:
    """Encode Java modified UTF-8: NUL -> C0 80, astral -> CESU-8 pair."""
    out = bytearray()
    for ch in s:
        cp = ord(ch)
        if cp == 0:
            out += b"\xc0\x80"
        elif cp >= 0x10000:
            cp -= 0x10000
            for sur in (0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF)):
                out += chr(sur).encode("utf-8", "surrogatepass")
        else:
            out += ch.encode("utf-8")
    return bytes(out)


def _field(name: str, value: str) -> bytes:
    nb, vb = _mutf8(name), _mutf8(value)
    return b"\x05" + struct.pack(">H", len(nb)) + nb + struct.pack(">i", len(vb)) + vb


def _entry(fields: dict[str, str]) -> bytes:
    return struct.pack(">i", len(fields)) + b"".join(
        _field(k, v) for k, v in fields.items()
    )


def _index(entries: list[dict[str, str]], version: int = 1) -> bytes:
    payload = struct.pack(">bq", version, 1718000000000) + b"".join(
        _entry(e) for e in entries
    )
    return gzip.compress(payload)


ENTRIES = [
    # full jar artifact: NA classifier, 7-field INFO carrying the extension
    {
        "u": "org.apache|commons-io|2.11.0|NA|jar",
        "i": "jar|1709000000000|1024|1|0|1|jar",
        "1": "356a192b7913b04c54574d18c28d46e6395428ab",
        "n": "Commons IO",
        "d": "IO \N{GRINNING FACE} utils\x00end",  # astral char + embedded NUL
    },
    # sources classifier, 6-field INFO -> extension falls back (classifier set)
    {
        "u": "org.apache|commons-io|2.11.0|sources",
        "i": "jar|0|notdigits|0|1|0",
        "unindexed-field": "dropped by the fields filter",
    },
    # pom packaging, no classifier, 6-field INFO -> extension = packaging
    {"u": "com.example|demo|1.0.0|NA", "i": "pom|1709000000001|55|0|0|0"},
    # null packaging, no INFO at all
    {"u": "com.example|demo|1.0.0|NA|war"},
    # del record without u -> skipped
    {"m": "1709000000002"},
]


def test_mutf8_roundtrip():
    s = "a\x00b\N{GRINNING FACE}cé"
    assert decode_modified_utf8(_mutf8(s)) == s


def test_decode_entries_and_artifacts():
    blob = _index(ENTRIES) + b"#### trailing garbage, not gzip ####"
    entries = list(decode_nexus_entries(_GunzipReader(blob)))
    assert len(entries) == 5
    assert entries[0]["d"] == "IO \N{GRINNING FACE} utils\x00end"
    assert "unindexed-field" not in entries[1]

    arts = [build_nexus_artifact(e) for e in entries]
    assert arts[4] is None  # no UINFO
    a0, a1, a2, a3 = arts[:4]
    assert (a0.group_id, a0.classifier, a0.extension) == ("org.apache", None, "jar")
    assert a0.size == 1024 and a0.sha1.startswith("356a")
    assert a0.last_modified.startswith("2024-02-27") and a0.src_exist and a0.sig_exist
    assert a1.classifier == "sources" and a1.extension == "jar"  # fallback path
    assert a1.size is None and a1.last_modified is None  # non-digit size, lm=0
    assert a2.extension == "pom" and a2.packaging == "pom"
    assert a3.packaging is None and a3.extension == "war" and not a3.src_exist


def test_concatenated_members_and_bad_version():
    # one DataInput payload split across two gzip members: members are a
    # transport detail (gzip.GzipFile reads them as one stream)
    payload = gzip.decompress(_index([ENTRIES[0], ENTRIES[2]]))
    cut = len(payload) // 2
    two = gzip.compress(payload[:cut]) + gzip.compress(payload[cut:])
    got = list(decode_nexus_entries(_GunzipReader(two)))
    assert [e["u"].split("|")[1] for e in got] == ["commons-io", "demo"]
    assert list(decode_nexus_entries(_GunzipReader(_index(ENTRIES, version=2)))) == []


def test_read_nexus_index_feeds_maven_mapper(spark, tmp_path):
    (tmp_path / "nexus.gz").write_bytes(_index(ENTRIES) + b"trailing")
    arts = read_nexus_index(spark, str(tmp_path / "nexus.gz"))
    assert arts.count() == 4
    worthy = read_nexus_index(spark, str(tmp_path / "nexus.gz"), worthy_only=True)
    rows = map_maven_artifacts(
        worthy.select(
            "group_id", "artifact_id", "version", "extension", "classifier",
            "sha1", "size",
        )
    ).collect()
    # two worthy artifacts (jar|None|jar and jar|sources|jar), each ->
    # artifact row + pom row
    assert len(rows) == 4
    purls = sorted(r.purl for r in rows if r.uri_kind == "artifact")
    assert purls == [
        "pkg:maven/org.apache/commons-io@2.11.0",
        "pkg:maven/org.apache/commons-io@2.11.0?classifier=sources",
    ]
    plain = next(r for r in rows if r.purl == purls[0] and r.uri_kind == "artifact")
    assert plain.download_url.endswith(
        "org/apache/commons-io/2.11.0/commons-io-2.11.0.jar"
    )
    assert all(r.mining_level == 20 for r in rows if r.uri_kind == "pom")


def _reference_entry_parity(gz_path, expected_path):
    import gzip as _unused  # noqa: F401
    import json

    from purldb_spark.sources.gzip_index import (
        _GunzipReader,
        decode_nexus_entries,
    )

    with open(expected_path) as fh:
        expected = json.load(fh)
    fields = frozenset({k for e in expected for k in e})
    with open(gz_path, "rb") as fh:
        blob = fh.read()
    got = list(decode_nexus_entries(_GunzipReader(blob), fields))

    def demojibake(v):
        # the reference's decoder leaves multi-byte UTF-8 as one char per
        # byte ('centralbyrÃ¥n'); ours decodes modified-UTF-8 per spec
        # ('centralbyrån') — normalize the expected to the correct form
        try:
            return v.encode("latin-1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return v

    want = [{k: demojibake(v) for k, v in e.items()} for e in expected]
    assert got == want


def test_reference_increment_index_entry_parity():
    """Decode the reference's OWN incremental nexus index chunk (1894
    entries, real repo1 data incl. OSGi manifest fields) and compare with
    its expected_entries.json byte-for-byte."""
    base = "/root/reference/minecode/tests/testfiles/maven/index/increment"
    import os

    if not os.path.isdir(base):
        import pytest

        pytest.skip("reference checkout not available")
    _reference_entry_parity(
        f"{base}/nexus-maven-repository-index.445.gz",
        f"{base}/expected_entries.json",
    )


def test_reference_buggy_index_entry_parity():
    """The 'buggy' fixture exercises malformed trailing data — the decoder
    must keep every well-formed entry and drop the rest exactly like the
    reference."""
    base = "/root/reference/minecode/tests/testfiles/maven/index/buggy"
    import os

    if not os.path.isdir(base):
        import pytest

        pytest.skip("reference checkout not available")
    _reference_entry_parity(
        f"{base}/nexus-maven-repository-index.gz",
        f"{base}/expected_entries.json",
    )


def test_reference_properties_chain_parity(spark):
    """The incremental-chain properties fixture -> 30 chunk URIs in
    ascending chunk order, matching the reference's expected list."""
    import json
    import os

    from purldb_spark.sources.gzip_index import nexus_incremental_chunk_uris

    base = "/root/reference/minecode/tests/testfiles/maven/index/increment"
    if not os.path.isdir(base):
        import pytest

        pytest.skip("reference checkout not available")
    text = open(f"{base}/nexus-maven-repository-index.properties").read()
    src = (
        "https://repo1.maven.org/maven2/.index/"
        "nexus-maven-repository-index.properties"
    )
    rows = nexus_incremental_chunk_uris(
        spark.createDataFrame([(text, src)], "text string, source_uri string")
    ).collect()
    expected = json.load(open(f"{base}/expected_properties_uris.json"))
    assert [r.uri for r in rows] == [e["uri"] for e in expected]
