"""BAH128 bit-average halohash — Spark aggregation vs an independent
pure-Python implementation (per-element md5 digests; bit SET when
strictly FEWER than half the elements carry it, ties -> 0 — the
toolkit polarity, verified bit-exactly against the reference's
serialized directory_content fingerprints in
tests/test_halohash_reference_exact.py), plus the chunk-splitting
vector mirrored from matchcode/tests/test_models.py:420-431.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from purldb_spark.functions.fingerprints import CHUNK_COLS, split_fingerprint
from purldb_spark.functions.halohash import (
    bah128_fingerprint,
    byte_hamming_distance,
)


def bah128_py(elements: list[str]) -> tuple[int, str]:
    """Reference implementation: column-sum of md5 bits; bit = 1 when
    strictly fewer than half the elements carry it (ties -> 0)."""
    counts = [0] * 128
    for el in elements:
        digest = hashlib.md5(el.encode("utf-8")).digest()
        for j, byte in enumerate(digest):
            for k in range(8):
                counts[8 * j + k] += (byte >> (7 - k)) & 1
    n = len(elements)
    out = bytearray(16)
    for p, c in enumerate(counts):
        if c * 2 < n:
            out[p // 8] |= 1 << (7 - p % 8)
    return n, out.hex()


def _spark_bah(spark, groups: dict[str, list[str]]) -> dict[str, tuple[int, str]]:
    rows = [(g, el) for g, els in groups.items() for el in els]
    df = spark.createDataFrame(rows, ["g", "el"])
    got = bah128_fingerprint(df, ["g"], "el").collect()
    return {r["g"]: (r["elements_count"], r["bah128"], r["fingerprint"]) for r in got}


def test_single_element_is_md5_complement(spark):
    """With one element every 1-bit column ties-or-majorities to 0 and
    every 0-bit column sets the output bit: bah128 == NOT(md5(element)).
    This pins the bit order (MSB-first per byte) and polarity end to
    end — the same relation the reference fixtures exhibit."""
    out = _spark_bah(spark, {"a": ["hello world"]})
    n, bah, fp = out["a"]
    assert n == 1
    expected = bytes(b ^ 0xFF for b in hashlib.md5(b"hello world").digest()).hex()
    assert bah == expected
    assert fp == "00000001" + bah


def test_matches_python_reference(spark):
    groups = {
        "one": ["x"],
        "pair": ["alpha", "beta"],
        "many": [f"element-{i}" for i in range(57)],
        "dup": ["same", "same", "same", "other"],
        "utf8": ["naïve", "héllo", "wörld"],
    }
    got = _spark_bah(spark, groups)
    for g, els in groups.items():
        n, bah = bah128_py(els)
        assert got[g][0] == n, g
        assert got[g][1] == bah, g
        assert got[g][2] == f"{n:08x}" + bah, g


def test_chunks_roundtrip(spark):
    """create_halohash_chunks vector (matchcode/tests/test_models.py:420-431):
    '49280e141724c001e1080128621a4210' splits into the four 8-hex chunks."""
    fp = "0000002a" + "49280e141724c001e1080128621a4210"
    df = spark.createDataFrame([(fp,)], ["fp"])
    row = split_fingerprint(df, "fp").collect()[0]
    assert row["element_count"] == 0x2A
    expected = ["49280e14", "1724c001", "e1080128", "621a4210"]
    for name, hexpart in zip(CHUNK_COLS, expected):
        assert row[name] == int(hexpart, 16)


def test_directory_fingerprints_match_python(spark):
    """Computed directory content fingerprints over the scan fixture equal
    the independent python implementation run on the same descendant sets."""
    import json
    import os
    from collections import defaultdict

    from purldb_spark.sources.scan_json import compute_dir_index_from_scan, read_scan

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "scan1.json")
    files = read_scan(spark, fixture)
    got = {
        (r["package_uid"], r["directory"]): (r["elements_count"], r["bah128"])
        for r in compute_dir_index_from_scan(files, "content").collect()
    }

    with open(fixture) as fh:
        raw = fh.read()
    docs = json.loads(raw) if raw.lstrip().startswith("[") else [json.loads(raw)]
    expected_elements = defaultdict(list)
    file_counts = defaultdict(int)
    for doc in docs:
        for f in doc["files"]:
            if f.get("type") != "file":
                continue
            parts = f["path"].split("/")
            for d in range(1, len(parts)):
                key = (doc["package_uid"], "/".join(parts[:d]))
                file_counts[key] += 1
                if f.get("sha1"):
                    expected_elements[key].append(f["sha1"])
    # the toolkit skips directories with < 2 descendant files
    expected_elements = {
        k: v for k, v in expected_elements.items() if file_counts[k] >= 2
    }
    assert got.keys() == expected_elements.keys()
    for key, els in expected_elements.items():
        assert got[key] == bah128_py(els), key


def test_byte_hamming_distance(spark):
    a = "0" * 32
    b = "f" * 32
    c = "8" + "0" * 31
    df = spark.createDataFrame([(a, b), (a, c), (b, b)], ["x", "y"])
    got = [
        r["hd"]
        for r in df.select(
            byte_hamming_distance(F.col("x"), F.col("y")).alias("hd")
        ).collect()
    ]
    assert got == [128, 1, 0]
