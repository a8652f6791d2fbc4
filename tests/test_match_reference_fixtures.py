"""Match-engine parity over the reference's OWN directory-matching
fixtures (matchcode/tests/testfiles/models/directory-matching/): both
async releases are indexed (as the reference's test setUp does), then
the async-0.2.9 scan is matched with the reference's gates (±5%
element count, hamming distance < 10). Expected decisions from the
reference's expected files:

- 'package' matches pkg:npm/async@0.2.9 — its own indexed fingerprint
  at distance 0; the 0.2.10 fingerprint stays OVER the threshold
  (2 of 5 content elements differ), so no cross-version match;
- 'package/lib' (a single-file directory) is never fingerprinted at
  all — the toolkit's >= 2 descendant-files gate — so it matches
  nothing on either side.

The content fingerprints here are bit-exact with matchcode-toolkit
(tests/test_halohash_reference_exact.py), so the distances this test
computes are the reference's own.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from purldb_spark.functions.halohash import (
    byte_hamming_distance,
    directory_fingerprints,
)

_DIR = "/root/reference/matchcode/tests/testfiles/models/directory-matching"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_DIR), reason="reference checkout not available"
)


def _files_df(spark, scan_name, purl):
    with open(os.path.join(_DIR, scan_name)) as fh:
        scan = json.load(fh)
    rows = [
        (purl, f["path"], f.get("sha1"), f.get("size") or 0)
        for f in scan["files"]
        if f.get("type") == "file"
    ]
    return spark.createDataFrame(
        rows, "purl string, path string, sha1 string, size long"
    )


def test_directory_content_match_decisions(spark):
    idx_files = _files_df(
        spark, "async-0.2.10.tgz-i.json", "pkg:npm/async@0.2.10"
    ).unionByName(_files_df(spark, "async-0.2.9-i.json", "pkg:npm/async@0.2.9"))
    idx = directory_fingerprints(
        idx_files, extra_group_cols=["purl"], kind="content"
    ).select(
        F.col("purl").alias("i_purl"),
        F.col("directory").alias("i_dir"),
        F.col("bah128").alias("i_fp"),
        F.col("elements_count").alias("i_n"),
    )
    q = directory_fingerprints(
        _files_df(spark, "async-0.2.9-i.json", "q"), kind="content"
    ).select(
        F.col("directory").alias("q_dir"),
        F.col("bah128").alias("q_fp"),
        F.col("elements_count").alias("q_n"),
    )
    # the single-file package/lib directory is never fingerprinted
    assert {r.q_dir for r in q.collect()} == {"package"}

    pairs = q.crossJoin(idx).select(
        "q_dir",
        "i_purl",
        byte_hamming_distance(F.col("q_fp"), F.col("i_fp")).alias("hd"),
        F.col("i_n").between(
            F.floor(F.col("q_n") * 0.95), F.floor(F.col("q_n") * 1.05)
        ).alias("in_range"),
    ).collect()
    matches = {
        (r.q_dir, r.i_purl) for r in pairs if r.in_range and r.hd < 10
    }
    # reference expected: package matched to async@0.2.9 (its own index
    # entry, distance 0); the cross-version distance exceeds threshold
    assert matches == {("package", "pkg:npm/async@0.2.9")}
    cross = [r.hd for r in pairs if r.i_purl == "pkg:npm/async@0.2.10"]
    assert cross and min(cross) >= 10
