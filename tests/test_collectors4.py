"""Edge cases for the registry-API collect family (collectors4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from purldb_spark.sources.collectors4 import (
    classify_download_content,
    fan_out_versions,
    map_npm_collect,
    npm_api_url,
)


def test_classify_download_content(spark):
    df = spark.createDataFrame(
        [
            ("a-1.tar.gz",),
            ("a-1.zip",),
            ("a-1.tbz",),
            ("a-1-py3-none-any.whl",),
            ("a-1.egg",),
            ("a-1.exe",),
        ],
        "url string",
    ).select(classify_download_content(F.col("url")).alias("c"))
    got = [r.c for r in df.collect()]
    # reference extension lists, collectors/pypi.py:85-95
    assert got == [
        "source_archive",
        "source_archive",
        "source_archive",
        "binary",
        "binary",
        None,
    ]


def test_fan_out_versions(spark):
    reqs = spark.createDataFrame(
        [
            ("pkg:pypi/a@1", "a", "1"),  # pinned: passes through
            ("pkg:pypi/b", "b", None),  # fans out over 2 versions
            ("pkg:pypi/c", "c", None),  # no versions known
        ],
        "purl string, name string, version string",
    )
    versions = spark.createDataFrame(
        [("b", "1"), ("b", "2")], "name string, version string"
    )
    rows = {
        (r.purl, r.version, r.status)
        for r in fan_out_versions(reqs, versions).collect()
    }
    assert rows == {
        ("pkg:pypi/a@1", "1", None),
        ("pkg:pypi/b", "1", None),
        ("pkg:pypi/b", "2", None),
        ("pkg:pypi/c", None, "no_versions"),
    }


def test_npm_api_url_scoped_unscoped(spark):
    df = spark.createDataFrame(
        [
            ("@org", "pkg", "1.0"),  # scoped: %2f separator, no version
            (None, "pkg", "1.0"),  # unscoped pinned: /version suffix
            (None, "pkg", None),  # unscoped unpinned: bare
        ],
        "ns string, name string, ver string",
    ).select(
        npm_api_url(F.col("ns"), F.col("name"), F.col("ver")).alias("u")
    )
    assert [r.u for r in df.collect()] == [
        "https://registry.npmjs.org/@org%2fpkg",
        "https://registry.npmjs.org/pkg/1.0",
        "https://registry.npmjs.org/pkg",
    ]


def test_npm_versionless_is_missing_version(spark):
    reqs = spark.createDataFrame(
        [("pkg:npm/left-pad", None, "left-pad", None)],
        "purl string, namespace string, name string, version string",
    )
    docs = spark.createDataFrame([], "name string, doc string")
    rows = map_npm_collect(reqs, docs).collect()
    # the reference silently returns on a versionless npm purl
    # (collectors/npm.py:100-103); the skip is surfaced as a status row
    assert [(r.purl, r.status) for r in rows] == [
        ("pkg:npm/left-pad", "missing_version")
    ]
