"""Edge cases for the VCS-tag / URL-builder collect family (collectors5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from purldb_spark.sources.collectors5 import (
    alpm_archive_url,
    conda_download_url,
    fetchcode_route_col,
    luarocks_download_url,
    match_dockerhub_tags,
    parse_bitbucket_tags,
)


def test_fetchcode_route_gates(spark):
    df = spark.createDataFrame(
        [
            ("pkg:openssl/openssl@3.0.0",),  # the one openssl route
            ("pkg:openssl/libcrypto@3.0.0",),  # wrong name: no route
            ("pkg:gnu/wget@1.21",),  # routes
            ("pkg:gnu/wget",),  # versionless: silently skipped
            ("pkg:generic/busybox@1.36",),  # in the supported list
            ("pkg:generic/leftpad@1.0",),  # not in the list
        ],
        "purl string",
    ).select(fetchcode_route_col(F.col("purl")).alias("r"))
    assert [r.r for r in df.collect()] == [
        "fetchcode",
        None,
        "fetchcode",
        "skipped_no_version",
        "fetchcode",
        None,
    ]


def test_purl2url_builders(spark):
    df = spark.createDataFrame([("LPeg", "Gvvaughan", "1.0.0")], "n string, ns string, v string")
    lua = df.select(
        luarocks_download_url(F.col("ns"), F.col("n"), F.col("v")).alias("u")
    ).collect()[0].u
    # purl2url lowercases the luarocks path
    assert lua == "https://luarocks.org/manifests/gvvaughan/lpeg-1.0.0.src.rock"
    conda = spark.createDataFrame(
        [("absl-py", "0.4.1", "py36h06a4308_0", "main", "linux-64", "tar.bz2"),
         ("absl-py", "0.4.1", None, "main", "linux-64", "tar.bz2")],
        "n string, v string, b string, c string, s string, t string",
    ).select(
        conda_download_url(
            F.col("n"), F.col("v"), F.col("b"), F.col("c"), F.col("s"), F.col("t")
        ).alias("u")
    ).collect()
    assert conda[0].u == (
        "https://repo.anaconda.com/pkgs/main/linux-64/"
        "absl-py-0.4.1-py36h06a4308_0.tar.bz2"
    )
    assert conda[1].u is None  # missing build qualifier -> no URL


def test_alpm_default_arch(spark):
    df = spark.createDataFrame([("zlib", "1.3-1", None)], "n string, v string, a string")
    url = df.select(
        alpm_archive_url(F.col("n"), F.col("v"), F.col("a")).alias("u")
    ).collect()[0].u
    assert url == (
        "https://archive.archlinux.org/packages/z/zlib/zlib-1.3-1-any.pkg.tar.zst"
    )


def test_bitbucket_size_zero_page_yields_nothing(spark):
    pages = spark.createDataFrame(
        [("t/r", '{"size":0,"values":[]}')], "subset_path string, doc string"
    )
    assert parse_bitbucket_tags(pages).collect() == []


def test_dockerhub_digest_vs_name_match(spark):
    reqs = spark.createDataFrame(
        [
            ("pkg:docker/nginx@1.25", None, "nginx", "1.25"),
            ("pkg:docker/nginx@sha256:abc", None, "nginx", "sha256:abc"),
            ("pkg:docker/x", None, None, None),  # nameless
        ],
        "purl string, namespace string, name string, version string",
    )
    tags = spark.createDataFrame(
        [("library", "nginx", "1.25", "sha256:abc"),
         ("library", "nginx", "1.24", "sha256:old")],
        "namespace string, name string, tag_name string, digest string",
    )
    rows = {(r.purl, r.status, r.version) for r in match_dockerhub_tags(reqs, tags).collect()}
    assert rows == {
        ("pkg:docker/nginx@1.25", "collected", "1.25"),
        ("pkg:docker/nginx@sha256:abc", "collected", "1.25"),
        ("pkg:docker/x", "missing_name", None),
    }
