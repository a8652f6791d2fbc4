"""Edge cases for the batch-9 miner mappers."""

from __future__ import annotations

from purldb_spark.sources.miners9 import (
    map_freedesktop_pages,
    map_googlecode_v1_docs,
    map_gstreamer_urls,
    map_openssl_listing,
    map_openwrt_docs,
)


def test_openwrt_minimal_control(spark):
    docs = spark.createDataFrame(
        [("Package: busybox\nVersion: 1.36\n",)], ["control"]
    )
    r = map_openwrt_docs(docs).collect()[0]
    assert r["purl"] == "pkg:openwrt/busybox@1.36"
    assert r["dependencies"] is None
    assert r["keywords"] is None
    assert r["maintainer_name"] is None


def test_gstreamer_dashless_dropped_and_version_keeps_ext(spark):
    docs = spark.createDataFrame(
        [
            ("https://gstreamer.freedesktop.org/src/gst-openmax-0.10.0.4.tar.bz2",),
            ("https://gstreamer.freedesktop.org/src/tarball.tar.gz",),
        ],
        ["uri"],
    )
    rows = map_gstreamer_urls(docs).collect()
    assert len(rows) == 1
    # the reference rpartitions the FULL file name: the version keeps the
    # extension (gstreamer.py:100-101)
    assert rows[0]["name"] == "gst-openmax"
    assert rows[0]["version"] == "0.10.0.4.tar.bz2"


def test_freedesktop_no_links(spark):
    docs = spark.createDataFrame(
        [("<html><h1>X</h1></html>", "https://fd.org/wiki/X/", "pkg:freedesktop/x")],
        "html string, uri string, package_url string",
    )
    r = map_freedesktop_pages(docs).collect()[0]
    assert r["description"] == "X"
    assert r["download_url"] is None
    assert r["vcs_url"] is None
    assert r["version"] is None


def test_googlecode_v1_nameless_dropped(spark):
    docs = spark.createDataFrame(
        [('{"description":"no name"}',), ('{"name":"p","labels":null}',)], ["doc"]
    )
    rows = map_googlecode_v1_docs(docs).collect()
    assert len(rows) == 1
    # the reference iterates labels unguarded and would crash on null —
    # treated as no keywords here (googlecode.py:265-268)
    assert rows[0]["keywords"] is None


def test_openssl_checksum_suffix_strip(spark):
    docs = spark.createDataFrame(
        [("https://ftp.openssl.org/source/openssl-1.0.2a.tar.gz.sha256", 42, "d")],
        "uri string, size long, last_modified_date string",
    )
    r = map_openssl_listing(docs).collect()[0]
    assert r["version"] == "1.0.2a"
    assert r["name"] == "openssl-1.0.2a.tar.gz.sha256"
    assert r["type"] == "generic"
