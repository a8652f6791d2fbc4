"""Edge cases for the batch-8 miner mappers (alpm pkginfo parse,
freebsd line manifests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from purldb_spark.sources.miners8 import (
    map_alpm_docs,
    map_freebsd_docs,
    pkginfo_map_col,
)


def test_pkginfo_repeated_keys_accumulate_in_order(spark):
    doc = (
        "# comment\n"
        "pkgname = a\n"
        "license = GPL\n"
        "license = BSD\n"
        "depend = x\n"
        "depend = y\n"
        "pkgver = 1.0-2\n"
    )
    m = (
        spark.createDataFrame([(doc,)], ["d"])
        .select(pkginfo_map_col("d").alias("m"))
        .collect()[0]["m"]
    )
    # aliases applied (msys2.py:248-280), repeats in line order
    assert m["licenses"] == ["GPL", "BSD"]
    assert m["depends"] == ["x", "y"]
    assert m["version"] == ["1.0-2"]
    assert m["name"] == ["a"]


def test_alpm_missing_buildinfo_fields(spark):
    docs = spark.createDataFrame(
        [("pkgver = 1\npkgdesc = d\n", "format = 2\n", "p", "u")],
        "pkginfo string, buildinfo string, name string, download_url string",
    )
    r = map_alpm_docs(docs).collect()[0]
    assert r["maintainer_name"] is None
    assert r["sha256"] is None
    assert r["dependencies"] is None
    assert r["extracted_license_statement"] is None
    assert r["purl"] == "pkg:alpm/p@1"


def test_freebsd_license_logic_and_minimal_line(spark):
    site = (
        '{"name":"a","version":"1","licenselogic":"or",'
        '"licenses":["X","Y","Z"]}\n'
        "{\n"
        '{"nota":"pkg"}\n'
        '{"name":"b","version":"2"}\n'
    )
    docs = spark.createDataFrame([(site,)], ["packagesite"])
    rows = {r["name"]: r for r in map_freebsd_docs(docs).collect()}
    # nameless manifests dropped (freebsd.py:110)
    assert set(rows) == {"a", "b"}
    assert rows["a"]["extracted_license_statement"] == "X OR Y OR Z"
    # no arch/origin -> bare purl, no base url -> no download
    assert rows["b"]["purl"] == "pkg:freebsd/b@2"
    assert rows["b"]["download_url"] is None
