"""Edge cases for the rpm repodata mappers beyond the fixture query:
EVR epoch/release branches, download_url branches, repomd href lookup,
version-attr merge precedence, and the seed-listing filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from purldb_spark.sources.rpm_repodata import (
    map_repomd_packages,
    parse_primary,
    repomd_urls_from_listing,
)

_PRIMARY = (
    '<metadata xmlns="x" packages="2">'
    '<package type="rpm"><name>a</name><arch>src</arch>'
    '<checksum type="sha256" pkgid="YES">id-a</checksum>'
    '<location href="https://abs.ex/a.rpm"/>'
    "<format><rpm:license>GPL</rpm:license>"
    "<rpm:requires><rpm:entry name=\"x\"/></rpm:requires></format></package>"
    '<package type="rpm"><name>b</name>'
    '<checksum type="sha256" pkgid="YES">id-b</checksum>'
    '<location href="/lead/b.rpm"/><format></format></package>'
    "</metadata>"
)
_FILELISTS = (
    '<filelists packages="2">'
    '<package pkgid="id-a" name="a" arch="src">'
    '<version epoch="0" ver="1.5.0" rel="1.el7"/><file>f1</file></package>'
    '<package pkgid="id-b" name="b"><version ver="2"/></package>'
    "</filelists>"
)
_OTHER = (
    '<otherdata packages="2">'
    '<package pkgid="id-a" name="a" arch="src">'
    '<version epoch="0" ver="1.5.0" rel="1.el7"/>'
    '<changelog author="x" date="1">c</changelog></package>'
    '<package pkgid="id-b" name="b"><version ver="2"/></package>'
    "</otherdata>"
)
_REPOMD = (
    '<repomd><data type="primary"><checksum>z</checksum>'
    '<location href="repodata/p.xml.gz"/></data>'
    '<data type="other"><location href="repodata/o.xml.gz"/></data></repomd>'
)


def _one_repo(spark):
    return spark.createDataFrame(
        [(1, "http://base.ex/os", _REPOMD, _PRIMARY, _FILELISTS, _OTHER)],
        "repo_id int, base_url string, repomd_xml string, primary_xml string, "
        "filelists_xml string, other_xml string",
    )


def test_evr_and_download_url_branches(spark):
    rows = {r["name"]: r for r in map_repomd_packages(_one_repo(spark)).collect()}
    # epoch "0" is kept — a truthy string in packagedcode EVR.to_string
    # (reference repomd.py:61-65)
    assert rows["a"]["version"] == "0:1.5.0-1.el7"
    assert rows["a"]["purl"] == "pkg:rpm/a@0:1.5.0-1.el7"
    # no epoch attr and no rel -> bare version
    assert rows["b"]["version"] == "2"
    # absolute href passes through; leading "/" is stripped before the join
    # (repodata.build_rpm_download_url, repodata.py:76-85)
    assert rows["a"]["download_url"] == "https://abs.ex/a.rpm"
    assert rows["b"]["download_url"] == "http://base.ex/os/lead/b.rpm"
    assert rows["a"]["requires_count"] == 1 and rows["b"]["requires_count"] == 0
    assert rows["a"]["changelog_count"] == 1
    assert rows["a"]["file_count"] == 1
    # repomd.xml lacks a filelists entry -> null href, primary resolves
    assert rows["a"]["primary_href"] == "repodata/p.xml.gz"


def test_version_attrs_come_from_filelists_over_other(spark):
    # the reference's dict merge order is primary+other+filelists, last
    # wins (repodata.py:27-50 + 272-277) — filelists must take precedence
    fl = (
        '<filelists packages="1"><package pkgid="id-a" name="a">'
        '<version epoch="2" ver="9" rel="r9"/><file>f</file></package></filelists>'
    )
    repo = spark.createDataFrame(
        [(1, "http://b", _REPOMD, _PRIMARY, fl, _OTHER)],
        "repo_id int, base_url string, repomd_xml string, primary_xml string, "
        "filelists_xml string, other_xml string",
    )
    rows = {r["name"]: r for r in map_repomd_packages(repo).collect()}
    assert rows["a"]["version"] == "2:9-r9"


def test_primary_parse_nulls_for_missing_tags(spark):
    docs = _one_repo(spark).select("repo_id", "primary_xml")
    rows = {r["name"]: r for r in parse_primary(docs).collect()}
    assert rows["b"]["extracted_license_statement"] is None
    assert rows["b"]["summary"] is None
    assert rows["b"]["arch"] is None
    assert rows["a"]["extracted_license_statement"] == "GPL"


def test_repomd_urls_from_listing_filters_and_joins(spark):
    listings = spark.createDataFrame(
        [
            ("centos/7/os/repodata/repomd.xml", "http://m.ex/"),
            ("centos/7/os/repodata/primary.xml.gz", "http://m.ex/"),
            ("/abs/leading/repomd.xml", "http://m.ex/"),
        ],
        "path string, base_url string",
    )
    got = [r["uri"] for r in repomd_urls_from_listing(listings).collect()]
    # only repomd.xml entries, absolute paths rejected
    # (repodata_rpms.collect_rsync_urls, repodata_rpms.py:32-44)
    assert got == ["http://m.ex/centos/7/os/repodata/repomd.xml"]


def test_evr_string_matches_python_reference(spark):
    from purldb_spark.sources.rpm_repodata import evr_string

    # python reference of packagedcode EVR.to_string (epoch prefix for ANY
    # present epoch string including "0"; "-rel" only when release exists)
    def ref(e, v, r):
        vr = f"{v}-{r}" if r else v
        return f"{e}:{vr}" if e is not None else vr

    cases = [
        (e, v, r)
        for e in (None, "0", "1", "12")
        for v in ("1.5.0", "20200505")
        for r in (None, "1.el7", "0")
    ]
    df = spark.createDataFrame(cases, "e string, v string, r string")
    got = df.select(
        "e", "v", "r", evr_string(F.col("e"), F.col("v"), F.col("r")).alias("s")
    ).collect()
    for row in got:
        assert row["s"] == ref(row["e"], row["v"], row["r"]), row
