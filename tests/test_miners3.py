"""Edge cases for the batch-3 miner mappers that the fixture queries can't
reach: absent optional blocks, malformed documents, and reference quirks."""

from __future__ import annotations

from purldb_spark.sources.miners3 import (
    map_alpine_blocks,
    map_conda_docs,
    map_cran_docs,
    map_fdroid_docs,
    map_sourceforge_docs,
)


def test_alpine_non_q1_checksum_and_no_maintainer(spark):
    docs = spark.createDataFrame(
        [
            ("C:ABCD\nP:pkg\nV:1.0\nS:12\n", "u1"),
            ("no colon lines only\n\nP:two\nV:2\n", "u2"),
        ],
        ["apkindex", "download_url"],
    )
    rows = {r["name"]: r for r in map_alpine_blocks(docs).collect()}
    # non-Q1 checksum stays null (reference only decodes the Q1 shape,
    # alpine.py:128-145); blocks without P: are dropped
    assert set(rows) == {"pkg", "two"}
    assert rows["pkg"]["sha1"] is None
    assert rows["pkg"]["maintainer_name"] is None
    assert rows["two"]["download_url"] == "u2"


def test_alpine_maintainer_email_only(spark):
    docs = spark.createDataFrame(
        [("P:a\nV:1\nm:<only@ex.dev>\n", "u")], ["apkindex", "download_url"]
    )
    r = map_alpine_blocks(docs).collect()[0]
    assert r["maintainer_name"] is None
    assert r["maintainer_email"] == "only@ex.dev"


def test_cran_no_version_filter_emits_all(spark):
    docs = spark.createDataFrame(
        [('{"Package":"p","versions":{"1":{"License":"MIT"},"2":{}}}',)], ["doc"]
    )
    rows = map_cran_docs(docs).collect()
    assert sorted(r["version"] for r in rows) == ["1", "2"]
    assert all(r["purl"].startswith("pkg:cran/p@") for r in rows)


def test_conda_missing_identifier_drops_row(spark):
    docs = spark.createDataFrame(
        [
            ('{"packages":{"a-1.tar.bz2":{"size":1}}}', "b-1.tar.bz2",
             "b", "main", "1", "u", None),
        ],
        "doc string, identifier string, name string, namespace string, "
        "version string, download_url string, package_info string",
    )
    assert map_conda_docs(docs).count() == 0


def test_conda_non_forge_ignores_info_doc(spark):
    docs = spark.createDataFrame(
        [
            ('{"packages":{"a-1.tar.bz2":{"size":1}}}', "a-1.tar.bz2",
             "a", "main", "1", "u", '{"description":"D","html_url":"H"}'),
        ],
        ["doc", "identifier", "name", "namespace", "version",
         "download_url", "package_info"],
    )
    r = map_conda_docs(docs).collect()[0]
    assert r["description"] is None and r["homepage_url"] is None


def test_sourceforge_nameless_doc_dropped(spark):
    docs = spark.createDataFrame(
        [('{"summary":"S"}',), ('{"shortname":"ok"}',)], ["doc"]
    )
    rows = map_sourceforge_docs(docs).collect()
    assert [r["name"] for r in rows] == ["ok"]
    # no license entries at all -> empty array, not a crash
    assert rows[0]["extracted_license_statement"] == []


def test_fdroid_description_startswith_dedup(spark):
    doc = (
        '{"metadata":{"name":{"en-US":"App"},"summary":{"en-US":"App does x"},'
        '"description":{"en-US":"App does x and more"}},'
        '"versions":{"h":{"manifest":{"versionCode":7},'
        '"src":{"name":"/a-src.tgz","sha256":"s","size":1},'
        '"file":{"name":"/a.apk","sha256":"f","size":2}}}}'
    )
    rows = map_fdroid_docs(
        spark.createDataFrame([(doc, "a")], ["doc", "name"])
    ).collect()
    # name is a prefix of summary, summary a prefix of description:
    # both dropped (fdroid.py:240-288)
    assert all(r["description"] == "App does x and more" for r in rows)
    assert sorted(r["download_url"] for r in rows) == [
        "https://f-droid.org/repo/a-src.tgz",
        "https://f-droid.org/repo/a.apk",
    ]
    apk = next(r for r in rows if r["download_url"].endswith(".apk"))
    assert apk["source_packages"] == [
        "pkg:fdroid/a@7?download_url=https://f-droid.org/repo/a-src.tgz"
    ]
