"""Edge cases for the batch-7 miner mappers beyond the fixture queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from purldb_spark.sources.miners7 import (
    apache_version_from_base,
    map_apache_downloads,
    map_apache_projects,
    map_cpan_meta_docs,
    map_cpan_release_docs,
)


def test_cpan_release_vcs_prefix_gated_on_dot_git(spark):
    doc = (
        '{"hits":{"hits":['
        '{"_source":{"name":"A","resources":{"repository":'
        '{"url":"git://x/a.git"}}}},'
        '{"_source":{"name":"B","resources":{"repository":'
        '{"url":"https://svn/x"}}}}]}}'
    )
    rows = {
        r["name"]: r
        for r in map_cpan_release_docs(
            spark.createDataFrame([(doc,)], ["doc"])
        ).collect()
    }
    # "git+" only when ".git" appears in the url (cpan.py:299-310);
    # otherwise the bare url is kept as vcs_url (cpan.py:271-276)
    assert rows["A"]["vcs_url"] == "git+git://x/a.git"
    assert rows["B"]["vcs_url"] == "https://svn/x"


def test_cpan_meta_description_defaults_to_name(spark):
    doc = '{"name":"Plack","license":"perl_5"}'
    r = map_cpan_meta_docs(
        spark.createDataFrame([(doc, None)], "doc string, uri string")
    ).collect()[0]
    assert r["description"] == "Plack"
    assert r["download_url"] is None
    # non-"git:" repos yield no vcs_url at all (cpan.py:396-404)
    assert r["vcs_url"] is None


def test_apache_projects_versionless_row(spark):
    doc = '{"p1":{"homepage":"https://p1.apache.org"}}'
    rows = map_apache_projects(
        spark.createDataFrame([(doc,)], ["doc"])
    ).collect()
    assert len(rows) == 1
    assert rows[0]["version"] is None
    assert rows[0]["description"] is None


def test_apache_version_segments(spark):
    df = spark.range(1).select(
        apache_version_from_base(F.lit("apache-groovy-src-2.4.6")).alias("a"),
        apache_version_from_base(F.lit("turbine-4.0-M1")).alias("b"),
        apache_version_from_base(F.lit("no-version-here")).alias("c"),
    )
    r = df.collect()[0]
    # segments after the first numeric one all join into the version
    # (get_name_version, apache.py:559-592)
    assert r["a"] == "2.4.6"
    assert r["b"] == "4.0-M1"
    assert r["c"] is None


def test_apache_downloads_checksum_folding(spark):
    rows = spark.createDataFrame(
        [
            ("https://apache.org/dist/g/g-1.0.zip", "pkg:apache/g", None),
            ("https://apache.org/dist/g/g-1.0.zip.sha512", "pkg:apache/g", " abc "),
        ],
        "uri string, package_url string, data string",
    )
    out = map_apache_downloads(rows).collect()
    assert len(out) == 1
    r = out[0]
    assert r["download_url"] == "https://apache.org/dist/g/g-1.0.zip"
    assert r["download_sha512"] == "abc"
    assert r["download_md5"] is None
    assert r["version"] == "1.0"
    assert r["name"] == "g"
