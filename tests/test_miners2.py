"""Edge cases for the batch-2 miner mappers that the fixture queries can't
reach: absent optional blocks and malformed documents."""

from __future__ import annotations

from purldb_spark.sources.miners2 import (
    map_cargo_docs,
    map_gem_docs,
    map_nuget_docs,
    map_packagist_docs,
)


def test_cargo_no_publisher_and_no_downloads(spark):
    docs = spark.createDataFrame(
        [
            ('{"crate":{"keywords":[]},"versions":[{"crate":"a","num":"1",'
             '"dl_path":"/api/v1/crates/a/1/download"}]}',),
            ('{"crate":{"keywords":[]},"versions":[{"crate":"b","num":"1"}]}',),
            ("not json at all",),
        ],
        ["doc"],
    )
    rows = map_cargo_docs(docs).collect()
    assert [r["name"] for r in rows] == ["a"]
    assert rows[0]["author"] is None
    assert rows[0]["declared_license"] is None


def test_gem_minimal_doc(spark):
    rows = map_gem_docs(
        spark.createDataFrame([('{"name":"x","version":"1"}',)], ["doc"])
    ).collect()
    assert rows[0]["purl"] == "pkg:gem/x@1"
    assert rows[0]["declared_license"] is None


def test_packagist_empty_versions(spark):
    docs = spark.createDataFrame(
        [('{"package":{"language":"PHP","versions":{}}}',), ('{"package":null}',)],
        ["doc"],
    )
    assert map_packagist_docs(docs).count() == 0


def test_nuget_blank_summary(spark):
    rows = map_nuget_docs(
        spark.createDataFrame(
            [('{"id":"n","version":"1","summary":"  ","description":"D"}',)], ["doc"]
        )
    ).collect()
    assert rows[0]["description"] == "D"
    assert rows[0]["authors"] is None
