"""Edge cases for the batch-6 miner mappers beyond the fixture queries:
shape variants, dropped rows, and reference quirks."""

from __future__ import annotations

from purldb_spark.sources.miners6 import (
    map_bower_docs,
    map_dockerhub_docs,
    map_haxe_docs,
    map_nix_docs,
)


def test_bower_nameless_doc_dropped_and_no_repo(spark):
    docs = spark.createDataFrame(
        [
            ('{"version":"1.0"}',),  # no name -> dropped (bower.py:139)
            ('{"name":"a","repository":{"type":"git"}}',),  # url missing
            ('{"name":"b","authors":["no colon entry"]}',),
        ],
        ["doc"],
    )
    rows = {r["name"]: r for r in map_bower_docs(docs).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["vcs_url"] is None
    # authors entries without ":" are dropped (bower.py:176-184)
    assert rows["b"]["parties"] is None


def test_haxe_no_version_no_download_url(spark):
    docs = spark.createDataFrame([('{"name":"openfl"}',)], ["doc"])
    r = map_haxe_docs(docs).collect()[0]
    assert r["download_url"] is None
    assert r["purl"] == "pkg:haxe/openfl"


def test_dockerhub_null_namespace_is_library(spark):
    doc = (
        '{"summary":{"description":"d"},'
        '"tags":[{"name":"t","digest":"sha256:ab"}]}'
    )
    docs = spark.createDataFrame(
        [(doc, "redis", None)], "doc string, name string, namespace string"
    )
    r = map_dockerhub_docs(docs).collect()[0]
    assert r["homepage_url"] == "https://hub.docker.com/_/redis"
    assert r["purl"] == "pkg:docker/redis@t"
    assert r["sha256"] == "ab"
    assert "layers/library/redis/t/images/sha256:ab" in r["download_url"]


def test_nix_no_narinfo_table_and_null_outputs(spark):
    doc = (
        '{"name":"jq","summary":"s","releases":[{"version":"1",'
        '"platforms":[{"system":"x","outputs":null},'
        '{"system":"y","outputs":[{"name":"out",'
        '"path":"/nix/store/h1-jq-1"}]}]}]}'
    )
    docs = spark.createDataFrame([(doc,)], ["doc"])
    rows = map_nix_docs(docs).collect()
    # null-outputs platform skipped entirely (nix.py:82-83)
    assert len(rows) == 1
    assert rows[0]["download_url"] is None
    assert rows[0]["purl"] == "pkg:nix/jq@1?output=out&system=y"


def test_nix_version_filter(spark):
    doc = (
        '{"name":"jq","releases":['
        '{"version":"1","platforms":[{"system":"x",'
        '"outputs":[{"name":"o","path":"/nix/store/a-b"}]}]},'
        '{"version":"2","platforms":[{"system":"x",'
        '"outputs":[{"name":"o","path":"/nix/store/c-d"}]}]}]}'
    )
    docs = spark.createDataFrame([(doc, "2")], ["doc", "want"])
    rows = map_nix_docs(docs, version_col="want").collect()
    assert [r["version"] for r in rows] == ["2"]
