"""merge_harvest wiring: harvest package scans merged into an existing
catalog with merge_packages(replace=False) semantics — existing non-empty
values win, empties fill, checksum disagreement dead-letters."""

from __future__ import annotations

from purldb_spark.sources.clearindex import merge_harvest


def _doc(name, version, url, sha1):
    return (
        f'{{"content":{{"files":[],"summary":{{"packages":[{{'
        f'"purl":"pkg:generic/{name}@{version}","type":"generic",'
        f'"name":"{name}","version":"{version}",'
        f'"download_url":"{url}","sha1":"{sha1}"}}]}}}}}}'
    )


def test_merge_harvest_fill_and_conflict(spark):
    url_a, url_b, url_c = (f"https://dl.example/{x}.tgz" for x in "abc")
    existing = spark.createDataFrame(
        [
            # description present -> kept; sha1 missing -> filled
            ("generic", "a", "1.0", "keep me", url_a, None),
            # sha1 present and disagreeing -> conflict
            ("generic", "b", "1.0", None, url_b, "oldsha"),
        ],
        "type string, name string, version string, description string,"
        " download_url string, sha1 string",
    )
    cditems = spark.createDataFrame(
        [
            ("cd/a.json", _doc("a", "1.0", url_a, "sha-a")),
            ("cd/b.json", _doc("b", "1.0", url_b, "newsha")),
            ("cd/c.json", _doc("c", "2.0", url_c, "sha-c")),  # pure insert
        ],
        ["path", "data"],
    )
    merged, conflicts = merge_harvest(existing, cditems)
    rows = {r["download_url"]: r for r in merged.collect()}
    # the checksum-disputed key is dead-lettered out of the snapshot (M1)
    assert sorted(rows) == [url_a, url_c]
    assert rows[url_a]["description"] == "keep me"  # FILL does not overwrite
    assert rows[url_a]["sha1"] == "sha-a"  # null filled from harvest
    assert rows[url_c]["name"] == "c"  # insert lands
    assert [(r["name"], r["existing_sha1"], r["incoming_sha1"]) for r in conflicts.collect()] == [
        ("b", "oldsha", "newsha")
    ]


def test_merge_harvest_skips_dead_letters(spark):
    doc_no_url = (
        '{"content":{"files":[],"summary":{"packages":[{'
        '"purl":"pkg:generic/x@1","type":"generic","name":"x","version":"1"}]}}}'
    )
    existing = spark.createDataFrame(
        [("generic", "a", "1.0", None, "https://dl.example/a.tgz", None)],
        "type string, name string, version string, description string,"
        " download_url string, sha1 string",
    )
    cditems = spark.createDataFrame([("cd/x.json", doc_no_url)], ["path", "data"])
    merged, conflicts = merge_harvest(existing, cditems)
    assert merged.count() == 1  # only the untouched existing row
    assert conflicts.count() == 0


def test_merge_harvest_purl_identity_key(spark):
    # two versions sharing one download_url stay distinct rows (the old
    # download_url-only key would have collapsed or mis-merged them)
    url = "https://dl.example/shared.tgz"
    existing = spark.createDataFrame(
        [("generic", "a", "1.0", "v1 desc", url, None)],
        "type string, name string, version string, description string,"
        " download_url string, sha1 string",
    )
    cditems = spark.createDataFrame(
        [("cd/a2.json", _doc("a", "2.0", url, "sha-a2"))], ["path", "data"]
    )
    merged, conflicts = merge_harvest(existing, cditems)
    rows = {r["version"]: r for r in merged.collect()}
    assert sorted(rows) == ["1.0", "2.0"]
    assert rows["1.0"]["description"] == "v1 desc"
    assert rows["2.0"]["sha1"] == "sha-a2"
    assert conflicts.count() == 0
