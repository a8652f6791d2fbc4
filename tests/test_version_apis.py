"""sources/version_apis.py unit coverage beyond the two oracle queries:
the URL/name helpers and parser edge cases that the synthetic fixture
documents can't exercise (goproxy case escaping, API package naming,
error responses, pagination pages)."""

from __future__ import annotations

from pyspark.sql import functions as F

from purldb_spark.sources.version_apis import (
    PARSERS_BY_TYPE,
    api_package_name,
    go_escape_path,
    parse_debian,
    parse_launchpad,
    parse_npm,
    parse_pypi,
    split_until,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_go_escape_path(spark):
    # GoproxyVersionAPI.escape_path doctest shape (package_managers.py:469-485)
    df = spark.createDataFrame(
        [("github.com/Azure/azure-sdk",), ("golang.org/x/net",)], ["p"]
    ).select(go_escape_path(F.col("p")).alias("e"))
    assert _rows(df) == [("github.com/!azure/azure-sdk",), ("golang.org/x/net",)]


def test_api_package_name(spark):
    # get_api_package_name doctests (package_managers.py:566-583)
    cases = [
        ("maven", "org.apache.commons", "commons-lang3", "org.apache.commons:commons-lang3"),
        ("composer", "foo", "bar", "foo/bar"),
        ("pypi", "ns-ignored", "requests", "requests"),
        ("npm", None, "lodash", "lodash"),
        ("apache", None, "httpd", "apache/httpd"),
        ("unknown-eco", "ns", "x", None),
        ("maven", "g", "", None),
    ]
    df = spark.createDataFrame(
        [(t, ns, n) for t, ns, n, _ in cases], ["t", "ns", "n"]
    ).select("t", "ns", "n", api_package_name(F.col("t"), F.col("ns"), F.col("n")).alias("o"))
    got = {(r.t, r.ns, r.n): r.o for r in df.collect()}
    for t, ns, n, want in cases:
        assert got[(t, ns, n)] == want, (t, ns, n)


def test_debian_error_response_skipped(spark):
    df = spark.createDataFrame(
        [
            ("a", '{"error": "404", "versions": [{"version": "1.0"}]}'),
            ("b", '{"versions": [{"version": "0:2.0-1"}]}'),
            ("c", '{"versions": null}'),
        ],
        ["pkg", "doc"],
    )
    assert _rows(parse_debian(df)) == [("b", "2.0-1", None)]


def test_launchpad_pages_concatenate(spark):
    # pagination = one doc row per page; parser output is the union
    page1 = '{"entries":[{"source_package_version":"1.0","date_published":"2020-01-01"}],"next_collection_link":"u2"}'
    page2 = '{"entries":[{"source_package_version":"1.1"}]}'
    df = spark.createDataFrame([("p", page1), ("p", page2)], ["pkg", "doc"])
    assert _rows(parse_launchpad(df)) == [("p", "1.0", "2020-01-01"), ("p", "1.1", None)]


def test_npm_version_without_time_entry(spark):
    doc = '{"versions":{"1.0.0":{"name":"x"},"2.0.0":{}},"time":{"1.0.0":"2020-01-01"}}'
    df = spark.createDataFrame([("p", doc)], ["pkg", "doc"])
    assert _rows(parse_npm(df)) == [("p", "1.0.0", "2020-01-01"), ("p", "2.0.0", None)]


def test_pypi_empty_releases(spark):
    df = spark.createDataFrame([("p", '{"releases":{}}'), ("q", "{}")], ["pkg", "doc"])
    assert parse_pypi(df).count() == 0


def test_split_until_null_until_is_all_valid(spark):
    df = spark.createDataFrame(
        [("1", "2020-01-01"), ("2", None)], ["v", "d"]
    ).select(split_until(F.col("d"), F.lit(None).cast("string")).alias("newer"))
    assert [r.newer for r in df.collect()] == [False, False]


def test_parser_registry_covers_all_eleven():
    # VERSION_API_CLASSES has 11 members (package_managers.py:543-556)
    assert len(PARSERS_BY_TYPE) == 11
