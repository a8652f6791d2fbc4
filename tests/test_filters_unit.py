"""Unit tests for the predicate compilers and purl parser (driver-side pure
Python — no Spark needed). Mirrors the reference's semantics tests for
packagedb/filters.py and purl_to_lookups.
"""

from __future__ import annotations

import pytest

from purldb_spark.functions.purl import PackageURL, purl_to_lookups
from purldb_spark.operators.filters import Term, parse_query_string


def test_parse_terms_ops():
    terms = parse_query_string("name^:foo type~:bar -brand=:Baz size>:10 plain")
    assert terms == [
        Term("name", "istartswith", "foo", False),
        Term("type", "icontains", "bar", False),
        Term("brand", "iexact", "Baz", True),
        Term("size", "gt", "10", False),
        Term("name", "icontains", "plain", False),
    ]


def test_parse_shlex_quoting():
    terms = parse_query_string('name=:"two words" other')
    assert terms[0] == Term("name", "iexact", "two words", False)
    assert terms[1].value == "other"


def test_parse_colon_in_value():
    # first colon splits; the rest stays in the value (URLs etc.)
    terms = parse_query_string("url~:https://example.com/x")
    assert terms[0] == Term("url", "icontains", "https://example.com/x", False)


@pytest.mark.parametrize(
    "purl,expect",
    [
        (
            "pkg:npm/foo@1.0.0",
            {"type": "npm", "name": "foo", "version": "1.0.0"},
        ),
        (
            "pkg:maven/org.apache/commons-io@2.11.0",
            {
                "type": "maven",
                "namespace": "org.apache",
                "name": "commons-io",
                "version": "2.11.0",
            },
        ),
        (
            "pkg:npm/%40angular/core@12.0.0",
            {"type": "npm", "namespace": "@angular", "name": "core", "version": "12.0.0"},
        ),
        (
            "pkg:golang/github.com/gorilla/mux@v1.8.0",
            {
                "type": "golang",
                "namespace": "github.com/gorilla",
                "name": "mux",
                "version": "v1.8.0",
            },
        ),
        (
            "pkg:deb/debian/curl@7.50.3-1?arch=i386&distro=jessie",
            {
                "type": "deb",
                "namespace": "debian",
                "name": "curl",
                "version": "7.50.3-1",
                "qualifiers": "arch=i386&distro=jessie",
            },
        ),
        (
            "pkg:generic/bar#sub/path",
            {"type": "generic", "name": "bar", "subpath": "sub/path"},
        ),
    ],
)
def test_purl_to_lookups(purl, expect):
    assert purl_to_lookups(purl) == expect


def test_purl_roundtrip():
    for s in [
        "pkg:npm/%40angular/core@12.0.0",
        "pkg:maven/org.apache/commons-io@2.11.0?classifier=sources",
        "pkg:pypi/django@4.2",
    ]:
        assert PackageURL.parse(s).to_string() == s


def test_purl_rejects_garbage():
    with pytest.raises(ValueError):
        PackageURL.parse("http://not-a-purl")
    with pytest.raises(ValueError):
        PackageURL.parse("pkg:only-type")
