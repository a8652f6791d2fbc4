"""X1-X4 router dispatch + S3 registry mapper tests (reference:
minecode/route.py:82-200, minecode/collectors/npm.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from purldb_spark.operators.router import Router, seed_frontier
from purldb_spark.sources.registry_json import (
    packages_from_registry,
    read_registry_docs,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _router():
    r = Router()
    r.append(r"https?://registry\.npmjs\.org/.*", lambda uri: "npm", name="npm")
    r.append(r"https?://pypi\.org/pypi/.*", lambda uri: "pypi", name="pypi")
    r.append(r"pkg:npm/.*", lambda uri: "npm_collect", name="npm_collect")
    return r


def test_resolve_first_match_wins():
    r = _router()
    assert r.resolve("https://registry.npmjs.org/left-pad")("x") == "npm"
    assert r.resolve("pkg:npm/foo@1.0.0")("x") == "npm_collect"
    assert r.is_routable("https://pypi.org/pypi/requests/json")
    assert not r.is_routable("ftp://example.com/x")
    with pytest.raises(KeyError):
        r.resolve("ftp://example.com/x")


def test_vectorized_dispatch(spark):
    r = _router()
    frontier = seed_frontier(
        spark,
        [
            "https://registry.npmjs.org/left-pad",
            "https://pypi.org/pypi/requests/json",
            "pkg:npm/foo@1.0.0",
            "ftp://example.com/unroutable",
        ],
    )
    routed = {row.uri: row.handler for row in r.route_frontier(frontier).collect()}
    assert routed["https://registry.npmjs.org/left-pad"] == "npm"
    assert routed["https://pypi.org/pypi/requests/json"] == "pypi"
    assert routed["pkg:npm/foo@1.0.0"] == "npm_collect"
    assert routed["ftp://example.com/unroutable"] is None


def test_registry_mapper(spark):
    docs = read_registry_docs(spark, os.path.join(FIXTURES, "npm_registry_doc.json"))
    pkgs = packages_from_registry(docs).orderBy("version").collect()
    assert [p.purl for p in pkgs] == [
        "pkg:npm/left-pad-ish@1.0.0",
        "pkg:npm/left-pad-ish@1.1.0",
    ]
    assert pkgs[0].sha1 == "356a192b7913b04c54574d18c28d46e6395428ab"
    assert pkgs[0].download_url.endswith("left-pad-ish-1.0.0.tgz")
    assert [p.is_latest for p in pkgs] == [False, True]
    assert all(p.declared_license_expression == "MIT" for p in pkgs)
