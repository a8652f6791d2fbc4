"""URL functions — C2 canonicalization (minecode/models.py:34-53) and the
to_purl / from_purl conversions (packagedb/to_purl.py:28-70,
packagedb/from_purl.py:29-59, which wrap the url2purl/purl2url libraries).

`canonical_url` is a pure Column expression (the reference uses a Python
urlpy port per row; at scale the normalization must stay JVM-side).
to_purl/from_purl are driver-side pure functions re-deriving the common
registry URL shapes for npm/pypi/maven from the public purl-spec docs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from purldb_spark.functions.purl import PackageURL


def canonical_url(col: str | Column) -> Column:
    """C2: lowercase scheme+host, strip default ports (:80/:443), drop the
    fragment, strip trailing slash on bare paths."""
    c = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_replace(c, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?]+)", 1))
    port = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/:?]+(:\d+)", 1)
    rest = F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([/?].*)?$", 1)
    norm_port = (
        F.when((scheme == "http") & (port == ":80"), "")
        .when((scheme == "https") & (port == ":443"), "")
        .otherwise(port)
    )
    rebuilt = F.concat(scheme, F.lit("://"), host, norm_port, rest)
    cleaned = F.regexp_replace(rebuilt, r"/$", "")
    # non-URL strings pass through untouched
    return F.when(scheme == "", c).otherwise(cleaned)


_NPM_RX = re.compile(
    r"https?://registry\.npmjs\.org/(?P<name>[^/]+)/-/[^/]+-(?P<version>\d[^/]*?)\.tgz$"
)
_PYPI_RX = re.compile(
    r"https?://files\.pythonhosted\.org/packages/.*/(?P<name>[A-Za-z0-9_.-]+)-(?P<version>\d[^-/]*)\.tar\.gz$"
)
_MAVEN_RX = re.compile(
    r"https?://repo1?\.maven\.(?:org|apache\.org)/maven2/(?P<path>.+)/(?P<artifact>[^/]+)/(?P<version>[^/]+)/(?P=artifact)-(?P=version)\.(?:jar|pom)$"
)


def url_to_purl(url: str) -> str | None:
    """to_purl: recognize registry download URLs -> purl (None if unknown)."""
    m = _NPM_RX.match(url)
    if m:
        return f"pkg:npm/{m['name']}@{m['version']}"
    m = _PYPI_RX.match(url)
    if m:
        return f"pkg:pypi/{m['name'].lower()}@{m['version']}"
    m = _MAVEN_RX.match(url)
    if m:
        namespace = m["path"].replace("/", ".")
        return f"pkg:maven/{namespace}/{m['artifact']}@{m['version']}"
    return None


def purl_to_url(purl: str) -> str | None:
    """from_purl: purl -> canonical registry download URL (None if the
    ecosystem has no deterministic URL scheme)."""
    p = PackageURL.parse(purl)
    if not p.version:
        return None
    if p.type == "npm":
        name = f"{p.namespace}/{p.name}" if p.namespace else p.name
        return f"https://registry.npmjs.org/{name}/-/{p.name}-{p.version}.tgz"
    if p.type == "pypi":
        return (
            "https://files.pythonhosted.org/packages/source/"
            f"{p.name[0]}/{p.name}/{p.name}-{p.version}.tar.gz"
        )
    if p.type == "maven" and p.namespace:
        path = p.namespace.replace(".", "/")
        return (
            f"https://repo1.maven.org/maven2/{path}/{p.name}/{p.version}/"
            f"{p.name}-{p.version}.jar"
        )
    return None
