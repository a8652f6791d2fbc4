"""Apache dist-index visitor: the `find -ls` index of every download on
apache.org/dist -> archive/checksum URIs with best-effort purls
(reference: ApacheDistIndexVisitor + build_purl,
minecode/miners/apache.py:182-250, extension/ignore lists at 91-160).

Spark shape: parse_find_ls is a stateless regexp map; the filter is a
single vectorized predicate over literal suffix/substring lists; purl
derivation is split/segment arithmetic. No shuffle anywhere — a multi-GB
dist index maps linearly across the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ARCHIVE_EXTS = (
    ".jar", ".zip", ".tar.gz", ".tgz", ".tar.bz2", ".war", ".tar.xz",
    ".tar", ".whl", ".gem", ".nupkg",
)

CHECKSUM_EXTS = (".sha256", ".sha512", ".md5", ".sha", ".sha1")

IGNORED_PATH_CONTAINS = (
    "META/", "/documentation/", "/doc/", "-doc.", "-doc-", "/docs/",
    "-docs.", "-docs-", "javadoc", "fulldoc", "apidoc", "-manual.",
    "-asdocs.", "updatesite/", "eclipse-update-site", "update/eclipse",
    "sling/eclipse", "eclipse.site-", "-distro.", "-bin-withdeps.",
    "-bin-with-deps", "apache-airavata-distribution",
    "apache-airavata-server", "apache-mahout-distribution",
    "/syncope-standalone-", "binaries/conda", "perl/contrib", "zzz",
    "ant/manual",
)

_URL_TEMPLATE = "https://apache.org/dist/{path}"


def _endswith_any(col, suffixes) -> F.Column:
    out = F.lit(False)
    for s in suffixes:
        out = out | col.endswith(s)
    return out


def _contains_any(col, needles) -> F.Column:
    out = F.lit(False)
    for n in needles:
        out = out | col.contains(n)
    return out


def apache_dist_uris(entries: DataFrame, source_uri: str) -> DataFrame:
    """find-ls entries -> (uri, package_url, size, visited, source_uri):
    keep FILE rows ending in an archive extension or archive+checksum
    extension, minus the ignore list; checksums remain to-visit
    (visited=false), archives are scan-only (visited=true). The purl takes
    name from the first path segment and version from the second only for
    /distribution/ or /sources/ layouts (apache.py:222-250 — the
    reference marks this best-effort, and so is this)."""
    kept = tuple(
        ae + cke for ae in ARCHIVE_EXTS for cke in CHECKSUM_EXTS
    ) + ARCHIVE_EXTS
    path = F.col("path")
    segments = F.split(path, "/")
    name = segments.getItem(0)
    versioned = path.contains("/distribution/") | path.contains("/sources/")
    version = F.when(versioned & (F.size(segments) > 1), segments.getItem(1))
    purl = F.concat(
        F.lit("pkg:apache/"),
        name,
        F.when(version.isNotNull(), F.concat(F.lit("@"), version)).otherwise(
            F.lit("")
        ),
    )
    return (
        entries.filter(
            (F.col("type") == "file")
            & _endswith_any(path, kept)
            & ~_contains_any(path, IGNORED_PATH_CONTAINS)
        )
        .select(
            F.concat(F.lit(_URL_TEMPLATE.format(path="")), path).alias("uri"),
            purl.alias("package_url"),
            F.col("size"),
            (~_endswith_any(path, CHECKSUM_EXTS)).alias("visited"),
            F.lit(source_uri).alias("source_uri"),
        )
    )
