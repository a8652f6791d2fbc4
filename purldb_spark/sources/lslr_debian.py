"""Debian/Ubuntu mirror directory-index visitor: ls-lR.gz listing ->
collectible package URIs (reference: DebianDirectoryIndexVisitor,
minecode/miners/debian.py:98-150, with is_collectible at debian.py:68-87).

The reference streams the gunzipped listing through a Python ls parser and
yields URI records; here the listing parses as a DataFrame
(sources/listings.py::parse_lslr — window-scoped directory context,
partitioned per listing file) and the visitor is a pure column pipeline:
collectible filter, URL template join, and the deb-filename nva split
(name_version_arch.deb -> pkg:deb purl with the arch qualifier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TARBALLS = (".deb", ".udeb", ".tar.gz", ".tar.xz", ".tar.bz2", ".tar.lzma")


def _is_collectible(fname) -> F.Column:
    """is_collectible (debian.py:68-87): the three named index files, .deb /
    .dsc packages, and Contents-*.gz maps."""
    return (
        fname.isin("Packages.gz", "Release", "Sources.gz")
        | fname.endswith(".deb")
        | fname.endswith(".dsc")
        | (fname.startswith("Contents-") & fname.endswith(".gz"))
    )


def debian_lslr_uris(entries: DataFrame, source_uri: str) -> DataFrame:
    """ls-lR entries -> URI rows (uri, package_url, file_name, size, date,
    source_uri), FILE entries passing is_collectible only.

    The purl branch (debian.py:131-139) fires for package archives: the
    filename splits on '_' into name / version / arch ('all'-arch archives
    have no arch part), namespace from the mirror host (debian.org ->
    debian, ubuntu -> ubuntu)."""
    namespace = (
        "debian"
        if "debian.org" in source_uri
        else "ubuntu"
        if "ubuntu" in source_uri
        else None
    )
    fname = F.substring_index("path", "/", -1)
    base = F.regexp_extract(fname, r"^(.*?)(?:\.tar\.(?:gz|xz|bz2|lzma)|\.u?deb)$", 1)
    parts = F.split(base, "_")
    nva_ok = F.size(parts) >= 2
    p_name = parts.getItem(0)
    p_version = parts.getItem(1)
    p_arch = F.when(F.size(parts) >= 3, parts.getItem(2))
    is_pkg = F.lit(False)
    for suf in _TARBALLS:
        is_pkg = is_pkg | fname.endswith(suf)
    purl = F.when(
        is_pkg & nva_ok & F.lit(namespace is not None),
        F.concat(
            F.lit(f"pkg:deb/{namespace}/"),
            p_name,
            F.lit("@"),
            p_version,
            F.when(p_arch.isNotNull(), F.concat(F.lit("?arch="), p_arch)).otherwise(
                F.lit("")
            ),
        ),
    )
    url_prefix = source_uri.replace("ls-lR.gz", "")
    return (
        entries.filter((F.col("type") == "file") & _is_collectible(fname))
        .select(
            F.concat(F.lit(url_prefix), F.col("path")).alias("uri"),
            purl.alias("package_url"),
            fname.alias("file_name"),
            F.col("size"),
            F.col("date"),
            F.lit(source_uri).alias("source_uri"),
        )
    )
