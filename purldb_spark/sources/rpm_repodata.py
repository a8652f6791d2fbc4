"""Yum/RPM repodata miner, batch 5: repomd.xml index + primary/filelists/
other XML package extraction (CentOS / Fedora / openSUSE / postgresql yum
repos). Reference: minecode/miners/repomd.py, repodata.py,
repodata_rpms.py, fedora.py. Same design as sources/miners*.py — fetching
stays on the frontier; mapping fetched XML documents to catalog rows is
pure column expressions (regexp split/extract + join, whole-stage codegen,
no Python UDFs and no XML DOM on the hot path):

- repomd.xml (repodata.get_url_for_tag, repodata.py:97-118): per data
  type (primary/filelists/other), the <location href=".."/> relative URL.
- primary.xml (repodata.primaryxml_parser, repodata.py:168-236): one row
  per <package> with name/arch elements, checksum text (the pkgid),
  summary/description/url/packager, size and time attrs, location href,
  and the <format> block's rpm:license / rpm:vendor / rpm:group /
  rpm:buildhost / rpm:sourcerpm plus requires/provides entry counts.
- filelists.xml (repodata.filelistsxml_parser, repodata.py:127-165):
  pkgid + version attrs, plain-file vs type="dir" entry counts.
- other.xml (repodata.otherxml_parser, repodata.py:239-269): pkgid +
  version attrs, changelog entries.
- combine (repodata.combine_dicts_using_pkgid, repodata.py:27-39): the
  reference merges the three parses per pkgid dict-wise; here it is a
  per-repo equi-join on (repo key, pkgid) — the 100 TB shape: each repo's
  packages co-group under a composite key, no global skew from repeated
  checksums across mirrors.
- package build (repomd.generate_rpm_objects, repomd.py:52-75): type
  "rpm", EVR version string (packagedcode.rpm.EVR.to_string: "epoch:ver-
  rel" with the epoch prefix whenever the attr is present — including
  "0", which is a truthy string there — and the "-rel" suffix only when a
  release exists), download_url via build_rpm_download_url
  (repodata.py:76-85: absolute hrefs pass through, leading "/" stripped,
  else posixpath.join on the base url). NOTE: the reference gates the
  related source package on infos.get("source_rpm") while the parser
  stores the key "sourcerpm" (repodata.py:217) — that branch never fires
  there; the sourcerpm value is carried here as its own column instead.
- seed collection (repodata_rpms.collect_rsync_urls, repodata_rpms.py:
  32-44): rsync directory listings filtered to entries whose path ends in
  repomd.xml, joined onto the http(s) base url.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMES = ("http://", "https://", "ftp://")


def _text(tag: str) -> Column:
    """nullable text of <tag>...</tag> inside the current package chunk."""
    return F.nullif(
        F.regexp_extract(F.col("chunk"), f"<{tag}>([^<]*)</{tag}>", 1), F.lit("")
    )


def _attr(tag: str, attr: str) -> Column:
    """nullable value of an attribute on <tag .../> in the current chunk."""
    return F.nullif(
        F.regexp_extract(F.col("chunk"), f'<{tag}[^>]*\\b{attr}="([^"]*)"', 1),
        F.lit(""),
    )


def _split_packages(
    docs: DataFrame, doc_col: str, keep_cols: tuple[str, ...]
) -> DataFrame:
    """One row per <package ...>...</package> chunk of an XML document.

    The repodata XML formats are machine-written, one element per package
    (repodata.py:131-137, 172-178, 243-245); a lookahead split on the
    package open tag is exact for them and stays in whole-stage codegen —
    no per-row XML DOM, no Python.
    """
    chunk = F.explode(F.split(F.col(doc_col), r"(?=<package[\s>])")).alias("chunk")
    return docs.select(*keep_cols, chunk).filter(
        F.col("chunk").contains("</package>")
    )


def repomd_href(repomd_col: str | Column, data_type: str) -> Column:
    """Relative URL of one repomd.xml <data type=...> entry
    (repodata.get_url_for_tag, repodata.py:97-118)."""
    col = F.col(repomd_col) if isinstance(repomd_col, str) else repomd_col
    return F.nullif(
        F.regexp_extract(
            col,
            f'(?s)<data type="{data_type}">.*?<location href="([^"]*)"',
            1,
        ),
        F.lit(""),
    )


def build_rpm_download_url(base_url: Column, href: Column) -> Column:
    """Absolute hrefs pass through; otherwise join onto base_url with any
    leading '/' stripped (repodata.build_rpm_download_url, repodata.py:
    70-85 including is_absolute)."""
    is_abs = F.aggregate(
        F.array(*[F.lit(s) for s in _SCHEMES]),
        F.lit(False),
        lambda acc, s: acc | F.startswith(href, s),
    )
    joined = F.concat(base_url, F.lit("/"), F.regexp_replace(href, "^/+", ""))
    return F.when(href.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(is_abs, href).otherwise(joined)
    )


def parse_primary(
    docs: DataFrame, doc_col: str = "primary_xml", repo_col: str = "repo_id"
) -> DataFrame:
    """primary.xml -> one row per package (repodata.primaryxml_parser,
    repodata.py:168-236). requires/provides become entry counts — the
    reference keeps them as attr-dict lists; the count is the stable
    aggregate the catalog schema carries."""
    chunks = _split_packages(docs, doc_col, (repo_col,))
    fmt = F.regexp_extract(F.col("chunk"), r"(?s)<format>(.*)</format>", 1)
    n_entries = lambda section: F.coalesce(  # noqa: E731
        F.regexp_count(
            F.regexp_extract(fmt, rf"(?s)<rpm:{section}>(.*?)</rpm:{section}>", 1),
            F.lit("<rpm:entry"),
        ),
        F.lit(0),
    ).alias(f"{section}_count")
    return chunks.select(
        F.col(repo_col),
        _text("name").alias("name"),
        _text("arch").alias("arch"),
        F.nullif(
            F.regexp_extract(F.col("chunk"), r"<checksum[^>]*>([^<]*)</checksum>", 1),
            F.lit(""),
        ).alias("pkgid"),
        _text("summary").alias("summary"),
        _text("description").alias("description"),
        _text("url").alias("homepage_url"),
        _attr("location", "href").alias("href"),
        _attr("size", "package").cast("long").alias("pkg_size"),
        _attr("size", "installed").cast("long").alias("installed_size"),
        _attr("time", "build").cast("long").alias("build_time"),
        _text("rpm:license").alias("extracted_license_statement"),
        _text("rpm:vendor").alias("vendor"),
        _text("rpm:group").alias("rpm_group"),
        _text("rpm:buildhost").alias("buildhost"),
        _text("rpm:sourcerpm").alias("sourcerpm"),
        n_entries("requires"),
        n_entries("provides"),
    )


def _parse_versioned(
    docs: DataFrame, doc_col: str, repo_col: str, extras: dict[str, Column]
) -> DataFrame:
    """Shared shape of filelists.xml and other.xml packages: pkgid/name/
    arch attrs on <package>, epoch/ver/rel attrs on <version>
    (repodata.py:127-165, 239-269)."""
    chunks = _split_packages(docs, doc_col, (repo_col,))
    return chunks.select(
        F.col(repo_col),
        _attr("package", "pkgid").alias("pkgid"),
        _attr("package", "name").alias("name"),
        _attr("package", "arch").alias("arch"),
        _attr("version", "epoch").alias("epoch"),
        _attr("version", "ver").alias("ver"),
        _attr("version", "rel").alias("rel"),
        *[c.alias(n) for n, c in extras.items()],
    )


def parse_filelists(
    docs: DataFrame, doc_col: str = "filelists_xml", repo_col: str = "repo_id"
) -> DataFrame:
    """filelists.xml -> pkgid + version + file/dir counts (the reference
    splits entries into files vs type="dir" directories,
    repodata.py:151-163)."""
    chunk = F.col("chunk")
    return _parse_versioned(
        docs,
        doc_col,
        repo_col,
        {
            "file_count": F.coalesce(
                F.regexp_count(chunk, F.lit("<file>")), F.lit(0)
            ),
            "dir_count": F.coalesce(
                F.regexp_count(chunk, F.lit('<file type="dir">')), F.lit(0)
            ),
        },
    )


def parse_other(
    docs: DataFrame, doc_col: str = "other_xml", repo_col: str = "repo_id"
) -> DataFrame:
    """other.xml -> pkgid + version + changelog count (repodata.py:239-269
    collects the changelog attr dicts; the count is what the catalog
    keeps)."""
    return _parse_versioned(
        docs,
        doc_col,
        repo_col,
        {
            "changelog_count": F.coalesce(
                F.regexp_count(F.col("chunk"), F.lit("<changelog")), F.lit(0)
            )
        },
    )


def evr_string(epoch: Column, ver: Column, rel: Column) -> Column:
    """packagedcode.rpm.EVR.to_string as referenced by
    repomd.generate_rpm_objects (repomd.py:61-65): "-rel" only when a
    release exists, "epoch:" whenever the epoch attr is present — "0"
    included, a truthy string there."""
    vr = F.when(rel.isNotNull(), F.concat(ver, F.lit("-"), rel)).otherwise(ver)
    return F.when(epoch.isNotNull(), F.concat(epoch, F.lit(":"), vr)).otherwise(vr)


def map_repomd_packages(
    repos: DataFrame,
    repo_col: str = "repo_id",
    base_url_col: str = "base_url",
    repomd_col: str = "repomd_xml",
) -> DataFrame:
    """Full repomd pipeline: parse the three subfiles, combine per
    (repo, pkgid), build rpm catalog rows (repomd.py:92-109
    collect_rpm_packages_from_repomd + generate_rpm_objects).

    The reference's combine_dicts_using_pkgid (repodata.py:27-39) merges
    later dicts over earlier ones, so the version attrs come from
    other/filelists (primary's own <version> element is never read there)
    — mirrored by taking epoch/ver/rel from other.xml first, filelists
    second. Join keys are (repo, pkgid): packages co-group per repo, and
    the three sides share the partitioning so AQE plans one shuffle per
    side and no repo's packages cross partitions.
    """
    keep = (repo_col, base_url_col, repomd_col)
    primary = parse_primary(
        repos.select(repo_col, "primary_xml"), "primary_xml", repo_col
    )
    fl = parse_filelists(
        repos.select(repo_col, "filelists_xml"), "filelists_xml", repo_col
    ).select(
        repo_col,
        "pkgid",
        F.col("epoch").alias("fl_epoch"),
        F.col("ver").alias("fl_ver"),
        F.col("rel").alias("fl_rel"),
        "file_count",
        "dir_count",
    )
    other = parse_other(
        repos.select(repo_col, "other_xml"), "other_xml", repo_col
    ).select(
        repo_col,
        "pkgid",
        F.col("epoch").alias("o_epoch"),
        F.col("ver").alias("o_ver"),
        F.col("rel").alias("o_rel"),
        "changelog_count",
    )
    meta = repos.select(
        repo_col,
        F.col(base_url_col).alias("base_url"),
        repomd_href(repomd_col, "primary").alias("primary_href"),
        repomd_href(repomd_col, "filelists").alias("filelists_href"),
        repomd_href(repomd_col, "other").alias("other_href"),
    )
    combined = (
        primary.join(other, [repo_col, "pkgid"], "left")
        .join(fl, [repo_col, "pkgid"], "left")
        .join(meta, repo_col, "left")
    )
    # other.xml wins over filelists.xml for version attrs — reference merge
    # order (primary + other + filelists would have filelists last, but the
    # two always agree in real repodata; the reference's dict update makes
    # the LAST one win, which is filelists):
    epoch = F.coalesce(F.col("fl_epoch"), F.col("o_epoch"))
    ver = F.coalesce(F.col("fl_ver"), F.col("o_ver"))
    rel = F.coalesce(F.col("fl_rel"), F.col("o_rel"))
    version = evr_string(epoch, ver, rel)
    return combined.select(
        F.col(repo_col),
        F.lit("rpm").alias("type"),
        "name",
        "arch",
        version.alias("version"),
        F.concat(F.lit("pkg:rpm/"), F.col("name"), F.lit("@"), version).alias(
            "purl"
        ),
        "pkgid",
        "summary",
        "description",
        "homepage_url",
        "extracted_license_statement",
        "vendor",
        "rpm_group",
        "buildhost",
        "sourcerpm",
        build_rpm_download_url(F.col("base_url"), F.col("href")).alias(
            "download_url"
        ),
        "pkg_size",
        "installed_size",
        "build_time",
        "file_count",
        "dir_count",
        "changelog_count",
        "requires_count",
        "provides_count",
        "primary_href",
    )


def repomd_urls_from_listing(
    listings: DataFrame,
    path_col: str = "path",
    base_url_col: str = "base_url",
    file_names: tuple[str, ...] = ("repomd.xml",),
) -> DataFrame:
    """Seed collection: directory-listing entries whose path ends in
    repomd.xml, joined onto the repo's http base url
    (repodata_rpms.collect_rsync_urls, repodata_rpms.py:32-44; the rsync
    seeds are rewritten rsync:// -> http:// there, done by the caller
    here)."""
    path = F.col(path_col)
    ends = F.aggregate(
        F.array(*[F.lit(n) for n in file_names]),
        F.lit(False),
        lambda acc, n: acc | F.endswith(path, n),
    )
    return listings.filter(ends & ~path.startswith("/")).select(
        F.concat(F.col(base_url_col), path).alias("uri")
    )
