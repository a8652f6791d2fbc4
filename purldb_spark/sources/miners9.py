"""Per-ecosystem miner mappers, batch 9: openwrt (.ipk control
paragraphs), gstreamer (dist file URLs), freedesktop (project wiki
pages), googlecode (archive API v1/v2 JSON), openssl (ftp listing
rows). Same design as sources/miners*.py — pure column expressions, no
Python UDFs:

- openwrt (minecode/miners/openwrt.py:126-170 build_packages): the
  extracted ipk control file as debian-822 fields — Package/Version/
  Description/Installed-Size, Depends -> pkg:openwrt purls, Maintainer
  name/email split (debutils.parse_email), License declared, Section +
  Architecture keywords.
- gstreamer (minecode/miners/gstreamer.py:89-111
  build_package_from_url): dist URL -> name/version by rpartition on
  the LAST dash of the full file name — the version keeps the archive
  extension (the reference splits file_name, not the
  extension-stripped variant, gstreamer.py:100-101; quirk kept),
  dash-less names yield no package.
- freedesktop (minecode/miners/freedesktop.py:66-96 build_packages):
  wiki-page h1 as the description, the first matching freedesktop.org
  link per category (releases//dist/ download, bugs buglist tracker,
  cgit tree/ code view; the reference's loop keeps the LAST match —
  mirrored), li items starting git:// as git+ vcs urls.
- googlecode (minecode/miners/googlecode.py:193-286
  build_packages_from_projectsjson_v2/_v1): v2 joins summary+
  description (blank parts dropped); v1 requires a name and carries
  ancestorRepo vcs + domain namespace; both strip label keywords. The
  reference iterates `labels` unguarded (None crashes it); absent
  labels are an empty list here.
- openssl (minecode/miners/openssl.py:118-157 build_packages): ftp
  listing rows -> type "generic" packages named by the file, version =
  the name with openssl-/archive/checksum suffixes stripped, constant
  project fields (homepage/vcs/code-view/bug-tracker/license/copyright
  as the reference hardcodes them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _field(doc: Column, field: str) -> Column:
    return F.nullif(
        F.regexp_extract(doc, f"(?m)^{field}: ?(.*)$", 1), F.lit("")
    )


# ---------------------------------------------------------------- openwrt --


def map_openwrt_docs(docs: DataFrame, control_col: str = "control") -> DataFrame:
    """ipk control paragraphs -> catalog rows (openwrt.py:126-170)."""
    c = F.col(control_col)
    maint = _field(c, "Maintainer")
    m_name = F.nullif(F.trim(F.substring_index(maint, "<", 1)), F.lit(""))
    m_email = F.nullif(
        F.trim(F.regexp_extract(maint, "<([^>]*)>?", 1)), F.lit("")
    )
    depends = _field(c, "Depends")
    deps = F.when(
        depends.isNotNull(),
        F.array_join(
            F.transform(
                F.split(depends, ","),
                lambda d: F.concat(
                    F.lit("pkg:openwrt/"),
                    F.regexp_extract(F.trim(d), r"^([^\s(]+)", 1),
                ),
            ),
            "; ",
        ),
    )
    name, ver = _field(c, "Package"), _field(c, "Version")
    keywords = F.concat_ws(
        "; ",
        _field(c, "Section"),
        _field(c, "Architecture"),
    )
    return docs.select(
        F.lit("openwrt").alias("type"),
        name.alias("name"),
        ver.alias("version"),
        F.concat_ws("@", F.concat(F.lit("pkg:openwrt/"), name), ver).alias("purl"),
        # Description is a folded control field: keep the continuation
        # lines with their single leading space, strip only the first
        # line's separator space (ipk-fixture-verified reference shape)
        F.nullif(
            F.regexp_replace(
                F.regexp_extract(
                    c, r"(?m)^Description:(.*(?:\n .*)*)", 1
                ),
                r"^ +",
                "",
            ),
            F.lit(""),
        ).alias("description"),
        _field(c, "Installed-Size").cast("long").alias("size"),
        deps.alias("dependencies"),
        m_name.alias("maintainer_name"),
        m_email.alias("maintainer_email"),
        _field(c, "License").alias("declared_license"),
        F.nullif(keywords, F.lit("")).alias("keywords"),
        F.lit("openwrt_metadata").alias("datasource_id"),
    )


# -------------------------------------------------------------- gstreamer --


def map_gstreamer_urls(docs: DataFrame, uri_col: str = "uri") -> DataFrame:
    """Dist archive URLs -> catalog rows (gstreamer.py:89-111)."""
    uri = F.col(uri_col)
    fname = F.substring_index(uri, "/", -1)
    stripped = fname
    for ext in (".tar.bz2", ".tar.gz", ".tar.xz"):
        stripped = F.replace(stripped, F.lit(ext), F.lit(""))
    # rpartition("-") on the FULL file name (reference quirk: the version
    # keeps the extension)
    proj = F.regexp_extract(fname, r"^(.*)-[^-]*$", 1)
    version = F.regexp_extract(fname, r"-([^-]*)$", 1)
    return (
        docs.filter(stripped.contains("-"))
        .select(
            F.lit("gstreamer").alias("type"),
            proj.alias("name"),
            version.alias("version"),
            F.concat(
                F.lit("pkg:gstreamer/"), proj, F.lit("@"), version
            ).alias("purl"),
            uri.alias("download_url"),
            F.lit("https://gstreamer.freedesktop.org").alias("homepage_url"),
        )
    )


# ------------------------------------------------------------ freedesktop --


def map_freedesktop_pages(
    docs: DataFrame,
    html_col: str = "html",
    uri_col: str = "uri",
    purl_col: str = "package_url",
) -> DataFrame:
    """Project wiki HTML -> catalog rows (freedesktop.py:66-96). The
    reference walks anchors with BeautifulSoup keeping the last match
    per category; the machine-written wiki pages are regular enough for
    anchor-href regexes, which stay in codegen."""
    html = F.col(html_col)
    purl = F.col(purl_col)

    # BeautifulSoup hands the reference DECODED attribute values — undo
    # the common HTML entities in extracted hrefs (&amp; in query strings
    # is the one that actually appears in the wiki pages)
    def _unescape(c: Column) -> Column:
        for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'")):
            c = F.replace(c, F.lit(ent), F.lit(ch))
        return c

    hrefs = F.transform(
        F.regexp_extract_all(html, F.lit(r'<a[^>]*\bhref="([^"]*)"'), 1),
        _unescape,
    )
    fd = F.filter(hrefs, lambda h: h.contains("freedesktop.org"))
    # try_element_at: the -1 "last match" read must yield null, not raise,
    # on pages with no match (ANSI element_at throws on empty arrays)
    last = lambda arr: F.try_element_at(arr, F.lit(-1))  # noqa: E731
    dl = last(
        F.filter(fd, lambda h: h.contains("/releases/") | h.contains("/dist/"))
    )
    bug = last(
        F.filter(
            fd, lambda h: h.contains("https://bugs.freedesktop.org/buglist.cgi")
        )
    )
    code = last(
        F.filter(
            fd,
            lambda h: h.contains("http://cgit.freedesktop.org/")
            & h.contains("tree/"),
        )
    )
    lis = F.regexp_extract_all(html, F.lit(r"(?s)<li>(.*?)</li>"), 1)
    git = last(
        F.filter(
            F.transform(lis, lambda x: F.trim(F.regexp_replace(x, "<[^>]*>", ""))),
            lambda x: x.startswith("git://"),
        )
    )
    h1 = F.nullif(
        F.trim(F.regexp_extract(html, r"(?s)<h1[^>]*>(.*?)</h1>", 1)), F.lit("")
    )
    pname = F.nullif(
        F.regexp_extract(purl, r"^pkg:[^/@]+/(?:[^/@]+/)?([^/@?]+)", 1), F.lit("")
    )
    pver = F.nullif(F.regexp_extract(purl, r"@([^?#]+)", 1), F.lit(""))
    return docs.select(
        F.lit("freedesktop").alias("type"),
        pname.alias("name"),
        pver.alias("version"),
        purl.alias("purl"),
        h1.alias("description"),
        F.col(uri_col).alias("homepage_url"),
        dl.alias("download_url"),
        bug.alias("bug_tracking_url"),
        code.alias("code_view_url"),
        F.when(git.isNotNull(), F.concat(F.lit("git+"), git)).alias("vcs_url"),
    )


# ------------------------------------------------------------- googlecode --

_GC_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("license", T.StringType()),
        T.StructField("labels", T.ArrayType(T.StringType())),
        T.StructField("ancestorRepo", T.StringType()),
        T.StructField("domain", T.StringType()),
    ]
)


def _gc_keywords(j: Column) -> Column:
    return F.when(
        j["labels"].isNotNull(),
        F.nullif(
            F.array_join(
                F.filter(
                    F.transform(j["labels"], lambda x: F.trim(x)),
                    lambda x: x.isNotNull() & (x != ""),
                ),
                "; ",
            ),
            F.lit(""),
        ),
    )


def map_googlecode_v2_docs(
    docs: DataFrame, json_col: str = "doc", purl_col: str | None = None
) -> DataFrame:
    """Archive API v2 project JSON -> catalog rows
    (googlecode.py:193-228). When ``purl_col`` carries the frontier's
    package_url (built by the visitor with the archive DOMAIN as the
    namespace, e.g. pkg:googlecode/apache-extras.org/<name>), set_purl
    overrides the purl fields — namespace included — exactly like the
    reference's package.set_purl(purl)."""
    j = F.from_json(F.col(json_col), _GC_SCHEMA)
    desc = F.nullif(
        F.array_join(
            F.filter(
                F.array(j["summary"], j["description"]),
                lambda d: d.isNotNull() & (F.trim(d) != ""),
            ),
            "\n",
        ),
        F.lit(""),
    )
    name = j["name"]
    if purl_col:
        purl = F.col(purl_col)
        ns = F.nullif(
            F.regexp_extract(purl, r"^pkg:googlecode/(?:(.+)/)?[^/@]+$", 1),
            F.lit(""),
        )
    else:
        purl = F.concat(F.lit("pkg:googlecode/"), name)
        ns = F.lit(None).cast("string")
    return docs.select(
        F.lit("googlecode").alias("type"),
        name.alias("name"),
        ns.alias("namespace"),
        purl.alias("purl"),
        desc.alias("description"),
        j["license"].alias("extracted_license_statement"),
        _gc_keywords(j).alias("keywords"),
        F.lit(None).cast("string").alias("vcs_url"),
        F.lit("googlecode_api_json").alias("datasource_id"),
    )


def map_googlecode_v1_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """Archive API v1 project.json -> catalog rows (googlecode.py:244-286);
    nameless docs dropped."""
    j = F.from_json(F.col(json_col), _GC_SCHEMA)
    name = j["name"]
    return docs.filter(name.isNotNull()).select(
        F.lit("googlecode").alias("type"),
        name.alias("name"),
        j["domain"].alias("namespace"),
        F.concat(
            F.lit("pkg:googlecode/"),
            F.when(j["domain"].isNotNull(), F.concat(j["domain"], F.lit("/"))).otherwise(
                F.lit("")
            ),
            name,
        ).alias("purl"),
        j["description"].alias("description"),
        j["license"].alias("extracted_license_statement"),
        _gc_keywords(j).alias("keywords"),
        j["ancestorRepo"].alias("vcs_url"),
        F.lit("googlecode_json").alias("datasource_id"),
    )


# ---------------------------------------------------------------- openssl --

_OPENSSL_DESC = (
    "The OpenSSL Project is a collaborative effort to develop a robust, "
    "commercial-grade, fully featured, and Open Source toolkit implementing "
    "the Transport Layer Security (TLS) protocols (including SSLv3) as well "
    "as a full-strength general purpose cryptographic library."
)
_OPENSSL_COPYRIGHT = (
    "Copyright (c) 1998-2018 The OpenSSL Project\n"
    "Copyright (c) 1995-1998 Eric A. Young, Tim J. Hudson\n"
    "All rights reserved."
)


def map_openssl_listing(
    docs: DataFrame,
    uri_col: str = "uri",
    size_col: str = "size",
    date_col: str = "last_modified_date",
) -> DataFrame:
    """ftp.openssl.org listing rows -> type "generic" catalog rows
    (openssl.py:118-157)."""
    uri = F.col(uri_col)
    fname = F.substring_index(uri, "/", -1)
    version = fname
    for sfx in (".tar.gz", "openssl-", ".asc", ".md5", ".sha1", ".sha256"):
        version = F.replace(version, F.lit(sfx), F.lit(""))
    return docs.select(
        F.lit("generic").alias("type"),
        fname.alias("name"),
        version.alias("version"),
        F.concat(F.lit("pkg:generic/"), fname, F.lit("@"), version).alias("purl"),
        F.lit(_OPENSSL_DESC).alias("description"),
        F.col(size_col).cast("long").alias("size"),
        F.col(date_col).alias("release_date"),
        F.lit("OpenSSL License").alias("extracted_license_statement"),
        F.lit("https://www.openssl.org/").alias("homepage_url"),
        uri.alias("download_url"),
        F.lit(_OPENSSL_COPYRIGHT).alias("copyright"),
        F.lit("git+https://github.com/openssl/openssl.git").alias("vcs_url"),
        F.lit("https://github.com/openssl/openssl").alias("code_view_url"),
        F.lit("https://github.com/openssl/openssl/issues").alias(
            "bug_tracking_url"
        ),
        F.lit("openssl_metadeta").alias("datasource_id"),
    )


_GC_DL_SCHEMA = T.StructType(
    [
        T.StructField("pageNumber", T.IntegerType()),
        T.StructField("totalPages", T.IntegerType()),
        T.StructField(
            "downloads",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("filename", T.StringType()),
                        T.StructField("releaseDate", T.LongType()),
                        T.StructField("fileSize", T.LongType()),
                        T.StructField("sha1Checksum", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def googlecode_downloads_uris(
    docs: DataFrame, json_col: str = "doc", uri_col: str = "uri"
) -> DataFrame:
    """Google Code archive downloads-page JSON -> per-file download URIs
    (+ the next page while pageNumber < totalPages)
    (GoogleDownloadsPageJsonVisitor, minecode/miners/googlecode.py:124-170):
    filenames of the form name_version.ext split into a versioned purl,
    anything else keeps the whole filename as the purl name; releaseDate
    is a unix timestamp rendered as local (=UTC here) datetime."""
    j = F.from_json(F.col(json_col), _GC_DL_SCHEMA)
    base = docs.select(
        F.col(uri_col).alias("source_uri"),
        j["pageNumber"].alias("_p"),
        j["totalPages"].alias("_t"),
        j["downloads"].alias("_dls"),
    )
    root = F.regexp_replace(
        F.col("source_uri"), r"downloads-page-\d+\.json$", ""
    )
    nxt = base.filter(F.col("_p") < F.col("_t")).select(
        F.concat(
            root,
            F.lit("downloads-page-"),
            (F.col("_p") + 1).cast("string"),
            F.lit(".json"),
        ).alias("uri"),
        F.lit(None).cast("string").alias("package_url"),
        F.lit(None).cast("string").alias("file_name"),
        F.lit(None).cast("long").alias("size"),
        F.lit(None).cast("string").alias("date"),
        F.lit(None).cast("string").alias("sha1"),
        "source_uri",
    )
    d = F.col("d")
    fname = d["filename"]
    versioned = fname.contains("_") & fname.contains(".")
    # reference splits on the FIRST underscore then drops the last
    # extension: a_b_c.jar -> name a, version b_c
    pname = F.substring_index(fname, "_", 1)
    version = F.regexp_extract(fname, r"^[^_]*_(.*)\.[^.]*$", 1)
    purl = F.when(
        versioned,
        F.concat(F.lit("pkg:googlecode/"), pname, F.lit("@"), version),
    ).otherwise(F.concat(F.lit("pkg:googlecode/"), fname))
    files = base.select(
        "source_uri", root.alias("_root"), F.explode("_dls").alias("d")
    ).select(
        F.concat(F.col("_root"), fname).alias("uri"),
        purl.alias("package_url"),
        fname.alias("file_name"),
        d["fileSize"].alias("size"),
        F.date_format(
            F.to_timestamp(d["releaseDate"]), "yyyy-MM-dd HH:mm:ss"
        ).alias("date"),
        d["sha1Checksum"].alias("sha1"),
        "source_uri",
    )
    return nxt.unionByName(files)
