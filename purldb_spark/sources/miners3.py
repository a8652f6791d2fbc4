"""Per-ecosystem miner mappers, batch 3: alpine (APKINDEX), cran (CRAN DB
API), conda (repodata.json), sourceforge (project JSON API), fdroid
(index-v2 package entries). Same design as sources/miners.py and
miners2.py — fetching stays on the rate-limited frontier; the mapping from
fetched documents to catalog rows is pure column expressions (from_json /
str parsing + explode + projection, whole-stage codegen, no Python UDFs):

- alpine: APKINDEX text blocks (blank-line separated, one-letter keys;
  minecode/miners/alpine.py:67-121 parse_apkindex + build_packages:16-64);
  the Q1-prefixed base64 checksum decodes to a sha1 hex digest
  (apk_checksum_to_sha1, alpine.py:128-145), maintainer splits into
  name/email on '<' (minecode/debutils.py:11-22 parse_email).
- cran: CRAN DB API versions map (minecode/miners/cran.py:196-250
  build_packages): one row per version, optionally filtered to the purl
  version; download_url is the synthesized src/contrib tarball URL.
- conda: repodata.json packages / packages.conda maps keyed by the package
  identifier (minecode/miners/conda.py:15-82 build_packages); the .conda
  suffix selects the packages.conda map; dependency purls use type
  ``conan`` exactly like the reference does (conda.py:46 — kept verbatim
  for parity); conda-forge rows merge description/homepage/dev_url from
  the channel info document.
- sourceforge: project JSON API (minecode/miners/sourceforge.py:106-178
  build_packages_from_metafile): summary+short_description join, shortname
  fallback, developers -> contributor parties, categories.language ->
  primary_language, categories.license -> [shortname, fullname] pairs
  (both gated on fullname presence, the reference's quirk kept),
  categories.topic -> keywords.
- fdroid: index-v2 package entry (minecode/miners/fdroid.py:116-238
  build_packages): per version TWO rows — the source tarball row and the
  apk row carrying source_packages=[source purl]; description is the
  en-US name/summary/description chain with startswith dedup
  (build_description, fdroid.py:240-288). The source-purl qualifier keeps
  the raw download URL (percent-encoding is a purl-renderer detail).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- alpine --


def parse_apkindex_blocks(
    docs: DataFrame, text_col: str = "apkindex", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """APKINDEX text -> one row per package block with a `f` map of the
    one-letter fields (alpine.py:67-121): blocks split on blank lines,
    lines without ':' skipped, keys/values trimmed."""
    blocks = docs.select(
        *keep_cols,
        F.explode(F.split(F.col(text_col), r"\n[ \t]*\n")).alias("block"),
    ).filter(F.trim(F.col("block")) != "")
    fields = F.expr(
        "map_from_entries(transform("
        "  filter(split(block, '\\n'), l -> instr(l, ':') > 0),"
        "  l -> struct(trim(substring_index(l, ':', 1)) AS key,"
        "              trim(substring(l, instr(l, ':') + 1)) AS value)))"
    )
    return blocks.select(*keep_cols, fields.alias("f"))


def map_alpine_blocks(
    docs: DataFrame, text_col: str = "apkindex", url_col: str = "download_url"
) -> DataFrame:
    """APKINDEX blocks -> catalog rows (build_packages, alpine.py:16-64).
    The reference maps one named package per collect request; the batch
    shape maps every block — a superset with identical per-row fields."""
    f = F.col("f")
    checksum = f["C"]
    sha1 = F.when(
        checksum.startswith("Q1"),
        F.lower(F.hex(F.unbase64(F.expr("substring(f['C'], 3)")))),
    )
    maintainer = f["m"]
    m_name = F.expr("nullif(trim(substring_index(f['m'], '<', 1)), '')")
    m_email = F.expr(
        "nullif(trim(regexp_extract(f['m'], '<([^>]*)>?', 1)), '')"
    )
    return (
        parse_apkindex_blocks(docs, text_col, keep_cols=(url_col,))
        .filter(f["P"].isNotNull())
        .select(
            F.lit("apk").alias("type"),
            f["P"].alias("name"),
            f["V"].alias("version"),
            F.concat(F.lit("pkg:apk/"), f["P"], F.lit("@"), f["V"]).alias("purl"),
            f["T"].alias("description"),
            f["U"].alias("repository_homepage_url"),
            f["L"].alias("extracted_license_statement"),
            f["S"].cast("long").alias("size"),
            sha1.alias("sha1"),
            F.when(maintainer.isNotNull(), m_name).alias("maintainer_name"),
            F.when(maintainer.isNotNull(), m_email).alias("maintainer_email"),
            F.col(url_col).alias("download_url"),
            F.lit("alpine_metadata").alias("datasource_id"),
        )
    )


# ------------------------------------------------------------------ cran --

CRAN_VERSION_SCHEMA = T.StructType(
    [
        T.StructField("Description", T.StringType()),
        T.StructField("URL", T.StringType()),
        T.StructField("License", T.StringType()),
        T.StructField("Author", T.StringType()),
    ]
)

CRAN_DOC_SCHEMA = T.StructType(
    [
        T.StructField("Package", T.StringType()),
        T.StructField("versions", T.MapType(T.StringType(), CRAN_VERSION_SCHEMA)),
    ]
)


def map_cran_docs(
    docs: DataFrame, json_col: str = "doc", version_col: str | None = None
) -> DataFrame:
    """CRAN DB API documents -> one catalog row per version
    (cran.py:196-250 build_packages): when a purl version is given
    (`version_col`), other versions are skipped; the download URL is the
    synthesized src/contrib tarball."""
    j = F.from_json(F.col(json_col), CRAN_DOC_SCHEMA)
    keep = [F.col(version_col).alias("__want")] if version_col else []
    out = docs.select(
        j["Package"].alias("name"),
        *keep,
        F.explode(j["versions"]).alias("version", "info"),
    )
    if version_col:
        out = out.filter(
            F.col("__want").isNull() | (F.col("__want") == F.col("version"))
        )
    info = F.col("info")
    return out.select(
        F.lit("cran").alias("type"),
        F.col("name"),
        F.col("version"),
        F.concat(
            F.lit("pkg:cran/"), F.col("name"), F.lit("@"), F.col("version")
        ).alias("purl"),
        info["Description"].alias("description"),
        info["URL"].alias("homepage_url"),
        info["License"].alias("extracted_license_statement"),
        info["Author"].alias("author"),
        F.concat(
            F.lit("https://cran.r-project.org/src/contrib/"),
            F.col("name"),
            F.lit("_"),
            F.col("version"),
            F.lit(".tar.gz"),
        ).alias("download_url"),
        F.lit("cran_api_metadata").alias("datasource_id"),
    )


# ----------------------------------------------------------------- conda --

CONDA_PKG_SCHEMA = T.StructType(
    [
        T.StructField("sha256", T.StringType()),
        T.StructField("md5", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("license", T.StringType()),
        T.StructField("depends", T.ArrayType(T.StringType())),
    ]
)

CONDA_REPODATA_SCHEMA = T.StructType(
    [
        T.StructField("packages", T.MapType(T.StringType(), CONDA_PKG_SCHEMA)),
        T.StructField("packages.conda", T.MapType(T.StringType(), CONDA_PKG_SCHEMA)),
    ]
)

CONDA_FORGE_INFO_SCHEMA = T.StructType(
    [
        T.StructField("description", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("html_url", T.StringType()),
        T.StructField("dev_url", T.StringType()),
        T.StructField("license", T.StringType()),
    ]
)


def map_conda_docs(
    docs: DataFrame,
    repodata_col: str = "doc",
    identifier_col: str = "identifier",
    name_col: str = "name",
    namespace_col: str = "namespace",
    version_col: str = "version",
    url_col: str = "download_url",
    info_col: str = "package_info",
) -> DataFrame:
    """repodata.json + package identifier -> catalog row
    (conda.py:15-82 build_packages): the .conda suffix selects the
    packages.conda map, missing identifiers yield nothing; dependency
    purls keep the reference's ``conan`` type verbatim (conda.py:46);
    conda-forge rows merge the channel info document."""
    j = F.from_json(F.col(repodata_col), CONDA_REPODATA_SCHEMA)
    ident = F.col(identifier_col)
    meta = F.when(
        ident.endswith(".conda"), j["packages.conda"][ident]
    ).otherwise(j["packages"][ident])
    pi = F.from_json(F.col(info_col), CONDA_FORGE_INFO_SCHEMA)
    forge = (F.col(namespace_col) == "conda-forge") & F.col(info_col).isNotNull()
    rows = docs.select(
        F.col(name_col).alias("name"),
        F.col(namespace_col).alias("namespace"),
        F.col(version_col).alias("version"),
        F.col(url_col).alias("download_url"),
        meta.alias("meta"),
        pi.alias("pi"),
        forge.alias("is_forge"),
    ).filter(F.col("meta").isNotNull())
    meta = F.col("meta")
    pi = F.col("pi")
    licenses = F.concat(
        F.when(meta["license"].isNotNull(), F.array(meta["license"])).otherwise(
            F.array().cast("array<string>")
        ),
        F.when(
            F.col("is_forge") & pi["license"].isNotNull(), F.array(pi["license"])
        ).otherwise(F.array().cast("array<string>")),
    )
    deps = F.expr(
        "transform(coalesce(meta.depends, array()),"
        " d -> concat('pkg:conan/', split_part(d, ' ', 1)))"
    )
    return rows.select(
        F.lit("conda").alias("type"),
        F.col("name"),
        F.col("namespace"),
        F.col("version"),
        F.concat(
            F.lit("pkg:conda/"),
            F.col("namespace"),
            F.lit("/"),
            F.col("name"),
            F.lit("@"),
            F.col("version"),
        ).alias("purl"),
        F.when(
            F.col("is_forge"), F.coalesce(pi["description"], pi["summary"])
        ).alias("description"),
        F.when(F.col("is_forge"), pi["html_url"]).alias("homepage_url"),
        F.when(F.col("is_forge"), pi["dev_url"]).alias("repository_homepage_url"),
        meta["sha256"].alias("sha256"),
        meta["md5"].alias("md5"),
        meta["size"].alias("size"),
        licenses.alias("extracted_license_statement"),
        deps.alias("dependencies"),
        F.col("download_url"),
        F.lit("conda_api_metadata").alias("datasource_id"),
    )


# ----------------------------------------------------------- sourceforge --

SF_DOC_SCHEMA = T.StructType(
    [
        T.StructField("summary", T.StringType()),
        T.StructField("short_description", T.StringType()),
        T.StructField("shortname", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("external_homepage", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField(
            "developers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("url", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "categories",
            T.StructType(
                [
                    T.StructField(
                        "language",
                        T.ArrayType(
                            T.StructType([T.StructField("shortname", T.StringType())])
                        ),
                    ),
                    T.StructField(
                        "license",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("shortname", T.StringType()),
                                    T.StructField("fullname", T.StringType()),
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "topic",
                        T.ArrayType(
                            T.StructType([T.StructField("shortname", T.StringType())])
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def map_sourceforge_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """Sourceforge project JSON -> catalog row (sourceforge.py:106-178
    build_packages_from_metafile): rows without any name are dropped; the
    license statement interleaves [shortname, fullname] per entry with
    BOTH gated on fullname presence (the reference's quirk, kept)."""
    j = F.from_json(F.col(json_col), SF_DOC_SCHEMA)
    rows = docs.select(j.alias("j")).filter(
        F.coalesce(F.col("j.shortname"), F.col("j.name")).isNotNull()
    )
    j = F.col("j")
    description = F.nullif(
        F.concat_ws(
            "\n",
            F.expr(
                "filter(array(j.summary, j.short_description),"
                " d -> d IS NOT NULL AND trim(d) <> '')"
            ),
        ),
        F.lit(""),
    )
    licenses = F.expr(
        "flatten(transform("
        "  filter(coalesce(j.categories.license, array()),"
        "         l -> l.fullname IS NOT NULL),"
        "  l -> array(l.shortname, l.fullname)))"
    )
    langs = F.expr(
        "nullif(array_join(transform(coalesce(j.categories.language, array()),"
        " x -> x.shortname), ', '), '')"
    )
    keywords = F.expr(
        "transform(coalesce(j.categories.topic, array()), x -> x.shortname)"
    )
    contributors = F.expr(
        "transform(filter(coalesce(j.developers, array()),"
        " d -> d.name IS NOT NULL), d -> d.name)"
    )
    name = F.coalesce(j["shortname"], j["name"])
    return rows.select(
        F.lit("sourceforge").alias("type"),
        name.alias("name"),
        F.concat(F.lit("pkg:sourceforge/"), name).alias("purl"),
        description.alias("description"),
        # dict.get(key, default) falls back only when the KEY is absent:
        # an empty external_homepage stays (and blanks to NULL in the
        # model), it does NOT fall through to url — visible in the
        # reference's odanur fixture (sourceforge.py:126)
        F.when(
            j["external_homepage"].isNotNull(),
            F.nullif(j["external_homepage"], F.lit("")),
        )
        .otherwise(j["url"])
        .alias("homepage_url"),
        langs.alias("primary_language"),
        licenses.alias("extracted_license_statement"),
        keywords.alias("keywords"),
        contributors.alias("contributors"),
        F.lit("sourceforge_metadata").alias("datasource_id"),
    )


# ---------------------------------------------------------------- fdroid --

FDROID_DOC_SCHEMA = T.StructType(
    [
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("categories", T.ArrayType(T.StringType())),
                    T.StructField("issueTracker", T.StringType()),
                    T.StructField("license", T.StringType()),
                    T.StructField("sourceCode", T.StringType()),
                    T.StructField("webSite", T.StringType()),
                    T.StructField("authorName", T.StringType()),
                    T.StructField("authorEmail", T.StringType()),
                    T.StructField("authorWebSite", T.StringType()),
                    T.StructField(
                        "name", T.MapType(T.StringType(), T.StringType())
                    ),
                    T.StructField(
                        "summary", T.MapType(T.StringType(), T.StringType())
                    ),
                    T.StructField(
                        "description", T.MapType(T.StringType(), T.StringType())
                    ),
                ]
            ),
        ),
        T.StructField(
            "versions",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField(
                            "manifest",
                            T.StructType(
                                [T.StructField("versionCode", T.LongType())]
                            ),
                        ),
                        T.StructField(
                            "src",
                            T.StructType(
                                [
                                    T.StructField("name", T.StringType()),
                                    T.StructField("sha256", T.StringType()),
                                    T.StructField("size", T.LongType()),
                                ]
                            ),
                        ),
                        T.StructField(
                            "file",
                            T.StructType(
                                [
                                    T.StructField("name", T.StringType()),
                                    T.StructField("sha256", T.StringType()),
                                    T.StructField("size", T.LongType()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
        ),
    ]
)

_FDROID_REPO = "https://f-droid.org/repo/"


def _fdroid_description(meta: Column, language: str = "en-US") -> Column:
    """build_description (fdroid.py:240-288): name/summary/description in
    `language`, with a part dropped when the next one starts with it."""
    name = meta["name"][language]
    summary = meta["summary"][language]
    desc = meta["description"][language]
    name_kept = F.when(
        name.isNotNull() & summary.isNotNull() & summary.startswith(name),
        F.lit(None).cast("string"),
    ).otherwise(name)
    summary_kept = F.when(
        summary.isNotNull() & desc.isNotNull() & desc.startswith(summary),
        F.lit(None).cast("string"),
    ).otherwise(summary)
    joined = F.concat_ws(
        "\n",
        F.array_compact(F.array(name_kept, summary_kept, desc)),
    )
    return F.nullif(joined, F.lit(""))


def map_fdroid_docs(
    docs: DataFrame, json_col: str = "doc", name_col: str = "name"
) -> DataFrame:
    """F-Droid index-v2 package entries -> TWO catalog rows per version
    (build_packages, fdroid.py:116-238): the source tarball row, then the
    apk row whose source_packages points at the source row's purl (with
    the raw download URL as qualifier)."""
    j = F.from_json(F.col(json_col), FDROID_DOC_SCHEMA)
    meta = j["metadata"]
    exploded = docs.select(
        F.col(name_col).alias("name"),
        meta["categories"].alias("keywords"),
        meta["issueTracker"].alias("bug_tracking_url"),
        meta["license"].alias("extracted_license_statement"),
        meta["sourceCode"].alias("vcs_url"),
        meta["webSite"].alias("homepage_url"),
        meta["authorName"].alias("author_name"),
        meta["authorEmail"].alias("author_email"),
        _fdroid_description(meta).alias("description"),
        F.explode(j["versions"]).alias("apk_sha", "v"),
    )
    v = F.col("v")
    version = v["manifest"]["versionCode"].cast("string")
    src_url = F.concat(
        F.lit(_FDROID_REPO),
        F.regexp_replace(v["src"]["name"], r"^/+|/+$", ""),
    )
    apk_url = F.concat(
        F.lit(_FDROID_REPO), F.regexp_replace(v["file"]["name"], r"^/+", "")
    )
    shared = [
        F.lit("fdroid").alias("type"),
        F.col("name"),
        version.alias("version"),
        F.concat(F.lit("pkg:fdroid/"), F.col("name"), F.lit("@"), version).alias(
            "purl"
        ),
        F.col("description"),
        F.col("keywords"),
        F.col("bug_tracking_url"),
        F.col("extracted_license_statement"),
        F.col("vcs_url"),
        F.col("homepage_url"),
        F.concat(F.lit("https://f-droid.org/en/packages/"), F.col("name")).alias(
            "repository_homepage_url"
        ),
        F.col("author_name"),
        F.col("author_email"),
        F.lit("fdroid_metadata").alias("datasource_id"),
    ]
    src_rows = exploded.select(
        *shared,
        src_url.alias("download_url"),
        v["src"]["sha256"].alias("sha256"),
        v["src"]["size"].alias("size"),
        F.lit(None).cast("array<string>").alias("source_packages"),
    )
    apk_rows = exploded.select(
        *shared,
        apk_url.alias("download_url"),
        v["file"]["sha256"].alias("sha256"),
        v["file"]["size"].alias("size"),
        F.array(
            F.concat(
                F.lit("pkg:fdroid/"),
                F.col("name"),
                F.lit("@"),
                version,
                F.lit("?download_url="),
                src_url,
            )
        ).alias("source_packages"),
    )
    return src_rows.unionByName(apk_rows)


_CRAN_URL = "https://cloud.r-project.org/"


def _cran_row_cell(html, key: str):
    """The <td> cell following ``<td>KEY</td>`` (dotall)."""
    return F.regexp_extract(html, rf"(?s)<td>\s*{key}\s*</td>\s*<td>(.*?)</td>", 1)


def map_cran_html_docs(
    docs: DataFrame,
    html_col: str = "html",
    uri_col: str = "uri",
    purl_col: str = "purl",
) -> DataFrame:
    """CRAN package web page -> one catalog row per download URL
    (build_packages_from_html, cran.py:91-197): name from the page uri,
    description from the first <p>, License:/URL: cells read as their
    href lists, Maintainer decoded from the page's hex-entity-armored
    "Name <addr at host>" form, and every href in a "...source:" /
    "...binaries:" row turned into an absolute download URL (the
    ../../../ prefix resolves against the CRAN root)."""
    html = F.col(html_col)
    name = F.regexp_extract(F.col(uri_col), r"([^/]+)/[^/]*$", 1)
    first_p = F.regexp_extract(html, r"(?s)<p>(.*?)</p>", 1)
    # BeautifulSoup `.string` yields None for a <p> with nested tags —
    # the reference therefore drops such descriptions (abe fixture)
    description = F.when(
        (first_p != "") & ~first_p.contains("<"), first_p
    )
    version = F.nullif(F.trim(_cran_row_cell(html, "Version:")), F.lit(""))
    published = F.nullif(F.trim(_cran_row_cell(html, "Published:")), F.lit(""))
    author = F.nullif(
        F.trim(F.regexp_replace(_cran_row_cell(html, "Author:"), r"<[^>]+>", "")),
        F.lit(""),
    )
    maint_cell = _cran_row_cell(html, "Maintainer:")
    maint_name = F.nullif(
        F.trim(F.regexp_replace(maint_cell, r"&#x.*$", "")), F.lit("")
    )
    # the address is fully hex-entity-encoded: collect the &#xHH; codes,
    # unhex them back to bytes, decode utf-8 -> "<user at host>"
    maint_decoded = F.decode(
        F.unhex(
            F.array_join(
                F.regexp_extract_all(
                    maint_cell, F.lit(r"&#x([0-9a-fA-F]{2});"), 1
                ),
                "",
            )
        ),
        "UTF-8",
    )
    maint_email = F.nullif(
        F.regexp_replace(
            F.regexp_replace(maint_decoded, r"^<|>$", ""), r" at ", "@"
        ),
        F.lit(""),
    )
    lic_hrefs = F.regexp_extract_all(
        _cran_row_cell(html, "License:"), F.lit(r'href="([^"]+)"'), 1
    )
    url_hrefs = F.regexp_extract_all(
        _cran_row_cell(html, "URL:"), F.lit(r'href="([^"]+)"'), 1
    )
    # rows whose KEY contains source/binaries (&nbsp; separates words in
    # the raw key text): pull every href from the value cell
    dl_cells = F.regexp_extract_all(
        html,
        F.lit(
            r"(?s)<td>[^<]*(?:source|binaries|sources)[^<]*</td>\s*<td>(.*?)</td>"
        ),
        1,
    )
    dl_urls = F.flatten(
        F.transform(
            dl_cells,
            lambda c: F.transform(
                F.regexp_extract_all(c, F.lit(r'href="([^"]+)"'), 1),
                lambda h: F.replace(h, F.lit("../../../"), F.lit(_CRAN_URL)),
            ),
        )
    )
    base = docs.select(
        F.lit("cran").alias("type"),
        name.alias("name"),
        version.alias("version"),
        F.col(purl_col).alias("purl"),
        description.alias("description"),
        F.nullif(F.array_join(url_hrefs, "\n"), F.lit("")).alias("homepage_url"),
        lic_hrefs.alias("extracted_license_statement"),
        author.alias("author"),
        maint_name.alias("maintainer"),
        maint_email.alias("maintainer_email"),
        published.alias("release_date"),
        F.lit("cran_metadata").alias("datasource_id"),
        dl_urls.alias("_dls"),
    )
    # explode_outer, not when(size>0, dls).otherwise(array(NULL)) + explode:
    # the row sets are identical (dl_urls is never NULL; an empty array
    # yields one NULL download_url either way), but the non-outer form lets
    # InferFiltersFromGenerate push a size(_dls)>0 predicate below the
    # projection, where it re-inlines the whole page-build + download-row
    # regex FOUR more times per row (measured r15: 4 extra copies of the
    # html concat in the optimized plan, ~4x the query's real work)
    return base.select(
        "*", F.explode_outer("_dls").alias("download_url")
    ).drop("_dls")
