"""Per-ecosystem miner mappers — the parse/map stage of the reference's
miner registry (minecode/miners/: 44 modules of Visitor + Mapper classes).

Network fetch stays driver-side / mapPartitions (politeness-limited, T7).
THIS module is the per-ecosystem mapping from raw mined documents to catalog
package rows, expressed as pure column expressions (JVM-side, whole-stage
codegen) so a billion-record index maps in one projection:

- maven: Nexus-index artifact records -> jar + POM URI rows with purl,
  repo-layout download URL and filename (minecode/miners/maven.py:144-253,
  URL/filename builders minecode/pipes/maven.py:540-556 / packagedcode
  build_filename: '{artifact}-{version}[-{classifier}].{ext}' under
  '{base}/{group with . -> /}/{artifact}/{version}/').
- pypi: registry JSON documents ({"info": ..., "urls": [...]}) -> one
  package row per download (minecode/miners/pypi.py:145-292
  build_packages: summary+description join, UNKNOWN-license fallback to
  License:: classifiers, sdist/bdist datasource ids, ?file_name= purl
  qualifier).
- debian: RFC822 'Packages' index paragraphs -> package rows
  (minecode/miners/debian.py:516-562 parse_packages: Tag/Section keywords,
  implemented-in:: primary language, maintainer name/email split,
  ftp.debian.org download url).

Every mapper takes a DataFrame with a declared input schema and returns
catalog rows; parsing (gzip, JSON, RFC822) happens with Spark primitives
(from_json, split + regexp_extract) — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAVEN_REPO = "https://repo1.maven.org/maven2"
DEBIAN_BASE = "http://ftp.debian.org/debian"

# ----------------------------------------------------------------- maven --

MAVEN_ARTIFACT_SCHEMA = T.StructType(
    [
        T.StructField("group_id", T.StringType()),
        T.StructField("artifact_id", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("extension", T.StringType()),
        T.StructField("classifier", T.StringType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("size", T.LongType()),
    ]
)


def _maven_filename(
    artifact: Column, version: Column, extension: Column, classifier: Column
) -> Column:
    """packagedcode build_filename: artifact-version[-classifier].ext."""
    return F.concat(
        artifact,
        F.lit("-"),
        version,
        F.when(classifier.isNotNull(), F.concat(F.lit("-"), classifier)).otherwise(
            F.lit("")
        ),
        F.lit("."),
        extension,
    )


def _maven_url(group: Column, artifact: Column, version: Column, file_name: Column) -> Column:
    """Repo-layout URL: base/{group . -> /}/{artifact}/{version}/{file}."""
    return F.concat_ws(
        "/", F.lit(MAVEN_REPO), F.replace(group, F.lit("."), F.lit("/")), artifact, version, file_name
    )


def map_maven_artifacts(records: DataFrame) -> DataFrame:
    """Nexus index records -> two URI rows each, like the reference visitor
    (minecode/miners/maven.py:203-253): the artifact row (visited,
    mining_level 0, with size/sha1 and the type/classifier purl qualifiers)
    and the POM row (to visit, mining_level 20, bare purl).

    Qualifiers: type only when extension != 'jar'; classifier when present;
    rendered in purl-spec alphabetical order (classifier < type)."""
    g, a, v = F.col("group_id"), F.col("artifact_id"), F.col("version")
    ext, cls = F.col("extension"), F.col("classifier")
    qualifiers = F.nullif(
        F.concat_ws(
            "&",
            F.when(cls.isNotNull(), F.concat(F.lit("classifier="), cls)),
            F.when(ext != "jar", F.concat(F.lit("type="), ext)),
        ),
        F.lit(""),
    )
    base_purl = F.concat(F.lit("pkg:maven/"), g, F.lit("/"), a, F.lit("@"), v)
    art_purl = F.concat(
        base_purl,
        F.when(qualifiers.isNotNull(), F.concat(F.lit("?"), qualifiers)).otherwise(
            F.lit("")
        ),
    )
    art_file = _maven_filename(a, v, ext, cls)
    pom_file = _maven_filename(a, v, F.lit("pom"), F.lit(None).cast("string"))

    rows = F.array(
        F.struct(
            F.lit("artifact").alias("uri_kind"),
            art_purl.alias("purl"),
            art_file.alias("file_name"),
            _maven_url(g, a, v, art_file).alias("download_url"),
            F.col("sha1").alias("sha1"),
            F.col("size").alias("size"),
            F.lit(0).cast("int").alias("mining_level"),
            F.lit(True).alias("visited"),
        ),
        F.struct(
            F.lit("pom").alias("uri_kind"),
            base_purl.alias("purl"),
            pom_file.alias("file_name"),
            _maven_url(g, a, v, pom_file).alias("download_url"),
            F.lit(None).cast("string").alias("sha1"),
            F.lit(None).cast("long").alias("size"),
            F.lit(20).cast("int").alias("mining_level"),
            F.lit(False).alias("visited"),
        ),
    )
    return (
        records.select(
            F.lit("maven").alias("type"),
            g.alias("namespace"),
            a.alias("name"),
            v.alias("version"),
            F.explode(rows).alias("r"),
        )
        .select("type", "namespace", "name", "version", "r.*")
    )


# ------------------------------------------------------------------ pypi --

PYPI_URL_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("packagetype", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("upload_time", T.StringType()),
        T.StructField("md5_digest", T.StringType()),
        T.StructField(
            "digests", T.StructType([T.StructField("sha256", T.StringType())])
        ),
    ]
)

PYPI_DOC_SCHEMA = T.StructType(
    [
        T.StructField(
            "info",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("version", T.StringType()),
                    T.StructField("summary", T.StringType()),
                    T.StructField("description", T.StringType()),
                    T.StructField("home_page", T.StringType()),
                    T.StructField("bugtrack_url", T.StringType()),
                    T.StructField("license", T.StringType()),
                    T.StructField("classifiers", T.ArrayType(T.StringType())),
                    T.StructField("author", T.StringType()),
                    T.StructField("author_email", T.StringType()),
                    T.StructField("download_url", T.StringType()),
                ]
            ),
        ),
        T.StructField("urls", T.ArrayType(PYPI_URL_SCHEMA)),
    ]
)


def parse_pypi_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """Raw registry JSON strings -> typed (info, urls) columns."""
    return docs.withColumn("parsed", F.from_json(F.col(json_col), PYPI_DOC_SCHEMA))


def map_pypi_docs(parsed: DataFrame) -> DataFrame:
    """build_packages (minecode/miners/pypi.py:158-292): one package row per
    entry of the urls block, PLUS one row for an off-PyPI
    ``info.download_url`` when present and not 'UNKNOWN'
    (pypi.py:240-254 — its purl carries no file_name qualifier and it has
    no size/digest fields).

    - description = summary '\\n' long-description, skipping empty/blank
      parts (the reference joins the non-blank of (short, long))
    - license: info.license unless missing/'UNKNOWN', else the 'License ::'
      classifiers joined with '; '
    - datasource_id: 'pypi_api_metadata' on every row — the reference sets
      the sdist/bdist pkginfo id transiently but overrides it to
      pypi_api_metadata before yielding (pypi.py:252, 282); the transient
      id is kept as `packagetype_id` for consumers that classify by it
    - purl gains a ?file_name= qualifier per download"""
    info = F.col("info")
    nonblank = lambda c: F.when(c.isNotNull() & (F.trim(c) != ""), c)  # noqa: E731
    description = F.concat_ws(
        "\n", nonblank(info.summary), nonblank(info.description)
    )
    classifier_licenses = F.array_join(
        F.filter(
            F.coalesce(info.classifiers, F.array().cast("array<string>")),
            lambda c: F.lower(c).startswith("license"),
        ),
        "; ",
    )
    declared_license = F.when(
        info.license.isNotNull() & (info.license != "UNKNOWN"), info.license
    ).otherwise(F.nullif(classifier_licenses, F.lit("")))

    u = F.col("u")
    per_url = (
        parsed.select(F.col("parsed.info").alias("info"), F.explode("parsed.urls").alias("u"))
        .select(
            F.concat(
                F.lit("pkg:pypi/"),
                F.col("info.name"),
                F.lit("@"),
                F.col("info.version"),
                F.lit("?file_name="),
                u.filename,
            ).alias("purl"),
            F.lit("pypi").alias("type"),
            F.col("info.name").alias("name"),
            F.col("info.version").alias("version"),
            description.alias("description"),
            F.col("info.home_page").alias("homepage_url"),
            F.col("info.bugtrack_url").alias("bug_tracking_url"),
            declared_license.alias("declared_license"),
            u.url.alias("download_url"),
            u.size.alias("size"),
            u.upload_time.alias("release_date_raw"),
            u.md5_digest.alias("md5"),
            u.digests.sha256.alias("sha256"),
            F.lit("pypi_api_metadata").alias("datasource_id"),
            F.when(u.packagetype == "sdist", F.lit("pypi_sdist_pkginfo"))
            .otherwise(F.lit("pypi_bdist_pkginfo"))
            .alias("packagetype_id"),
        )
    )
    off = (
        parsed.select(F.col("parsed.info").alias("info"))
        .where(
            F.col("info.download_url").isNotNull()
            & (F.col("info.download_url") != "UNKNOWN")
        )
        .select(
            F.concat(
                F.lit("pkg:pypi/"), F.col("info.name"), F.lit("@"),
                F.col("info.version"),
            ).alias("purl"),
            F.lit("pypi").alias("type"),
            F.col("info.name").alias("name"),
            F.col("info.version").alias("version"),
            description.alias("description"),
            F.col("info.home_page").alias("homepage_url"),
            F.col("info.bugtrack_url").alias("bug_tracking_url"),
            declared_license.alias("declared_license"),
            F.col("info.download_url").alias("download_url"),
            F.lit(None).cast("long").alias("size"),
            F.lit(None).cast("string").alias("release_date_raw"),
            F.lit(None).cast("string").alias("md5"),
            F.lit(None).cast("string").alias("sha256"),
            F.lit("pypi_api_metadata").alias("datasource_id"),
            F.lit("pypi_sdist_pkginfo").alias("packagetype_id"),
        )
    )
    return off.unionByName(per_url)


# ---------------------------------------------------------------- debian --


def split_paragraphs(df: DataFrame, text_col: str) -> DataFrame:
    """RFC822 'Packages' text -> one row per non-empty paragraph (the
    debcon.get_paragraphs_data split)."""
    return df.select(
        F.explode(F.split(F.col(text_col), "\n\n+")).alias("para")
    ).filter(F.trim("para") != "")


def _field(key: str) -> Column:
    """First 'Key: value' line of the paragraph (multiline regexp), null
    when the key is absent."""
    return F.nullif(
        F.regexp_extract(F.col("para"), f"(?m)^{key}: (.*)$", 1), F.lit("")
    )


def _folded(key: str) -> Column:
    """A folded RFC822 field: the key line plus every continuation line
    (leading space), unfolding NOT applied — callers split the block."""
    return F.nullif(
        F.regexp_extract(
            F.col("para"), rf"(?m)^{key}:(.*(?:\n [^\n]*)*)", 1
        ),
        F.lit(""),
    )


def _purl_encode(v: Column) -> Column:
    """Percent-encode a purl version/name part the way packageurl-python's
    quote(safe='') does for the characters debian versions actually use
    ('~' -> %7E, '+' -> %2B, ':' -> %3A — fixture-verified on the
    reference's Packages and Sources expected files). '%' first so the
    escapes themselves survive."""
    for ch, enc in (("%", "%25"), ("~", "%7E"), ("+", "%2B"), (":", "%3A")):
        v = F.replace(v, F.lit(ch), F.lit(enc))
    return v


def map_debian_packages(paragraphs: DataFrame) -> DataFrame:
    """parse_packages (minecode/miners/debian.py:516-562) over parsed
    paragraph columns: purl pkg:deb/{name}@{version} — NO debian
    namespace and the version purl-encoded ('~' -> %7E), matching the
    reference's own debian_Packages-expected fixture (DebianPackage
    without namespace; the Sources VISITOR is the path that namespaces
    purls, debian.py:344-351) — keywords from comma-split Tag + Section,
    primary language from the implemented-in:: tag, maintainer
    'Name <email>' split, ftp.debian.org download url."""
    # Tag is an RFC822 folded field (continuation lines start with a
    # space) — capture the whole block, unfold, comma-split, drop blanks
    # (debutils.comma_separated skips empty entries)
    tags = F.nullif(
        F.regexp_replace(
            F.regexp_extract(
                F.col("para"), r"(?m)^Tag: (.*(?:\n[ \t].*)*)", 1
            ),
            r"\n[ \t]+",
            " ",
        ),
        F.lit(""),
    )
    # unary lambda on purpose: passing F.trim directly makes
    # transform feed it (element, index) via its 2-arg signature
    tag_list = F.filter(
        F.transform(F.split(tags, ","), lambda c: F.trim(c)),
        lambda x: x != "",
    )
    keywords = F.concat_ws(
        ",",
        F.when(tags.isNotNull(), F.array_join(tag_list, ",")),
        _field("Section"),
    )
    maintainer = _field("Maintainer")
    return paragraphs.select(
        F.concat(
            F.lit("pkg:deb/"),
            _field("Package"),
            F.lit("@"),
            _purl_encode(_field("Version")),
        ).alias("purl"),
        F.lit("deb").alias("type"),
        F.lit(None).cast("string").alias("namespace"),
        _field("Package").alias("name"),
        _field("Version").alias("version"),
        _field("Description").alias("description"),
        _field("Homepage").alias("homepage_url"),
        _field("Vcs-Browser").alias("code_view_url"),
        _field("Bugs").alias("bug_tracking_url"),
        _field("MD5sum").alias("md5"),
        _field("SHA1").alias("sha1"),
        _field("SHA256").alias("sha256"),
        F.concat(F.lit(DEBIAN_BASE + "/"), _field("Filename")).alias("download_url"),
        F.nullif(F.trim(F.regexp_extract(maintainer, r"^([^<]*)<", 1)), F.lit("")).alias(
            "maintainer_name"
        ),
        F.nullif(F.regexp_extract(maintainer, r"<([^>]*)>", 1), F.lit("")).alias(
            "maintainer_email"
        ),
        F.nullif(keywords, F.lit("")).alias("keywords"),
        F.nullif(
            F.regexp_extract(F.col("para"), r"implemented-in::([a-z0-9+-]+)", 1),
            F.lit(""),
        ).alias("primary_language"),
    )


def map_debian_sources(paragraphs: DataFrame) -> DataFrame:
    """Debian 'Sources' paragraphs -> ONE catalog row per Files entry
    (build_source_file_packages, minecode/miners/debian.py:425-493):

    - parties: Maintainer (role maintainer) + comma-split Uploaders
      (role contributor), 'Name <email>' parsed apart;
    - keywords: comma-split Binary names + Section;
    - download_url = ftp.debian.org base / Directory / file name;
    - md5 is the row's OWN Files entry; sha1/sha256 are the LAST entry
      of the Checksums-Sha1/-Sha256 blocks for EVERY row — the
      reference's per-entry loop overwrites the single field, so all of
      a source's rows share the final value (fixture-verified quirk,
      debian.py:478-490);
    - vcs_url: the first Vcs-<tool> field as '<tool>+<url>'
      (form_vcs_url), Vcs-Browser excluded;
    - purl pkg:deb/{name}@{version} with the version percent-encoded.
    """
    files_block = _folded("Files")
    file_entries = F.filter(
        F.transform(
            F.split(F.coalesce(files_block, F.lit("")), "\n"),
            lambda l: F.struct(
                F.regexp_extract(l, r"^\s*([0-9a-f]{32}) ", 1).alias("md5"),
                F.regexp_extract(l, r"(\S+)\s*$", 1).alias("fname"),
            ),
        ),
        lambda e: (e["md5"] != "") & (e["fname"] != ""),
    )

    def _last_cksum(key: str, rx: str) -> Column:
        entries = F.regexp_extract_all(
            F.coalesce(_folded(key), F.lit("")), F.lit(rf"(?m)^\s*({rx}) "), 1
        )
        return F.try_element_at(entries, F.lit(-1))

    maint = _field("Maintainer")
    uploaders = F.coalesce(_field("Uploaders"), F.lit(""))
    up_names = F.filter(
        F.transform(
            F.split(uploaders, ","),
            lambda u: F.nullif(
                F.trim(F.regexp_extract(u, r"^([^<]*)", 1)), F.lit("")
            ),
        ),
        lambda x: x.isNotNull(),
    )
    binaries = F.filter(
        F.transform(
            F.split(F.coalesce(_field("Binary"), F.lit("")), ","),
            lambda b: F.nullif(F.trim(b), F.lit("")),
        ),
        lambda x: x.isNotNull(),
    )
    vcs = F.coalesce(
        *[
            F.when(
                _field(f"Vcs-{tool}").isNotNull(),
                F.concat(F.lit(pre + "+"), _field(f"Vcs-{tool}")),
            )
            for tool, pre in (("Git", "git"), ("Svn", "svn"), ("Hg", "hg"), ("Bzr", "bzr"))
        ]
    )
    name, version = _field("Package"), _field("Version")
    base = paragraphs.select(
        F.lit("deb").alias("type"),
        name.alias("name"),
        version.alias("version"),
        F.concat(
            F.lit("pkg:deb/"), name, F.lit("@"), _purl_encode(version)
        ).alias("purl"),
        F.concat_ws(",", F.array_join(binaries, ","), _field("Section")).alias(
            "keywords"
        ),
        F.nullif(
            F.trim(F.regexp_extract(maint, r"^([^<]*)", 1)), F.lit("")
        ).alias("maintainer_name"),
        F.nullif(F.regexp_extract(maint, r"<([^>]*)>", 1), F.lit("")).alias(
            "maintainer_email"
        ),
        F.nullif(F.array_join(up_names, "; "), F.lit("")).alias("uploaders"),
        _field("Homepage").alias("homepage_url"),
        _field("Vcs-Browser").alias("code_view_url"),
        vcs.alias("vcs_url"),
        _last_cksum("Checksums-Sha1", "[0-9a-f]{40}").alias("sha1"),
        _last_cksum("Checksums-Sha256", "[0-9a-f]{64}").alias("sha256"),
        F.concat(
            F.lit(DEBIAN_BASE + "/"), _field("Directory"), F.lit("/")
        ).alias("_dir"),
        file_entries.alias("_files"),
    )
    exploded = base.select(
        "*", F.explode("_files").alias("_f")
    )
    return exploded.select(
        "type",
        "name",
        "version",
        "purl",
        "keywords",
        "maintainer_name",
        "maintainer_email",
        "uploaders",
        "homepage_url",
        "code_view_url",
        "vcs_url",
        F.col("_f")["md5"].alias("md5"),
        "sha1",
        "sha256",
        F.concat(F.col("_dir"), F.col("_f")["fname"]).alias("download_url"),
        F.lit("debian_sources_metadata").alias("datasource_id"),
    )


# --------------------------------------------------------------- routing --

# route patterns for the ecosystems the reference mines, dispatched by the
# vectorized Router (operators/router.py); handler names match the
# reference's visitor classes (minecode/miners/<eco>.py)
ECOSYSTEM_ROUTES: list[tuple[str, str]] = [
    (r"https?://.*/nexus-maven-repository-index\.gz", "maven_nexus_index"),
    (r"https?://repo1\.maven\.org/maven2/.*\.pom", "maven_pom"),
    (r"https?://pypi\.python\.org/pypi/[^/]+/[^/]+/json", "pypi_release_json"),
    (r"https?://pypi\.python\.org/pypi/[^/]+/json", "pypi_package_json"),
    (r"https?://registry\.npmjs\.org/[^/]+$", "npm_registry_doc"),
    (r"https?://ftp\.debian\.org/debian/dists/.*Packages\.gz", "debian_packages_gz"),
    (r"https?://ftp\.debian\.org/debian/dists/.*Sources\.gz", "debian_sources_gz"),
    (r"https?://crates\.io/api/v1/crates/[^/]+$", "cargo_crate_doc"),
    (r"https?://rubygems\.org/api/v1/gems/[^/]+\.json", "rubygems_gem_doc"),
    (r"https?://api\.nuget\.org/v3/registration[^/]*/[^/]+/index\.json", "nuget_registration"),
    (r"https?://repo\.packagist\.org/p2?/[^/]+/[^/]+\.json", "composer_package"),
    (r"https?://pkg\.go\.dev/.*", "golang_pkg_page"),
]
