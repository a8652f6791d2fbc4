"""Miner-mapper queries: per-ecosystem document -> catalog-row mappings
(sources/miners.py, sources/registry_json.py) driven from deterministic
synthetic inputs derived from the testdata tables, so the driver's oracle
gate covers the mapping semantics end-to-end.

Each query GENERATES ecosystem-shaped input rows from a base table with
plain column arithmetic (both engines), runs the Spark mapper on one side,
and the oracle SQL computes the expected catalog rows directly — so any
divergence in the mapper's parsing/derivation logic (purl assembly, repo
URL layout, RFC822 field extraction, JSON explode) breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from purldb_spark.catalog.tables import load
from purldb_spark.operators.router import Router, seed_frontier
from purldb_spark.plans import sqltext as S
from purldb_spark.plans.registry import query
from purldb_spark.sources.miners import (
    DEBIAN_BASE,
    ECOSYSTEM_ROUTES,
    map_debian_packages,
    map_maven_artifacts,
    map_pypi_docs,
    parse_pypi_docs,
    split_paragraphs,
)
from purldb_spark.sources.registry_json import packages_from_registry

# ----------------------------------------------------------------- maven --

_MAVEN_RECORDS_SQL = """
  SELECT 'org.' || lower(replace(p_type, ' ', '.')) AS group_id,
         lower(replace(p_brand, '#', '-')) AS artifact_id,
         CAST(p_partkey % 9 AS VARCHAR) || '.' || CAST(p_partkey % 13 AS VARCHAR)
           AS version,
         CASE p_partkey % 3 WHEN 0 THEN 'jar' WHEN 1 THEN 'war' ELSE 'zip' END
           AS extension,
         CASE WHEN p_partkey % 5 = 0 THEN 'sources' END AS classifier,
         md5(p_name) AS sha1,
         CAST(p_size AS BIGINT) AS size
  FROM part
"""


def _maven_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    k = S.col("p_partkey")
    return S.sel(
        p,
        S.concat("org.", S.lower(S.replace(S.col("p_type"), " ", "."))).alias("group_id"),
        S.lower(S.replace(S.col("p_brand"), "#", "-")).alias("artifact_id"),
        S.concat((k % 9).cast("string"), ".", (k % 13).cast("string")).alias("version"),
        S.when(k % 3 == 0, "jar").when(k % 3 == 1, "war").otherwise("zip").alias("extension"),
        S.when(k % 5 == 0, "sources").alias("classifier"),
        S.md5(S.col("p_name")).alias("sha1"),
        S.col("p_size").cast("long").alias("size"),
    )


@query(
    "x_maven_map_index",
    oracle=f"""
    WITH records AS ({_MAVEN_RECORDS_SQL}),
    art AS (
      SELECT *,
             artifact_id || '-' || version
               || CASE WHEN classifier IS NOT NULL THEN '-' || classifier ELSE '' END
               || '.' || extension AS file_name,
             nullif(concat_ws('&',
               CASE WHEN classifier IS NOT NULL THEN 'classifier=' || classifier END,
               CASE WHEN extension <> 'jar' THEN 'type=' || extension END), '')
               AS qualifiers
      FROM records
    )
    SELECT 'maven' AS type, group_id AS namespace, artifact_id AS name, version,
           'artifact' AS uri_kind,
           'pkg:maven/' || group_id || '/' || artifact_id || '@' || version
             || CASE WHEN qualifiers IS NOT NULL THEN '?' || qualifiers ELSE '' END
             AS purl,
           file_name,
           'https://repo1.maven.org/maven2/' || replace(group_id, '.', '/')
             || '/' || artifact_id || '/' || version || '/' || file_name
             AS download_url,
           sha1, size, CAST(0 AS INTEGER) AS mining_level, TRUE AS visited
    FROM art
    UNION ALL
    SELECT 'maven', group_id, artifact_id, version,
           'pom',
           'pkg:maven/' || group_id || '/' || artifact_id || '@' || version,
           artifact_id || '-' || version || '.pom',
           'https://repo1.maven.org/maven2/' || replace(group_id, '.', '/')
             || '/' || artifact_id || '/' || version || '/'
             || artifact_id || '-' || version || '.pom',
           NULL, NULL, CAST(20 AS INTEGER), FALSE
    FROM records
    """,
)
def x_maven_map_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maven Nexus-index mapper (minecode/miners/maven.py:144-253): every
    artifact record yields the jar URI row (qualifiers, sha1/size, level 0)
    and its POM URI row (level 20), with repo-layout URL + filename."""
    return map_maven_artifacts(_maven_records(spark, sf_dir))


# ------------------------------------------------------------------ pypi --

_PYPI_NAME_SQL = "lower(replace(p_name, ' ', '-'))"
_PYPI_VER_SQL = "CAST(p_partkey % 10 AS VARCHAR) || '.' || CAST(p_partkey % 7 AS VARCHAR)"


@query(
    "x_pypi_map_json",
    oracle=f"""
    WITH base AS (
      SELECT {_PYPI_NAME_SQL} AS name, {_PYPI_VER_SQL} AS version,
             p_type AS summary,
             CASE WHEN p_partkey % 6 = 0 THEN '  ' ELSE p_brand END AS long_desc,
             CASE WHEN p_partkey % 4 = 0 THEN 'UNKNOWN' ELSE 'MIT' END AS lic,
             p_partkey % 8 = 0 AS no_lic_classifier,
             p_partkey AS k, CAST(p_size AS BIGINT) AS sz,
             md5(p_name) AS h1, md5(p_brand) AS h2, md5(p_type) AS h3,
             md5(upper(p_name)) AS h4
      FROM part
    ),
    common AS (
      SELECT *,
             'https://example.org/' || name AS home_page,
             CASE WHEN trim(long_desc) <> '' THEN summary || chr(10) || long_desc
                  ELSE summary END AS description,
             CASE WHEN lic <> 'UNKNOWN' THEN lic
                  WHEN no_lic_classifier THEN NULL
                  ELSE 'License :: OSI Approved :: BSD License' END AS declared,
             '2024-01-0' || CAST(1 + k % 9 AS VARCHAR) || 'T00:00:00' AS ts
      FROM base
    )
    SELECT 'pkg:pypi/' || name || '@' || version || '?file_name='
             || name || '-' || version || '.tar.gz' AS purl,
           'pypi' AS type, name, version, description,
           home_page AS homepage_url, CAST(NULL AS VARCHAR) AS bug_tracking_url,
           declared AS declared_license,
           'https://files.pythonhosted.org/packages/source/' || substr(name, 1, 1)
             || '/' || name || '/' || name || '-' || version || '.tar.gz'
             AS download_url,
           sz AS size, ts AS release_date_raw, h1 AS md5, h2 AS sha256,
           'pypi_api_metadata' AS datasource_id,
           'pypi_sdist_pkginfo' AS packagetype_id
    FROM common
    UNION ALL
    SELECT 'pkg:pypi/' || name || '@' || version || '?file_name='
             || name || '-' || version || '-py3-none-any.whl',
           'pypi', name, version, description, home_page, CAST(NULL AS VARCHAR), declared,
           'https://files.pythonhosted.org/packages/py3/' || substr(name, 1, 1)
             || '/' || name || '/' || name || '-' || version || '-py3-none-any.whl',
           sz + 17, ts, h3, h4, 'pypi_api_metadata', 'pypi_bdist_pkginfo'
    FROM common WHERE k % 3 <> 0
    """,
)
def x_pypi_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PyPI registry-JSON mapper (minecode/miners/pypi.py:145-292): the
    input is a REAL JSON document string per package (built with to_json,
    reparsed with from_json against PYPI_DOC_SCHEMA), exploded to one
    package row per download with the reference's description join,
    UNKNOWN-license classifier fallback, the pypi_api_metadata datasource
    id (the reference overrides the transient sdist/bdist pkginfo id,
    pypi.py:252+282 — kept as packagetype_id)."""
    p = load(spark, sf_dir, "part")
    k = S.col("p_partkey")
    name = S.lower(S.replace(S.col("p_name"), " ", "-"))
    version = S.concat((k % 10).cast("string"), ".", (k % 7).cast("string"))
    filename_sdist = S.concat(name, "-", version, ".tar.gz")
    filename_whl = S.concat(name, "-", version, "-py3-none-any.whl")
    ts = S.concat("2024-01-0", (k % 9 + 1).cast("string"), "T00:00:00")
    sdist = S.struct(
        S.concat(
            "https://files.pythonhosted.org/packages/source/",
            S.substring(name, 1, 1), "/", name, "/", filename_sdist,
        ).alias("url"),
        S.lit("sdist").alias("packagetype"),
        filename_sdist.alias("filename"),
        S.col("p_size").cast("long").alias("size"),
        ts.alias("upload_time"),
        S.md5(S.col("p_name")).alias("md5_digest"),
        S.struct(S.md5(S.col("p_brand")).alias("sha256")).alias("digests"),
    )
    bdist = S.struct(
        S.concat(
            "https://files.pythonhosted.org/packages/py3/",
            S.substring(name, 1, 1), "/", name, "/", filename_whl,
        ).alias("url"),
        S.lit("bdist_wheel").alias("packagetype"),
        filename_whl.alias("filename"),
        (S.col("p_size").cast("long") + 17).alias("size"),
        ts.alias("upload_time"),
        S.md5(S.col("p_type")).alias("md5_digest"),
        S.struct(S.md5(S.upper(S.col("p_name"))).alias("sha256")).alias("digests"),
    )
    info = S.struct(
        name.alias("name"),
        version.alias("version"),
        S.col("p_type").alias("summary"),
        S.when(k % 6 == 0, "  ").otherwise(S.col("p_brand")).alias("description"),
        S.concat("https://example.org/", name).alias("home_page"),
        S.lit(None).cast("string").alias("bugtrack_url"),
        S.when(k % 4 == 0, "UNKNOWN").otherwise("MIT").alias("license"),
        S.when(
            k % 8 == 0, S.array("Programming Language :: Python")
        )
        .otherwise(
            S.array(
                "License :: OSI Approved :: BSD License",
                "Programming Language :: Python",
            )
        )
        .alias("classifiers"),
        S.lit(None).cast("string").alias("author"),
        S.lit(None).cast("string").alias("author_email"),
    )
    urls = S.when(k % 3 != 0, S.array(sdist, bdist)).otherwise(S.array(sdist))
    docs = S.sel(
        p,
        S.to_json(S.struct(info.alias("info"), urls.alias("urls"))).alias("doc"),
    )
    return map_pypi_docs(parse_pypi_docs(docs))


# ---------------------------------------------------------------- debian --

_DEB_NAME_SQL = "lower(replace(trim(s_name), '#', '-'))"
_DEB_VER_SQL = "'1.' || CAST(s_suppkey % 20 AS VARCHAR)"
_DEB_SECTION_SQL = "CASE s_suppkey % 3 WHEN 0 THEN 'libs' WHEN 1 THEN 'utils' ELSE 'net' END"
_DEB_LANG_SQL = "CASE WHEN s_suppkey % 2 = 0 THEN 'c' ELSE 'python' END"


def _debian_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One text blob per supplier holding TWO 'Packages' paragraphs (the
    package and its -doc twin) so the paragraph split is exercised."""
    s = load(spark, sf_dir, "supplier")
    k = S.col("s_suppkey")
    name = S.lower(S.replace(S.trim(S.col("s_name")), "#", "-"))
    ver = S.concat("1.", (k % 20).cast("string"))
    section = S.when(k % 3 == 0, "libs").when(k % 3 == 1, "utils").otherwise("net")
    lang = S.when(k % 2 == 0, "c").otherwise("python")

    def para(nm, with_homepage):
        parts = [
            S.concat("Package: ", nm),
            S.concat("Version: ", ver),
            S.concat("Maintainer: ", S.trim(S.col("s_name")), " <", nm, "@example.org>"),
        ]
        if with_homepage:
            parts.append(S.concat("Homepage: https://example.org/", nm))
        parts += [
            S.concat("Section: ", section),
            S.concat("Tag: implemented-in::", lang, ", role::program"),
            S.concat("MD5sum: ", S.md5(S.col("s_name"))),
            S.concat("SHA256: ", S.md5(S.upper(S.col("s_name")))),
            S.concat(
                "Filename: pool/main/", S.substring(nm, 1, 1), "/", nm,
                "/", nm, "_", ver, "_amd64.deb",
            ),
            S.concat("Description: ", S.trim(S.col("s_name")), " package"),
        ]
        return S.concat_ws("\n", *parts)

    doc = S.concat(
        para(name, True), "\n\n", para(S.concat(name, "-doc"), False)
    )
    return S.sel(s, doc.alias("text"))


_DEB_PARA_SQL = f"""
  SELECT {_DEB_NAME_SQL} AS name, {_DEB_VER_SQL} AS version,
         trim(s_name) AS m_name, {_DEB_NAME_SQL} || '@example.org' AS m_email,
         {_DEB_SECTION_SQL} AS section, {_DEB_LANG_SQL} AS lang,
         md5(s_name) AS h_md5, md5(upper(s_name)) AS h_sha,
         trim(s_name) || ' package' AS descr, s_suppkey AS k
  FROM supplier
"""


@query(
    "x_debian_map_packages",
    oracle=f"""
    WITH base AS ({_DEB_PARA_SQL}),
    both_rows AS (
      SELECT name, version, m_name, m_email, section, lang, h_md5, h_sha, descr,
             TRUE AS has_homepage FROM base
      UNION ALL
      SELECT name || '-doc', version, m_name, m_email || '', section, lang,
             h_md5, h_sha, descr, FALSE FROM base
    )
    SELECT 'pkg:deb/' || name || '@' || replace(version, '~', '%7E') AS purl,
           'deb' AS type, CAST(NULL AS VARCHAR) AS namespace, name, version,
           descr AS description,
           CASE WHEN has_homepage THEN 'https://example.org/' || name END
             AS homepage_url,
           CAST(NULL AS VARCHAR) AS code_view_url,
           CAST(NULL AS VARCHAR) AS bug_tracking_url,
           h_md5 AS md5, CAST(NULL AS VARCHAR) AS sha1, h_sha AS sha256,
           '{DEBIAN_BASE}/pool/main/' || substr(name, 1, 1) || '/' || name
             || '/' || name || '_' || version || '_amd64.deb' AS download_url,
           m_name AS maintainer_name,
           CASE WHEN has_homepage THEN m_email ELSE replace(m_email, '@', '-doc@') END
             AS maintainer_email,
           'implemented-in::' || lang || ',role::program,' || section AS keywords,
           lang AS primary_language
    FROM both_rows
    """,
)
def x_debian_map_packages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debian 'Packages' index mapper (minecode/miners/debian.py:516-562):
    real RFC822 text blobs are split into paragraphs and parsed with
    multiline regexps — purl/keywords/primary-language/maintainer split and
    the pool download URL all derived in-plan."""
    return map_debian_packages(split_paragraphs(_debian_doc(spark, sf_dir), "text"))


# ------------------------------------------------------------------- npm --


@query(
    "x_npm_map_registry",
    oracle="""
    WITH base AS (
      SELECT lower(replace(p_name, ' ', '-')) AS name, p_type AS description,
             CAST(p_partkey % 7 AS VARCHAR) || '.0.0' AS v1,
             CAST(p_partkey % 7 AS VARCHAR) || '.1.0' AS v2,
             p_partkey AS k, md5(p_name) AS h1, md5(p_brand) AS h2
      FROM part
    ),
    versions AS (
      SELECT name, description, v2 AS latest, v1 AS version, h1 AS shasum,
             'MIT' AS license FROM base
      UNION ALL
      SELECT name, description, v2, v2, h2, 'MIT' FROM base
    )
    SELECT 'pkg:npm/' || name || '@' || version AS purl,
           'npm' AS type, name, version, description,
           'https://registry.npmjs.org/' || name || '/-/' || name || '-'
             || version || '.tgz' AS download_url,
           shasum AS sha1, license AS declared_license_expression,
           'https://example.org/' || name AS homepage_url,
           version = latest AS is_latest
    FROM versions
    """,
)
def x_npm_map_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """npm registry-document mapper (S3, minecode/collectors/npm.py:30-105):
    a typed registry document (dist-tags + versions map) per package,
    exploded into one catalog row per release via
    sources/registry_json.packages_from_registry."""
    p = load(spark, sf_dir, "part")
    name = S.lower(S.replace(S.col("p_name"), " ", "-"))
    v1 = S.concat((S.col("p_partkey") % 7).cast("string"), ".0.0")
    v2 = S.concat((S.col("p_partkey") % 7).cast("string"), ".1.0")

    def vmeta(ver, shasum_src):
        tarball = S.concat(
            "https://registry.npmjs.org/", name, "/-/", name, "-", ver, ".tgz"
        )
        return S.struct(
            ver.alias("version"),
            S.lit("MIT").alias("license"),
            S.concat("https://example.org/", name).alias("homepage"),
            S.struct(
                tarball.alias("tarball"),
                S.md5(S.col(shasum_src)).alias("shasum"),
            ).alias("dist"),
        )

    docs = S.sel(
        p,
        name.alias("name"),
        S.col("p_type").alias("description"),
        S.create_map("latest", v2).alias("dist-tags"),
        S.create_map(v1, vmeta(v1, "p_name"), v2, vmeta(v2, "p_brand")).alias(
            "versions"
        ),
    )
    return packages_from_registry(docs, "npm")


# --------------------------------------------------------------- routing --

_URI_TEMPLATES = [
    # (spark suffix applies below) — index i = p_partkey % 13
    "https://repo.example.net/nexus-maven-repository-index.gz",  # 0 maven index
    "https://repo1.maven.org/maven2/org/x/{n}/1.0/{n}-1.0.pom",  # 1 maven pom
    "https://pypi.python.org/pypi/{n}/2.0/json",  # 2 pypi release
    "https://pypi.python.org/pypi/{n}/json",  # 3 pypi package
    "https://registry.npmjs.org/{n}",  # 4 npm
    "http://ftp.debian.org/debian/dists/stable/main/binary-amd64/Packages.gz",  # 5
    "http://ftp.debian.org/debian/dists/stable/main/source/Sources.gz",  # 6
    "https://crates.io/api/v1/crates/{n}",  # 7 cargo
    "https://rubygems.org/api/v1/gems/{n}.json",  # 8 gem
    "https://api.nuget.org/v3/registration5/{n}/index.json",  # 9 nuget
    "https://repo.packagist.org/p2/{n}/{n}.json",  # 10 composer
    "https://pkg.go.dev/example.com/{n}",  # 11 golang
    "ftp://mirror.example.org/{n}.tar.gz",  # 12 unroutable
]

_HANDLERS = [
    "maven_nexus_index", "maven_pom", "pypi_release_json", "pypi_package_json",
    "npm_registry_doc", "debian_packages_gz", "debian_sources_gz",
    "cargo_crate_doc", "rubygems_gem_doc", "nuget_registration",
    "composer_package", "golang_pkg_page", None,
]


@query(
    "x_route_dispatch",
    oracle=f"""
    WITH base AS (
      SELECT lower(replace(p_name, ' ', '-')) AS n, p_partkey % 13 AS i
      FROM part
    ),
    uris AS (
      SELECT CASE i
        {" ".join(
            f"WHEN {i} THEN '" + t.replace("{n}", "' || n || '") + "'"
            for i, t in enumerate(_URI_TEMPLATES)
        )}
      END AS uri, i FROM base
    )
    SELECT uri,
           CASE i {" ".join(
               f"WHEN {i} THEN '{h}'" for i, h in enumerate(_HANDLERS) if h
           )} END AS handler
    FROM uris
    """,
)
def x_route_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 route dispatch across 12 ecosystems (minecode/route.py:82-200):
    the frontier's handler column comes from the vectorized rlike cascade
    over ECOSYSTEM_ROUTES; the oracle derives the expected handler from the
    generating index directly, so the regex routing itself is what is being
    verified (including the unroutable row -> NULL)."""
    p = load(spark, sf_dir, "part")
    n = S.lower(S.replace(S.col("p_name"), " ", "-"))
    i = S.col("p_partkey") % 13
    uri = None
    for idx, t in enumerate(_URI_TEMPLATES):
        pieces = []
        for seg_no, seg in enumerate(t.split("{n}")):
            if seg_no:
                pieces.append(n)
            if seg:
                pieces.append(S.lit(seg))
        built = S.concat(*pieces) if len(pieces) > 1 else pieces[0]
        uri = built if uri is None else S.when(i == idx, built).otherwise(uri)
        if idx == 0:
            uri = S.when(i == 0, built)
    frontier = S.sel(p, uri.alias("uri"))
    router = Router()
    for pattern, handler in ECOSYSTEM_ROUTES:
        router.append(pattern, lambda _u: None, handler)
    return router.route_frontier(frontier, "uri").select("uri", "handler")


@query(
    "x_debian_sources_map",
    oracle=f"""
    WITH base AS (
      SELECT s_suppkey AS k, {_DEB_NAME_SQL} AS name, {_DEB_VER_SQL} AS ver,
             {_DEB_SECTION_SQL} AS section, trim(s_name) AS m_name,
             md5(s_name) AS h1, md5(upper(s_name)) AS h2,
             md5(s_name || 'x') AS h3
      FROM supplier
    ),
    files AS (
      SELECT *, name || '_' || ver || (CASE WHEN f = 1 THEN '.dsc'
                                            ELSE '.orig.tar.xz' END) AS fname,
             CASE WHEN f = 1 THEN h1 ELSE h2 END AS fmd5
      FROM base CROSS JOIN (VALUES (1), (2)) t(f)
    )
    SELECT 'deb' AS type, name, ver AS version,
           'pkg:deb/' || name || '@' || replace(ver, '+', '%2B') AS purl,
           name || '-bin,' || section AS keywords,
           m_name AS maintainer_name,
           name || '@example.org' AS maintainer_email,
           CASE WHEN k % 2 = 0 THEN 'Up One; Up Two' END AS uploaders,
           'https://example.org/' || name AS homepage_url,
           'https://browse.example/' || name AS code_view_url,
           'git+https://git.example/' || name || '.git' AS vcs_url,
           fmd5 AS md5,
           substr(h3 || h3, 1, 40) AS sha1, h1 || h2 AS sha256,
           '{DEBIAN_BASE}/pool/main/' || substr(name, 1, 1) || '/' || name
             || '/' || fname AS download_url,
           'debian_sources_metadata' AS datasource_id
    FROM files
    """,
)
def x_debian_sources_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debian Sources mapper (build_source_file_packages,
    debian.py:425-493): one row per Files entry, maintainer + uploaders
    parties, Binary+Section keywords, pool download URLs, and the
    reference's last-checksum-entry quirk for sha1/sha256."""
    from purldb_spark.sources.miners import map_debian_sources

    s = load(spark, sf_dir, "supplier")
    k = S.col("s_suppkey")
    name = S.lower(S.replace(S.trim(S.col("s_name")), "#", "-"))
    ver = S.concat("1.", (k % 20).cast("string"))
    section = S.when(k % 3 == 0, "libs").when(k % 3 == 1, "utils").otherwise("net")
    h1 = S.md5(S.col("s_name"))
    h2 = S.md5(S.upper(S.col("s_name")))
    h3 = S.md5(S.concat(S.col("s_name"), "x"))
    sha1a = S.substring(S.concat(h3, h3), 1, 40)
    sha1b = S.substring(S.concat(h3, h3), 1, 40)
    uploaders = S.when(
        k % 2 == 0,
        "Uploaders: Up One <one@ex.org>, Up Two <two@ex.org>\n",
    ).otherwise("")
    para = S.concat(
        "Package: ", name,
        "\nBinary: ", name, "-bin",
        "\nVersion: ", ver,
        "\nMaintainer: ", S.trim(S.col("s_name")),
        " <", name, "@example.org>\n",
        uploaders,
        "Files:\n ", h1, " 100 ", name, "_", ver, ".dsc\n ",
        h2, " 200 ", name, "_", ver, ".orig.tar.xz\n",
        "Checksums-Sha1:\n ", sha1a, " 100 a.dsc\n ",
        sha1b, " 200 b.tar.xz\n",
        "Checksums-Sha256:\n ", S.concat(h2, h3), " 100 a.dsc\n ",
        S.concat(h1, h2), " 200 b.tar.xz\n",
        "Homepage: https://example.org/", name,
        "\nVcs-Browser: https://browse.example/", name,
        "\nVcs-Git: https://git.example/", name, ".git\n",
        "Section: ", section,
        "\nDirectory: pool/main/", S.substring(name, 1, 1),
        "/", name, "\n",
    )
    docs = S.sel(s, para.alias("text"))
    return map_debian_sources(split_paragraphs(docs, "text"))
