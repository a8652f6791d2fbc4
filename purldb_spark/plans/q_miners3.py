"""Miner-mapper queries, batch 3: alpine / cran / conda / sourceforge /
fdroid (sources/miners3.py). Same fixture strategy as q_miners and
q_miners2 — real ecosystem-shaped documents built with column concat,
mapped by the real parsers/mappers, expected rows computed directly by the
oracle from the generating index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query
from purldb_spark.sources.miners3 import (
    map_alpine_blocks,
    map_conda_docs,
    map_cran_docs,
    map_fdroid_docs,
    map_sourceforge_docs,
)

_NAME_SQL = "lower(replace(p_brand, '#', '-')) || '-' || CAST(p_partkey AS VARCHAR)"
_VER_SQL = (
    "CAST(p_partkey % 9 AS VARCHAR) || '.' || CAST(p_partkey % 5 AS VARCHAR) || '.0'"
)

_BASE_SQL = f"""
  SELECT p_partkey AS k, {_NAME_SQL} AS name, {_VER_SQL} AS ver,
         CAST(p_size AS BIGINT) AS size, md5(p_name) AS cs
  FROM part
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        k.alias("k"),
        F.concat(
            F.lower(F.replace(F.col("p_brand"), F.lit("#"), F.lit("-"))),
            F.lit("-"),
            k.cast("string"),
        ).alias("name"),
        F.concat(
            (k % 9).cast("string"), F.lit("."), (k % 5).cast("string"), F.lit(".0")
        ).alias("ver"),
        F.col("p_size").cast("long").alias("size"),
        F.md5("p_name").alias("cs"),
    )


@query(
    "x_alpine_map",
    oracle=f"""
    WITH base AS ({_BASE_SQL})
    SELECT 'apk' AS type, name, ver AS version,
           'pkg:apk/' || name || '@' || ver AS purl,
           'Package ' || name AS description,
           'https://ex.dev/' || name AS repository_homepage_url,
           'MIT' AS extracted_license_statement, size,
           cs AS sha1,
           CASE WHEN k % 3 = 0 THEN 'Ann Dev'
                WHEN k % 3 = 1 THEN 'solo' END AS maintainer_name,
           CASE WHEN k % 3 = 0 THEN 'ann@ex.dev' END AS maintainer_email,
           'https://dl.alpinelinux.org/' || name || '-' || ver || '.apk'
             AS download_url
    FROM base
    UNION ALL
    SELECT 'apk', 'o' || name, '0.0.1',
           'pkg:apk/o' || name || '@0.0.1',
           'Other', NULL, NULL, 1, NULL, NULL, NULL,
           'https://dl.alpinelinux.org/' || name || '-' || ver || '.apk'
    FROM base
    """,
)
def x_alpine_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APKINDEX text parse (alpine.py:67-121): blank-line block split,
    one-letter field map, Q1-base64 checksum -> sha1 hex, maintainer
    name/email split, colon-less lines skipped; the second block exercises
    the all-fields-missing path."""
    b = _base(spark, sf_dir)
    name, ver = F.col("name"), F.col("ver")
    maint = (
        F.when(F.col("k") % 3 == 0, F.lit("m:Ann Dev <ann@ex.dev>\n"))
        .when(F.col("k") % 3 == 1, F.lit("m:solo\n"))
        .otherwise(F.lit(""))
    )
    apkindex = F.concat(
        F.lit("C:Q1"),
        F.base64(F.unhex(F.col("cs"))),
        F.lit("\nP:"),
        name,
        F.lit("\nV:"),
        ver,
        F.lit("\nA:x86_64\nS:"),
        F.col("size").cast("string"),
        F.lit("\nT:Package "),
        name,
        F.lit("\nU:https://ex.dev/"),
        name,
        F.lit("\nL:MIT\n"),
        maint,
        F.lit("junk line without separator\n"),
        F.lit("\nP:o"),
        name,
        F.lit("\nV:0.0.1\nS:1\nT:Other\n"),
    )
    url = F.concat(
        F.lit("https://dl.alpinelinux.org/"), name, F.lit("-"), ver, F.lit(".apk")
    )
    docs = b.select(apkindex.alias("apkindex"), url.alias("download_url"))
    return map_alpine_blocks(docs).drop("datasource_id")


@query(
    "x_cran_conda_map",
    oracle=f"""
    WITH base AS ({_BASE_SQL})
    SELECT 'cran' AS type, name, ver AS version,
           'pkg:cran/' || name || '@' || ver AS purl,
           'R package ' || name AS description,
           'https://ex.dev/' || name AS homepage_url,
           'GPL-3' AS licenses, 'Ann' AS author,
           'https://cran.r-project.org/src/contrib/' || name || '_' || ver
             || '.tar.gz' AS download_url,
           NULL AS namespace, CAST(NULL AS BIGINT) AS size,
           NULL AS sha256, NULL AS md5, NULL AS deps
    FROM base
    UNION ALL
    SELECT 'cran', name, '0.0.1', 'pkg:cran/' || name || '@0.0.1',
           'Old ' || name, NULL, 'MIT', NULL,
           'https://cran.r-project.org/src/contrib/' || name || '_0.0.1.tar.gz',
           NULL, NULL, NULL, NULL, NULL
    FROM base WHERE k % 2 = 1
    UNION ALL
    SELECT 'conda', name, ver,
           'pkg:conda/' ||
             (CASE WHEN k % 2 = 0 THEN 'conda-forge' ELSE 'main' END) ||
             '/' || name || '@' || ver,
           CASE WHEN k % 4 = 0 THEN 'Conda pkg' END,
           CASE WHEN k % 4 = 0 THEN 'https://anaconda.org/' || name END,
           nullif(concat_ws('; ',
             CASE WHEN k % 3 = 0 THEN 'BSD-3-Clause' END,
             CASE WHEN k % 4 = 0 THEN 'MIT' END), ''),
           NULL,
           'https://repo.anaconda.com/' || name || '-' || ver AS download_url,
           CASE WHEN k % 2 = 0 THEN 'conda-forge' ELSE 'main' END AS namespace,
           CASE WHEN k % 2 = 0 THEN size + 1 ELSE size END AS size,
           cs AS sha256, substring(cs, 1, 16) AS md5,
           'pkg:conan/python; pkg:conan/numpy' AS deps
    FROM base
    """,
)
def x_cran_conda_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAN DB API versions-map explode with purl-version filter
    (cran.py:196-250) + conda repodata identifier lookup with the
    packages.conda branch, conan-typed dependency purls, and the
    conda-forge info merge (conda.py:15-82)."""
    b = _base(spark, sf_dir)
    name, ver, cs = F.col("name"), F.col("ver"), F.col("cs")
    k = F.col("k")

    cran_doc = F.concat(
        F.lit('{"Package":"'), name,
        F.lit('","versions":{"'), ver,
        F.lit('":{"Description":"R package '), name,
        F.lit('","URL":"https://ex.dev/'), name,
        F.lit('","License":"GPL-3","Author":"Ann"},'),
        F.lit('"0.0.1":{"Description":"Old '), name,
        F.lit('","License":"MIT"}}}'),
    )
    want = F.when(k % 2 == 0, ver)
    cran = map_cran_docs(
        b.select(cran_doc.alias("doc"), want.alias("want")), version_col="want"
    ).select(
        "type",
        "name",
        "version",
        "purl",
        "description",
        "homepage_url",
        F.col("extracted_license_statement").alias("licenses"),
        "author",
        "download_url",
        F.lit(None).cast("string").alias("namespace"),
        F.lit(None).cast("long").alias("size"),
        F.lit(None).cast("string").alias("sha256"),
        F.lit(None).cast("string").alias("md5"),
        F.lit(None).cast("string").alias("deps"),
    )

    tarball = F.concat(name, F.lit("-"), ver, F.lit(".tar.bz2"))
    condapkg = F.concat(name, F.lit("-"), ver, F.lit(".conda"))
    lic = F.when(k % 3 == 0, F.lit('"license":"BSD-3-Clause",')).otherwise(F.lit(""))
    meta_body = F.concat(
        F.lit('{"sha256":"'), cs,
        F.lit('","md5":"'), F.substring(cs, 1, 16),
        F.lit('",'), lic,
        F.lit('"depends":["python >=3.8","numpy"],"size":'),
    )
    repodata = F.concat(
        F.lit('{"packages":{"'), tarball, F.lit('":'),
        meta_body, F.col("size").cast("string"), F.lit("}},"),
        F.lit('"packages.conda":{"'), condapkg, F.lit('":'),
        meta_body, (F.col("size") + 1).cast("string"), F.lit("}}}"),
    )
    identifier = F.when(k % 2 == 0, condapkg).otherwise(tarball)
    namespace = F.when(k % 2 == 0, "conda-forge").otherwise("main")
    info = F.when(
        k % 4 == 0,
        F.concat(
            F.lit('{"description":"Conda pkg","summary":"sum",'),
            F.lit('"html_url":"https://anaconda.org/'), name,
            F.lit('","dev_url":"https://github.com/'), name,
            F.lit('","license":"MIT"}'),
        ),
    )
    conda_docs = b.select(
        repodata.alias("doc"),
        identifier.alias("identifier"),
        name.alias("name"),
        namespace.alias("namespace"),
        ver.alias("version"),
        F.concat(F.lit("https://repo.anaconda.com/"), name, F.lit("-"), ver).alias(
            "download_url"
        ),
        info.alias("package_info"),
    )
    conda = map_conda_docs(conda_docs).select(
        "type",
        "name",
        "version",
        "purl",
        "description",
        "homepage_url",
        F.nullif(
            F.concat_ws("; ", F.col("extracted_license_statement")), F.lit("")
        ).alias("licenses"),
        F.lit(None).cast("string").alias("author"),
        "download_url",
        "namespace",
        "size",
        "sha256",
        "md5",
        F.concat_ws("; ", F.col("dependencies")).alias("deps"),
    )
    return cran.unionByName(conda)


@query(
    "x_sourceforge_fdroid_map",
    oracle=f"""
    WITH base AS ({_BASE_SQL})
    SELECT 'sourceforge' AS type,
           CASE WHEN k % 3 = 2 THEN 'n-' || name ELSE name END AS name,
           NULL AS version,
           'pkg:sourceforge/' ||
             (CASE WHEN k % 3 = 2 THEN 'n-' || name ELSE name END) AS purl,
           CASE WHEN k % 3 = 0 THEN 'Sum ' || name || chr(10) || 'Long ' || name
                ELSE 'Sum ' || name END AS description,
           CASE WHEN k % 2 = 0 THEN 'https://proj.ex/' || name
                ELSE 'https://sourceforge.net/projects/' || name END
             AS homepage_url,
           'python, c' AS primary_language,
           'mit; MIT License' AS licenses,
           'dev' AS keywords,
           'Dev A' AS contributors,
           NULL AS vcs_url, NULL AS bug_tracking_url,
           NULL AS download_url, NULL AS sha256, CAST(NULL AS BIGINT) AS size,
           NULL AS source_packages
    FROM base
    UNION ALL
    SELECT 'fdroid', name, CAST(k % 100 + 1 AS VARCHAR),
           'pkg:fdroid/' || name || '@' || CAST(k % 100 + 1 AS VARCHAR),
           name || ' tool' || chr(10) || 'Full desc of ' || name,
           'https://site.ex/' || name,
           NULL, 'GPL-2.0-only', 'time', NULL,
           'https://github.com/ex/' || name,
           'https://github.com/ex/' || name || '/issues',
           'https://f-droid.org/repo/' || name || '-src.tar.gz',
           cs, size, NULL
    FROM base
    UNION ALL
    SELECT 'fdroid', name, CAST(k % 100 + 1 AS VARCHAR),
           'pkg:fdroid/' || name || '@' || CAST(k % 100 + 1 AS VARCHAR),
           name || ' tool' || chr(10) || 'Full desc of ' || name,
           'https://site.ex/' || name,
           NULL, 'GPL-2.0-only', 'time', NULL,
           'https://github.com/ex/' || name,
           'https://github.com/ex/' || name || '/issues',
           'https://f-droid.org/repo/' || name || '.apk',
           substring(cs, 1, 16), size + 7,
           'pkg:fdroid/' || name || '@' || CAST(k % 100 + 1 AS VARCHAR)
             || '?download_url=https://f-droid.org/repo/' || name
             || '-src.tar.gz'
    FROM base
    """,
)
def x_sourceforge_fdroid_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sourceforge project-JSON mapping (sourceforge.py:106-178): shortname
    fallback, whitespace-only description parts dropped, license
    shortname+fullname interleave, language join — plus F-Droid index-v2
    mapping (fdroid.py:116-288): en-US description chain with startswith
    dedup, one src row + one apk row per version with source_packages
    linkage."""
    b = _base(spark, sf_dir)
    name, ver, cs, k = F.col("name"), F.col("ver"), F.col("cs"), F.col("k")

    shortname = F.when(k % 3 != 2, F.concat(F.lit('"shortname":"'), name, F.lit('",'))).otherwise(
        F.lit("")
    )
    short_desc = (
        F.when(k % 3 == 0, F.concat(F.lit('"short_description":"Long '), name, F.lit('",')))
        .when(k % 3 == 1, F.lit('"short_description":"   ",'))
        .otherwise(F.lit(""))
    )
    homepage = F.when(
        k % 2 == 0, F.concat(F.lit('"external_homepage":"https://proj.ex/'), name, F.lit('",'))
    ).otherwise(F.lit(""))
    sf_doc = F.concat(
        F.lit('{"summary":"Sum '), name, F.lit('",'),
        short_desc,
        shortname,
        F.lit('"name":"n-'), name, F.lit('",'),
        homepage,
        F.lit('"url":"https://sourceforge.net/projects/'), name, F.lit('",'),
        F.lit('"developers":[{"name":"Dev A","url":"https://sf.net/u/a"},'),
        F.lit('{"url":"https://sf.net/u/b"}],'),
        F.lit('"categories":{"language":[{"shortname":"python"},{"shortname":"c"}],'),
        F.lit('"license":[{"shortname":"mit","fullname":"MIT License"},'),
        F.lit('{"shortname":"gpl"}],'),
        F.lit('"topic":[{"shortname":"dev"}]}}'),
    )
    sf = map_sourceforge_docs(b.select(sf_doc.alias("doc"))).select(
        "type",
        "name",
        F.lit(None).cast("string").alias("version"),
        "purl",
        "description",
        "homepage_url",
        "primary_language",
        F.concat_ws("; ", F.col("extracted_license_statement")).alias("licenses"),
        F.concat_ws("; ", F.col("keywords")).alias("keywords"),
        F.concat_ws("; ", F.col("contributors")).alias("contributors"),
        F.lit(None).cast("string").alias("vcs_url"),
        F.lit(None).cast("string").alias("bug_tracking_url"),
        F.lit(None).cast("string").alias("download_url"),
        F.lit(None).cast("string").alias("sha256"),
        F.lit(None).cast("long").alias("size"),
        F.lit(None).cast("string").alias("source_packages"),
    )

    vc = (k % 100 + 1).cast("string")
    fdroid_doc = F.concat(
        F.lit('{"metadata":{"categories":["time"],'),
        F.lit('"issueTracker":"https://github.com/ex/'), name, F.lit('/issues",'),
        F.lit('"license":"GPL-2.0-only",'),
        F.lit('"sourceCode":"https://github.com/ex/'), name, F.lit('",'),
        F.lit('"webSite":"https://site.ex/'), name, F.lit('",'),
        F.lit('"name":{"en-US":"'), name, F.lit('"},'),
        F.lit('"summary":{"en-US":"'), name, F.lit(' tool"},'),
        F.lit('"description":{"en-US":"Full desc of '), name, F.lit('"}},'),
        F.lit('"versions":{"'), cs, F.lit('":{'),
        F.lit('"manifest":{"versionCode":'), vc, F.lit("},"),
        F.lit('"src":{"name":"/'), name, F.lit('-src.tar.gz","sha256":"'), cs,
        F.lit('","size":'), F.col("size").cast("string"), F.lit("},"),
        F.lit('"file":{"name":"/'), name, F.lit('.apk","sha256":"'),
        F.substring(cs, 1, 16),
        F.lit('","size":'), (F.col("size") + 7).cast("string"), F.lit("}}}}"),
    )
    fd = map_fdroid_docs(
        b.select(fdroid_doc.alias("doc"), name.alias("name"))
    ).select(
        "type",
        "name",
        "version",
        "purl",
        "description",
        "homepage_url",
        F.lit(None).cast("string").alias("primary_language"),
        F.col("extracted_license_statement").alias("licenses"),
        F.concat_ws("; ", F.col("keywords")).alias("keywords"),
        F.lit(None).cast("string").alias("contributors"),
        "vcs_url",
        "bug_tracking_url",
        "download_url",
        "sha256",
        "size",
        F.nullif(F.concat_ws("; ", F.col("source_packages")), F.lit("")).alias(
            "source_packages"
        ),
    )
    return sf.unionByName(fd)
