"""Collector-enrichment queries: maven POM ancestry merge and debian
dsc/copyright enrichment (sources/collectors.py — reference
minecode/collectors/maven.py + debian.py). Fixture strategy as q_miners*:
ecosystem-shaped documents built with column concat, enriched by the real
operators, expected rows recomputed by the oracle from the generating
index.

Maven fixture: each part row is a package with a 2-3 deep POM chain —
child (license only when k%3=0, parties only when k%5=0, never a
homepage), parent (license only when k%3=1, always a homepage), and a
grandparent only when k%2=0 (always license/homepage/parties). The
expected merge follows the reference order: child value wins, else the
DEEPEST ancestor with a value (merge_ancestors iterates oldest->newest
and merge_parent assigns whenever still empty, maven.py:219-258).

Debian fixture: binary purl with arch qualifier on odd k, "lib" name
prefix on even k (pool-folder branch), epoch/revision/'+build' version
shapes by k%4, a source purl on k%3=0 (metadata name/version switch), a
copyright file except on k%3=1 (metadata-license fallback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query
from purldb_spark.sources.collectors import (
    enrich_debian_packages,
    merge_pom_ancestors,
    parse_pom_cols,
)

_NAME_SQL = "lower(replace(p_brand, '#', '-')) || '-' || CAST(p_partkey AS VARCHAR)"
_VER_SQL = (
    "CAST(p_partkey % 9 AS VARCHAR) || '.' || CAST(p_partkey % 5 AS VARCHAR) || '.0'"
)

_BASE_SQL = f"""
  SELECT p_partkey AS k, {_NAME_SQL} AS name, {_VER_SQL} AS ver
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
    )


def _pom(g, a, v, license_=None, url=None, dev=None, parent=None):
    """Small column-expression POM builder for the fixture."""
    parts = [
        F.lit('<project><modelVersion>4.0.0</modelVersion>'),
    ]
    if parent is not None:
        pg, pa, pv = parent
        parts += [
            F.lit("<parent><groupId>"), pg,
            F.lit("</groupId><artifactId>"), pa,
            F.lit("</artifactId><version>"), pv,
            F.lit("</version></parent>"),
        ]
    parts += [
        F.lit("<groupId>"), g,
        F.lit("</groupId><artifactId>"), a,
        F.lit("</artifactId><version>"), v,
        F.lit("</version>"),
    ]
    if url is not None:
        parts += [F.lit("<url>"), url, F.lit("</url>")]
    if license_ is not None:
        parts += [
            F.lit("<licenses><license><name>"), license_,
            F.lit("</name></license></licenses>"),
        ]
    if dev is not None:
        parts += [
            F.lit("<developers><developer><name>"), dev,
            F.lit("</name></developer></developers>"),
        ]
    parts.append(F.lit("</project>"))
    return F.concat(*parts)


@query(
    "x_maven_pom_enrich",
    oracle=f"""
    WITH base AS ({_BASE_SQL})
    SELECT 'pkg:maven/org.ex/' || name || '@' || ver AS purl,
           'org.ex' AS namespace, name, ver AS version,
           CASE WHEN k % 3 = 0 THEN 'CHILD-LIC'
                WHEN k % 2 = 0 THEN 'GRAND-LIC'
                WHEN k % 3 = 1 THEN 'PARENT-LIC' END
             AS declared_license_expression,
           CASE WHEN k % 2 = 0 THEN 'https://grand.ex/' || name
                ELSE 'https://parent.ex/' || name END AS homepage_url,
           CASE WHEN k % 5 = 0 THEN 'Child Team'
                WHEN k % 2 = 0 THEN 'Grand Team' END AS parties
    FROM base
    """,
)
def x_maven_pom_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maven collect enrichment (maven.py:198-258): parse the POM chain,
    fill empty declared_license_expression / homepage_url / parties from
    the deepest ancestor holding a value (the reference's oldest-first
    merge), child values never overwritten."""
    b = _base(spark, sf_dir)
    k, name, ver = F.col("k"), F.col("name"), F.col("ver")
    packages = b.select(
        F.concat(F.lit("pkg:maven/org.ex/"), name, F.lit("@"), ver).alias("purl"),
        F.lit("org.ex").alias("namespace"),
        name.alias("name"),
        ver.alias("version"),
        F.when(k % 3 == 0, F.lit("CHILD-LIC")).alias(
            "declared_license_expression"
        ),
        F.lit(None).cast("string").alias("homepage_url"),
        F.when(k % 5 == 0, F.lit("Child Team")).alias("parties"),
    )
    par_a = F.concat(F.lit("par-"), name)
    grand_a = F.concat(F.lit("g-"), name)
    child_pom = b.select(
        _pom(
            F.lit("org.ex"), name, ver,
            parent=(F.lit("org.parent"), par_a, F.lit("1")),
        ).alias("pom_text")
    )
    parent_pom = b.select(
        F.when(
            k % 2 == 0,
            _pom(
                F.lit("org.parent"), par_a, F.lit("1"),
                license_=F.when(k % 3 == 1, F.lit("PARENT-LIC")).otherwise(
                    F.lit("")
                ),
                url=F.concat(F.lit("https://parent.ex/"), name),
                parent=(F.lit("org.grand"), grand_a, F.lit("2")),
            ),
        )
        .otherwise(
            _pom(
                F.lit("org.parent"), par_a, F.lit("1"),
                license_=F.when(k % 3 == 1, F.lit("PARENT-LIC")).otherwise(
                    F.lit("")
                ),
                url=F.concat(F.lit("https://parent.ex/"), name),
            )
        )
        .alias("pom_text")
    )
    grand_pom = b.filter(k % 2 == 0).select(
        _pom(
            F.lit("org.grand"), grand_a, F.lit("2"),
            license_=F.lit("GRAND-LIC"),
            url=F.concat(F.lit("https://grand.ex/"), name),
            dev=F.lit("Grand Team"),
        ).alias("pom_text")
    )
    poms = parse_pom_cols(
        child_pom.unionByName(parent_pom).unionByName(grand_pom)
    )
    return merge_pom_ancestors(packages, poms, max_depth=3)


@query(
    "x_debian_collect_enrich",
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    d AS (
      SELECT k, name, ver,
             CASE WHEN k % 2 = 0 THEN 'lib' || name ELSE name END AS dname,
             CASE WHEN k % 4 = 0 THEN ver || '-2'
                  WHEN k % 4 = 1 THEN ver || '+b1-1'
                  ELSE ver END AS av,
             CASE WHEN k % 2 = 0 THEN 'lib' || substring(name, 1, 1)
                  ELSE substring(name, 1, 1) END AS folder,
             CASE WHEN k % 3 = 0 THEN 'src-' || name
                  WHEN k % 2 = 0 THEN 'lib' || name ELSE name END AS mname,
             CASE WHEN k % 3 = 0 THEN ver || '-s1'
                  WHEN k % 4 = 0 THEN ver || '-2'
                  WHEN k % 4 = 1 THEN ver || '+b1-1'
                  ELSE ver END AS mver
      FROM base
    ),
    u AS (
      SELECT *,
             'http://deb.ex/pool/main/' || folder || '/' || dname || '/'
               AS adir,
             'http://meta.ex/main/' || folder || '/' || dname || '/' AS mdir
      FROM d
    )
    SELECT 'pkg:deb/debian/' || dname || '@' ||
             (CASE WHEN k % 4 = 0 THEN '1:' || ver || '-2'
                   WHEN k % 4 = 1 THEN ver || '+b1-1'
                   WHEN k % 4 = 2 THEN ver
                   ELSE ver || '-0' END) ||
             (CASE WHEN k % 2 = 1 THEN '?arch=amd64' ELSE '' END) AS purl,
           dname AS name,
           CASE WHEN k % 4 = 0 THEN '1:' || ver || '-2'
                WHEN k % 4 = 1 THEN ver || '+b1-1'
                WHEN k % 4 = 2 THEN ver
                ELSE ver || '-0' END AS version,
           CASE WHEN k % 2 = 1 THEN 'amd64' END AS arch,
           mname AS source_field,
           'https://home.ex/' || dname AS homepage_url,
           CASE WHEN k % 3 = 1 THEN 'META-LIC'
                ELSE 'MIT AND GPL-2+' END AS declared_license_expression,
           CASE WHEN k % 3 = 1 THEN NULL ELSE '2020 Ann' END AS copyright,
           'pkg:deb/debian/debhelper; pkg:deb/debian/cmake' ||
             (CASE WHEN k % 5 = 0 THEN '; pkg:deb/debian/dpkg' ELSE '' END)
             AS dependencies,
           'git' AS vcs_tool,
           'https://salsa.debian.org/x/' || dname || '.git' AS vcs_repo,
           adir || dname || '_' || av ||
             (CASE WHEN k % 2 = 1 THEN '_amd64' ELSE '' END) || '.deb'
             AS binary_archive_url,
           adir || mname || '_' || mver || '.tar.xz' AS source_archive_url,
           adir || mname || '_' || split_part(mver, '+', 1) || '.dsc'
             AS package_metadata_url,
           mdir || mname || '_' || mver || '_copyright'
             AS package_copyright_url
    FROM u
    """,
)
def x_debian_collect_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debian collect enrichment (debian.py:74-144 + DebianPackage
    285-464): dsc metadata fields, copyright-file license overlay
    (replace=True, falling back to the dsc License on a missing copyright
    file), dependency purls, Vcs field (Browser excluded), and the four
    pool archive URLs across the epoch / revision-0 / '+build' / lib-name
    / source-purl branches."""
    b = _base(spark, sf_dir)
    k, name, ver = F.col("k"), F.col("name"), F.col("ver")
    dname = F.when(k % 2 == 0, F.concat(F.lit("lib"), name)).otherwise(name)
    dver = (
        F.when(k % 4 == 0, F.concat(F.lit("1:"), ver, F.lit("-2")))
        .when(k % 4 == 1, F.concat(ver, F.lit("+b1-1")))
        .when(k % 4 == 2, ver)
        .otherwise(F.concat(ver, F.lit("-0")))
    )
    arch = F.when(k % 2 == 1, F.lit("amd64"))
    src_name = F.when(k % 3 == 0, F.concat(F.lit("src-"), name))
    src_ver = F.when(k % 3 == 0, F.concat(ver, F.lit("-s1")))
    meta_name = F.coalesce(src_name, dname)
    predep = F.when(k % 5 == 0, F.lit("Pre-Depends: dpkg (>= 1.15)\n")).otherwise(
        F.lit("")
    )
    dsc = F.concat(
        F.lit("Format: 3.0 (quilt)\nSource: "), meta_name,
        F.lit("\nVersion: "), dver,
        F.lit("\nHomepage: https://home.ex/"), dname,
        F.lit("\nLicense: META-LIC\nBuild-Depends: debhelper (>= 9), cmake\n"),
        predep,
        F.lit("Vcs-Browser: https://salsa.debian.org/x/"), dname,
        F.lit("\nVcs-Git: https://salsa.debian.org/x/"), dname,
        F.lit(".git\n"),
    )
    copyright_doc = F.when(
        k % 3 != 1,
        F.concat(
            F.lit(
                "Format: https://www.debian.org/doc/packaging-manuals/"
                "copyright-format/1.0/\nCopyright: 2020 Ann\n"
                "License: MIT\n some text\nFiles: debian/*\n"
                "License: GPL-2+\nLicense: MIT\n"
            )
        ),
    )
    requests = b.select(
        F.concat(
            F.lit("pkg:deb/debian/"), dname, F.lit("@"), dver,
            F.when(arch.isNotNull(), F.lit("?arch=amd64")).otherwise(F.lit("")),
        ).alias("purl"),
        dname.alias("name"),
        dver.alias("version"),
        arch.alias("arch"),
        src_name.alias("source_name"),
        src_ver.alias("source_version"),
        F.lit("http://deb.ex/pool/main/").alias("archive_base_url"),
        F.lit("http://meta.ex/main/").alias("metadata_base_url"),
        dsc.alias("dsc_text"),
        copyright_doc.alias("copyright_text"),
    )
    return enrich_debian_packages(requests).drop(
        "source_name",
        "source_version",
        "archive_base_url",
        "metadata_base_url",
        "dsc_text",
        "copyright_text",
    )
