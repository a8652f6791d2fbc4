"""Miner-mapper queries, batch 9: openwrt / gstreamer and freedesktop /
googlecode / openssl (sources/miners9.py). Same fixture strategy as
earlier batches."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query
from purldb_spark.sources.miners9 import (
    map_freedesktop_pages,
    map_googlecode_v1_docs,
    map_googlecode_v2_docs,
    map_gstreamer_urls,
    map_openssl_listing,
    map_openwrt_docs,
)

_NAME_SQL = "lower(replace(p_brand, '#', '-')) || '-' || CAST(p_partkey AS VARCHAR)"
_VER_SQL = (
    "CAST(p_partkey % 9 AS VARCHAR) || '.' || CAST(p_partkey % 5 AS VARCHAR) || '.0'"
)

_BASE_SQL = f"""
  SELECT p_partkey AS k, {_NAME_SQL} AS name, {_VER_SQL} AS ver,
         CAST(p_size AS BIGINT) AS size
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
    )


@query(
    "x_openwrt_gstreamer_map",
    oracle=f"""
    WITH base AS ({_BASE_SQL})
    SELECT 'openwrt' AS type, 'wrt-' || name AS name, ver || '-2' AS version,
           'pkg:openwrt/wrt-' || name || '@' || ver || '-2' AS purl,
           'OpenWrt pkg ' || name AS description, size,
           CASE WHEN k % 2 = 0
                THEN 'pkg:openwrt/libc; pkg:openwrt/libubox' END
             AS dependencies,
           CASE WHEN k % 3 = 0 THEN 'Ann'
                WHEN k % 3 = 1 THEN 'solo' END AS maintainer_name,
           CASE WHEN k % 3 = 0 THEN 'ann@o.ex' END AS maintainer_email,
           'GPL-2.0' AS declared_license,
           'net; mips_24kc' AS keywords,
           NULL AS download_url, NULL AS homepage_url,
           'openwrt_metadata' AS datasource_id
    FROM base
    UNION ALL
    SELECT 'gstreamer', 'gst-' || name, ver || '.tar.bz2',
           'pkg:gstreamer/gst-' || name || '@' || ver || '.tar.bz2',
           NULL, CAST(NULL AS BIGINT), NULL, NULL, NULL, NULL, NULL,
           'https://gstreamer.freedesktop.org/src/gst-plugins/gst-' || name
             || '-' || ver || '.tar.bz2',
           'https://gstreamer.freedesktop.org', NULL
    FROM base
    """,
)
def x_openwrt_gstreamer_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """openwrt ipk control mapping (openwrt.py:126-170): Depends ->
    purls, maintainer split branches, Section+Architecture keywords;
    gstreamer dist URL split (gstreamer.py:89-111): last-dash
    rpartition keeping the archive extension in the version (reference
    quirk), dash-less names dropped."""
    b = _base(spark, sf_dir)
    k, name, ver = F.col("k"), F.col("name"), F.col("ver")
    deps = F.when(
        k % 2 == 0, F.lit("Depends: libc, libubox (>= 1.0)\n")
    ).otherwise(F.lit(""))
    maint = (
        F.when(k % 3 == 0, F.lit("Maintainer: Ann <ann@o.ex>\n"))
        .when(k % 3 == 1, F.lit("Maintainer: solo\n"))
        .otherwise(F.lit(""))
    )
    control = F.concat(
        F.lit("Package: wrt-"), name,
        F.lit("\nVersion: "), ver,
        F.lit("-2\n"),
        deps,
        F.lit("Section: net\nArchitecture: mips_24kc\nInstalled-Size: "),
        F.col("size").cast("string"),
        F.lit("\n"),
        maint,
        F.lit("Description: OpenWrt pkg "), name,
        F.lit("\nLicense: GPL-2.0\n"),
    )
    wrt = map_openwrt_docs(b.select(control.alias("control"))).select(
        "type",
        "name",
        "version",
        "purl",
        "description",
        "size",
        "dependencies",
        "maintainer_name",
        "maintainer_email",
        "declared_license",
        "keywords",
        F.lit(None).cast("string").alias("download_url"),
        F.lit(None).cast("string").alias("homepage_url"),
        "datasource_id",
    )
    uris = b.select(
        F.concat(
            F.lit("https://gstreamer.freedesktop.org/src/gst-plugins/gst-"),
            name, F.lit("-"), ver, F.lit(".tar.bz2"),
        ).alias("uri")
    ).unionByName(
        # dash-less base name -> dropped by the mapper (gstreamer.py:100)
        b.select(
            F.lit("https://gstreamer.freedesktop.org/src/tarball.tar.gz").alias(
                "uri"
            )
        )
    )
    gst = map_gstreamer_urls(uris).select(
        "type",
        "name",
        "version",
        "purl",
        F.lit(None).cast("string").alias("description"),
        F.lit(None).cast("long").alias("size"),
        *[
            F.lit(None).cast("string").alias(c)
            for c in (
                "dependencies",
                "maintainer_name",
                "maintainer_email",
                "declared_license",
                "keywords",
            )
        ],
        "download_url",
        "homepage_url",
        F.lit(None).cast("string").alias("datasource_id"),
    )
    return wrt.unionByName(gst)


@query(
    "x_fd_gc_openssl_map",
    oracle=f"""
    WITH base AS ({_BASE_SQL})
    SELECT 'freedesktop' AS type, name, NULL AS namespace,
           '0.9' AS version,
           'pkg:freedesktop/' || name || '@0.9' AS purl,
           'Project ' || name AS description,
           'https://www.freedesktop.org/wiki/Software/' || name || '/'
             AS homepage_url,
           'https://www.freedesktop.org/software/' || name || '/dist/'
             || name || '-2.0.tar.gz' AS download_url,
           CASE WHEN k % 2 = 0
                THEN 'https://bugs.freedesktop.org/buglist.cgi?product=' || name
                END AS bug_tracking_url,
           CASE WHEN k % 3 = 0
                THEN 'http://cgit.freedesktop.org/' || name || '/tree/' END
             AS code_view_url,
           CASE WHEN k % 3 <> 1
                THEN 'git+git://anongit.freedesktop.org/git/' || name END
             AS vcs_url,
           NULL AS extracted_license_statement, NULL AS keywords,
           CAST(NULL AS BIGINT) AS size, NULL AS release_date,
           NULL AS copyright, NULL AS datasource_id
    FROM base
    UNION ALL
    SELECT 'googlecode', 'gc-' || name, NULL, NULL,
           'pkg:googlecode/gc-' || name,
           CASE WHEN k % 3 = 0 THEN 'Long ' || name
                WHEN k % 3 = 1 THEN 'Sum ' || name
                ELSE 'Sum ' || name || chr(10) || 'Long ' || name END,
           NULL, NULL, NULL, NULL, NULL,
           CASE WHEN k % 2 = 0 THEN 'Apache-2.0' END,
           CASE WHEN k % 5 <> 0 THEN 'a; b' END,
           CAST(NULL AS BIGINT), NULL, NULL, 'googlecode_api_json'
    FROM base
    UNION ALL
    SELECT 'googlecode', 'v1-' || name,
           CASE WHEN k % 2 = 0 THEN 'code.google.com' END, NULL,
           'pkg:googlecode/' ||
             (CASE WHEN k % 2 = 0 THEN 'code.google.com/' ELSE '' END)
             || 'v1-' || name,
           'V1 ' || name, NULL, NULL, NULL, NULL,
           'https://code.google.com/archive/p/' || name,
           'BSD', 'x',
           CAST(NULL AS BIGINT), NULL, NULL, 'googlecode_json'
    FROM base WHERE k % 7 <> 0
    UNION ALL
    SELECT 'generic', 'openssl-' || ver || '-' || CAST(k AS VARCHAR) ||
             CASE WHEN k % 2 = 0 THEN '.tar.gz' ELSE '.tar.gz.sha256' END,
           NULL,
           ver || '-' || CAST(k AS VARCHAR),
           'pkg:generic/openssl-' || ver || '-' || CAST(k AS VARCHAR) ||
             (CASE WHEN k % 2 = 0 THEN '.tar.gz' ELSE '.tar.gz.sha256' END)
             || '@' || ver || '-' || CAST(k AS VARCHAR),
           'The OpenSSL Project is a collaborative effort to develop a '
             || 'robust, commercial-grade, fully featured, and Open Source '
             || 'toolkit implementing the Transport Layer Security (TLS) '
             || 'protocols (including SSLv3) as well as a full-strength '
             || 'general purpose cryptographic library.',
           'https://www.openssl.org/',
           'https://ftp.openssl.org/source/openssl-' || ver || '-'
             || CAST(k AS VARCHAR) ||
             (CASE WHEN k % 2 = 0 THEN '.tar.gz' ELSE '.tar.gz.sha256' END),
           'https://github.com/openssl/openssl/issues',
           'https://github.com/openssl/openssl',
           'git+https://github.com/openssl/openssl.git',
           'OpenSSL License', NULL, size, '2018-09-11 13:01:22',
           'Copyright (c) 1998-2018 The OpenSSL Project' || chr(10) ||
             'Copyright (c) 1995-1998 Eric A. Young, Tim J. Hudson' ||
             chr(10) || 'All rights reserved.',
           'openssl_metadeta'
    FROM base
    """,
)
def x_fd_gc_openssl_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """freedesktop wiki-page mapping (freedesktop.py:66-96): h1
    description, last matching link per category, non-freedesktop links
    ignored, git:// li items; googlecode v2/v1 JSON
    (googlecode.py:193-286): summary+description join, label trim,
    domain namespace, nameless v1 docs dropped; openssl listing rows
    (openssl.py:118-157): suffix-stripped versions, constant project
    fields."""
    b = _base(spark, sf_dir)
    k, name, ver = F.col("k"), F.col("name"), F.col("ver")

    bug_a = F.when(
        k % 2 == 0,
        F.concat(
            F.lit('<a href="https://bugs.freedesktop.org/buglist.cgi?product='),
            name, F.lit('">bugs</a>'),
        ),
    ).otherwise(F.lit(""))
    code_a = F.when(
        k % 3 == 0,
        F.concat(
            F.lit('<a href="http://cgit.freedesktop.org/'), name,
            F.lit('/tree/">code</a>'),
        ),
    ).otherwise(F.lit(""))
    git_li = F.when(
        k % 3 != 1,
        F.concat(
            F.lit("<li><b>git://anongit.freedesktop.org/git/"), name,
            F.lit("</b></li>"),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><h1> Project "), name, F.lit(" </h1>"),
        F.lit('<a href="https://www.freedesktop.org/software/'), name,
        F.lit("/releases/"), name, F.lit('-1.0.tar.gz">old</a>'),
        F.lit('<a href="https://www.freedesktop.org/software/'), name,
        F.lit("/dist/"), name, F.lit('-2.0.tar.gz">new</a>'),
        bug_a,
        F.lit('<a href="https://example.com/other">x</a>'),
        code_a,
        git_li,
        F.lit("<li>not a repo</li></html>"),
    )
    fd = map_freedesktop_pages(
        b.select(
            html.alias("html"),
            F.concat(
                F.lit("https://www.freedesktop.org/wiki/Software/"), name, F.lit("/")
            ).alias("uri"),
            F.concat(F.lit("pkg:freedesktop/"), name, F.lit("@0.9")).alias(
                "package_url"
            ),
        )
    ).select(
        "type",
        "name",
        F.lit(None).cast("string").alias("namespace"),
        "version",
        "purl",
        "description",
        "homepage_url",
        "download_url",
        "bug_tracking_url",
        "code_view_url",
        "vcs_url",
        F.lit(None).cast("string").alias("extracted_license_statement"),
        F.lit(None).cast("string").alias("keywords"),
        F.lit(None).cast("long").alias("size"),
        F.lit(None).cast("string").alias("release_date"),
        F.lit(None).cast("string").alias("copyright"),
        F.lit(None).cast("string").alias("datasource_id"),
    )

    summary = F.when(
        k % 3 != 0, F.concat(F.lit('"summary":"Sum '), name, F.lit('",'))
    ).otherwise(F.lit(""))
    longd = F.when(
        k % 3 != 1, F.concat(F.lit('"description":"Long '), name, F.lit('",'))
    ).otherwise(F.lit(""))
    gc_lic = F.when(k % 2 == 0, F.lit('"license":"Apache-2.0",')).otherwise(F.lit(""))
    labels = F.when(k % 5 != 0, F.lit('"labels":["a"," b ",""],')).otherwise(
        F.lit("")
    )
    v2_doc = F.concat(
        F.lit('{"name":"gc-'), name, F.lit('",'),
        summary, longd, gc_lic, labels,
        F.lit('"x":1}'),
    )
    gc2 = map_googlecode_v2_docs(b.select(v2_doc.alias("doc")))

    v1_name = F.when(k % 7 != 0, F.concat(F.lit('"name":"v1-'), name, F.lit('",'))).otherwise(
        F.lit("")
    )
    v1_domain = F.when(k % 2 == 0, F.lit('"domain":"code.google.com",')).otherwise(
        F.lit("")
    )
    v1_doc = F.concat(
        F.lit("{"),
        v1_name,
        F.lit('"description":"V1 '), name, F.lit('",'),
        v1_domain,
        F.lit('"license":"BSD","labels":["x"],'),
        F.lit('"ancestorRepo":"https://code.google.com/archive/p/'), name,
        F.lit('"}'),
    )
    gc1 = map_googlecode_v1_docs(b.select(v1_doc.alias("doc")))

    def _gc_align(df: DataFrame) -> DataFrame:
        return df.select(
            "type",
            "name",
            "namespace",
            F.lit(None).cast("string").alias("version"),
            "purl",
            "description",
            *[
                F.lit(None).cast("string").alias(c)
                for c in (
                    "homepage_url",
                    "download_url",
                    "bug_tracking_url",
                    "code_view_url",
                )
            ],
            "vcs_url",
            "extracted_license_statement",
            "keywords",
            F.lit(None).cast("long").alias("size"),
            F.lit(None).cast("string").alias("release_date"),
            F.lit(None).cast("string").alias("copyright"),
            "datasource_id",
        )

    ext = F.when(k % 2 == 0, F.lit(".tar.gz")).otherwise(F.lit(".tar.gz.sha256"))
    ssl_uri = F.concat(
        F.lit("https://ftp.openssl.org/source/openssl-"), ver,
        F.lit("-"), k.cast("string"), ext,
    )
    ssl = map_openssl_listing(
        b.select(
            ssl_uri.alias("uri"),
            F.col("size").alias("size"),
            F.lit("2018-09-11 13:01:22").alias("last_modified_date"),
        )
    ).select(
        "type",
        "name",
        F.lit(None).cast("string").alias("namespace"),
        "version",
        "purl",
        "description",
        "homepage_url",
        "download_url",
        "bug_tracking_url",
        "code_view_url",
        "vcs_url",
        "extracted_license_statement",
        F.lit(None).cast("string").alias("keywords"),
        "size",
        "release_date",
        "copyright",
        "datasource_id",
    )
    return fd.unionByName(_gc_align(gc2)).unionByName(_gc_align(gc1)).unionByName(ssl)
