"""Miner-mapper queries, batch 6: bower / haxe / dockerhub / nix
(sources/miners6.py). Same fixture strategy as q_miners3/4/5 — real
ecosystem-shaped JSON documents built with column concat, mapped by the
real parsers, expected rows computed directly by the oracle from the
generating index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query
from purldb_spark.sources.miners6 import (
    map_bower_docs,
    map_dockerhub_docs,
    map_haxe_docs,
    map_nix_docs,
)

_NAME_SQL = "lower(replace(p_brand, '#', '-')) || '-' || CAST(p_partkey AS VARCHAR)"
_VER_SQL = (
    "CAST(p_partkey % 9 AS VARCHAR) || '.' || CAST(p_partkey % 5 AS VARCHAR) || '.0'"
)

_BASE_SQL = f"""
  SELECT p_partkey AS k, {_NAME_SQL} AS name, {_VER_SQL} AS ver,
         CAST(p_size AS BIGINT) AS size, md5(p_name) AS cs,
         'ff' || substring(md5(p_name), 3) AS cs2
  FROM part
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    cs = F.md5("p_name")
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
        cs.alias("cs"),
        F.concat(F.lit("ff"), F.substring(cs, 3, 32)).alias("cs2"),
    )


@query(
    "x_bower_haxe_map",
    oracle=f"""
    WITH base AS ({_BASE_SQL})
    SELECT 'bower' AS type, name, ver AS version,
           'pkg:bower/' || name || CASE WHEN version IS NOT NULL THEN '@' || version ELSE '' END AS purl,
           'Bower pkg ' || name AS description,
           'https://bower.ex/' || name AS homepage_url,
           CASE WHEN k % 3 = 0 THEN 'MIT; Apache-2.0'
                WHEN k % 3 = 1 THEN 'MIT' END
             AS extracted_license_statement,
           'web; ui' AS keywords,
           CASE WHEN k % 2 = 0 THEN 'Ann' ELSE 'Bob; Cid' END AS parties,
           'git+https://github.com/ex/' || name || '.git' AS vcs_url,
           NULL AS download_url,
           'jquery@^1.0' AS dependencies,
           CASE WHEN k % 4 = 0 THEN 'grunt' END AS dev_dependencies,
           'bower_json' AS datasource_id
    FROM base
    UNION ALL
    SELECT 'haxe', name, ver, 'pkg:haxe/' || name || '@' || ver,
           'Haxe lib ' || name,
           'https://haxe.ex/' || name, 'GPL',
           CASE WHEN k % 2 = 0 THEN 't1' END,
           'c-' || name,
           NULL,
           'https://lib.haxe.org/p/' || name || '/' || ver || '/download/',
           'pkg:haxe/actuate@1.8.7; pkg:haxe/openfl',
           NULL, 'haxelib_json'
    FROM base
    """,
)
def x_bower_haxe_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bower.json mapping (bower.py:105-206): string-vs-list licenses,
    set-dedup, author-over-authors with the colon-split quirk, git+url
    vcs; haxelib.json mapping (haxe.py:106-111): tag keywords,
    contributor parties, dependency purls with blank requirements
    dropped, /download/ URL."""
    b = _base(spark, sf_dir)
    k, name, ver = F.col("k"), F.col("name"), F.col("ver")
    lic = (
        F.when(k % 3 == 0, F.lit('"licenses":["MIT","Apache-2.0","MIT"],'))
        .when(k % 3 == 1, F.lit('"licenses":"MIT",'))
        .otherwise(F.lit(""))
    )
    authors = F.when(k % 2 == 0, F.lit('"author":"Ann",')).otherwise(
        F.lit('"authors":["x: Bob","nocolon","y:Cid"],')
    )
    devdeps = F.when(k % 4 == 0, F.lit('"devDependencies":{"grunt":""},')).otherwise(
        F.lit("")
    )
    bower_doc = F.concat(
        F.lit('{"name":"'), name,
        F.lit('","version":"'), ver,
        F.lit('","description":"Bower pkg '), name,
        F.lit('","homepage":"https://bower.ex/'), name,
        F.lit('","keywords":["web","ui"],'),
        lic,
        authors,
        devdeps,
        F.lit('"repository":{"type":"git","url":"https://github.com/ex/'), name,
        F.lit('.git"},"dependencies":{"jquery":"^1.0"}}'),
    )
    bower = map_bower_docs(b.select(bower_doc.alias("doc"))).select(
        "type",
        "name",
        "version",
        "purl",
        "description",
        "homepage_url",
        "extracted_license_statement",
        "keywords",
        "parties",
        "vcs_url",
        F.lit(None).cast("string").alias("download_url"),
        "dependencies",
        "dev_dependencies",
        "datasource_id",
    )
    tags = F.when(k % 2 == 0, F.lit('"tags":["t1"],')).otherwise(F.lit(""))
    haxe_doc = F.concat(
        F.lit('{"name":"'), name,
        F.lit('","version":"'), ver,
        F.lit('","url":"https://haxe.ex/'), name,
        F.lit('","license":"GPL",'),
        tags,
        F.lit('"description":"Haxe lib '), name,
        F.lit('","contributors":["c-'), name,
        F.lit('"],"dependencies":{"actuate":"1.8.7","openfl":" "}}'),
    )
    haxe = map_haxe_docs(b.select(haxe_doc.alias("doc"))).select(
        "type",
        "name",
        "version",
        "purl",
        "description",
        "homepage_url",
        "extracted_license_statement",
        "keywords",
        "parties",
        F.lit(None).cast("string").alias("vcs_url"),
        "download_url",
        "dependencies",
        F.lit(None).cast("string").alias("dev_dependencies"),
        "datasource_id",
    )
    return bower.unionByName(haxe)


@query(
    "x_dockerhub_nix_map",
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    tags(tag, n) AS (VALUES ('latest', 0), ('1.0', 1)),
    docker AS (
      SELECT 'docker' AS type, name,
             CASE WHEN k % 2 = 1 THEN 'myorg' END AS namespace,
             tag AS version,
             'pkg:docker/' ||
               (CASE WHEN k % 2 = 1 THEN 'myorg/' ELSE '' END) ||
               name || '@' || tag AS purl,
             CASE WHEN k % 3 = 0 THEN 'Full desc ' || name
                  WHEN k % 3 = 1 THEN 'short ' || name
                  ELSE 'short ' || name || chr(10) || 'Full desc ' || name
                  END AS description,
             NULL AS extracted_license_statement,
             CAST(k % 2 = 0 AS VARCHAR) AS is_private,
             CASE WHEN n = 0 THEN cs ELSE cs2 END AS sha256,
             CASE WHEN n = 0 THEN size ELSE size + 5 END AS size,
             CASE WHEN n = 0 THEN 'u-' || name END AS parties,
             CASE WHEN k % 2 = 0
                  THEN 'https://hub.docker.com/_/' || name
                  ELSE 'https://hub.docker.com/r/myorg/' || name
                  END AS homepage_url,
             NULL AS release_date,
             'https://hub.docker.com/layers/' ||
               (CASE WHEN k % 2 = 1 THEN 'myorg' ELSE 'library' END) ||
               '/' || name || '/' || tag || '/images/sha256:' ||
               (CASE WHEN n = 0 THEN cs ELSE cs2 END) AS download_url,
             'dockerhub_repositories' AS datasource_id
      FROM base CROSS JOIN tags
    ),
    nixout(outn, n) AS (VALUES ('out', 0), ('', 1)),
    nix1 AS (
      SELECT 'nix' AS type, name, NULL AS namespace, ver AS version,
             'pkg:nix/' || name || '@' || ver || '?commit=c' ||
               substring(cs, 1, 8) ||
               (CASE WHEN n = 0 THEN '&output=out' ELSE '' END) ||
               '&system=x86_64-linux' AS purl,
             'Nix ' || name AS description,
             CASE WHEN k % 2 = 0 THEN 'MIT; BSD' ELSE 'GPL' END
               AS extracted_license_statement,
             NULL AS is_private,
             NULL AS sha256, CAST(NULL AS BIGINT) AS size, NULL AS parties,
             'https://nix.ex/' || name AS homepage_url,
             '2024-01-15' AS release_date,
             CASE WHEN n = 0
                  THEN 'https://cache.nixos.org/nar/' || cs || '.nar.xz' END
               AS download_url,
             'nix_api_metadata' AS datasource_id
      FROM base CROSS JOIN nixout
    ),
    nix2 AS (
      SELECT 'nix', name, NULL, '0.0.1',
             'pkg:nix/' || name || '@0.0.1?output=out&system=s2',
             'Nix ' || name,
             CASE WHEN k % 2 = 0 THEN 'MIT; BSD' ELSE 'GPL' END,
             NULL, NULL, CAST(NULL AS BIGINT), NULL,
             'https://nix.ex/' || name, NULL, NULL,
             'nix_api_metadata'
      FROM base WHERE k % 2 = 1
    )
    SELECT * FROM docker
    UNION ALL SELECT * FROM nix1
    UNION ALL SELECT * FROM nix2
    """,
)
def x_dockerhub_nix_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docker Hub tag mapping (dockerhub.py:200-246): blank description
    parts dropped, library-vs-org homepage and purl, sha256: digest
    prefix strip, per-tag layers download URL; nix metadata mapping
    (nix.py:53-121): purl-version release filter (off on odd k — all
    releases emit), null outputs skipped, alphabetical purl qualifiers
    with empties dropped, narinfo hash join resolving download URLs
    (unresolved -> null)."""
    b = _base(spark, sf_dir)
    k, name, ver, cs, cs2 = (
        F.col("k"),
        F.col("name"),
        F.col("ver"),
        F.col("cs"),
        F.col("cs2"),
    )
    short = F.when(k % 3 != 0, F.concat(F.lit('"description":"short '), name, F.lit('",'))).otherwise(
        F.lit("")
    )
    full = F.when(k % 3 == 1, F.lit('"full_description":"  ",')).otherwise(
        F.concat(F.lit('"full_description":"Full desc '), name, F.lit('",'))
    )
    docker_doc = F.concat(
        F.lit('{"summary":{'),
        short,
        full,
        F.lit('"is_private":'),
        F.when(k % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit('},"tags":[{"name":"latest","full_size":'),
        F.col("size").cast("string"),
        F.lit(',"digest":"sha256:'), cs,
        F.lit('","last_updater_username":"u-'), name,
        F.lit('"},{"name":"1.0","full_size":'),
        (F.col("size") + 5).cast("string"),
        F.lit(',"digest":"sha256:'), cs2,
        F.lit('"}]}'),
    )
    docker = map_dockerhub_docs(
        b.select(
            docker_doc.alias("doc"),
            name.alias("name"),
            F.when(k % 2 == 1, F.lit("myorg")).alias("namespace"),
        )
    ).select(
        "type",
        "name",
        "namespace",
        "version",
        "purl",
        "description",
        F.lit(None).cast("string").alias("extracted_license_statement"),
        F.col("is_private").cast("string").alias("is_private"),
        "sha256",
        "size",
        "parties",
        "homepage_url",
        F.lit(None).cast("string").alias("release_date"),
        "download_url",
        "datasource_id",
    )

    rel2 = F.when(
        k % 2 == 1,
        F.lit(
            ',{"version":"0.0.1","platforms":[{"system":"s2",'
            '"outputs":[{"name":"out","path":"/nix/store/c-x"}]}]}'
        ),
    ).otherwise(F.lit(""))
    lic = F.when(k % 2 == 0, F.lit('"license":["MIT","BSD"],')).otherwise(
        F.lit('"license":"GPL",')
    )
    nix_doc = F.concat(
        F.lit('{"name":"'), name,
        F.lit('","summary":"Nix '), name,
        F.lit('","homepage_url":"https://nix.ex/'), name,
        F.lit('",'),
        lic,
        F.lit('"releases":[{"version":"'), ver,
        F.lit('","platforms":[{"date":"2024-01-15","system":"x86_64-linux",'),
        F.lit('"commit_hash":"c'), F.substring(cs, 1, 8),
        F.lit('","outputs":[{"name":"out","path":"/nix/store/a'), cs,
        F.lit("-"), name, F.lit("-"), ver,
        F.lit('"},{"name":"","path":"/nix/store/b'), cs,
        F.lit('-dev"}]},{"system":"aarch64-linux","commit_hash":"",'),
        F.lit('"outputs":null}]}'),
        rel2,
        F.lit("]}"),
    )
    # cs = md5(p_name) repeats across part rows; the narinfo store is keyed
    # by hash — dedupe so the fixture join stays 1:1 like production
    narinfo = b.select(
        F.concat(F.lit("a"), cs).alias("hash"),
        F.concat(F.lit("nar/"), cs, F.lit(".nar.xz")).alias("url_path"),
    ).dropDuplicates(["hash"])
    want = F.when(k % 2 == 0, ver)
    nix = map_nix_docs(
        b.select(nix_doc.alias("doc"), want.alias("want")),
        narinfo=narinfo,
        version_col="want",
    ).select(
        "type",
        "name",
        F.lit(None).cast("string").alias("namespace"),
        "version",
        "purl",
        "description",
        "extracted_license_statement",
        F.lit(None).cast("string").alias("is_private"),
        F.lit(None).cast("string").alias("sha256"),
        F.lit(None).cast("long").alias("size"),
        F.lit(None).cast("string").alias("parties"),
        "homepage_url",
        F.col("release_date").cast("string").alias("release_date"),
        "download_url",
        "datasource_id",
    )
    return docker.unionByName(nix)
