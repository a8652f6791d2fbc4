"""Match post-processing queries (operators/postprocess.py — reference
matchcode/pipes/matching.py:469-529). Fixture from the part table:
each row is a matched resource in an ``-extract`` directory with 1-3
candidate packages whose coverage differs by construction; rows k%7=0
sit inside a NESTED inner-extract directory and must be excluded; rows
k%4=0 have two equal-coverage candidates (E/F) to pin the documented
tie-break (package id ascending).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.operators.postprocess import (
    assign_best_packages,
    surviving_packages,
)
from purldb_spark.plans.registry import query

_MATCHES_SQL = """
  WITH base AS (
    SELECT p_partkey AS k, p_partkey % 40 AS g FROM part
  ),
  rows_ AS (
    SELECT k, g,
           'proj/d' || CAST(g AS VARCHAR) || '-extract' AS directory,
           'proj/d' || CAST(g AS VARCHAR) || '-extract' ||
             (CASE WHEN k % 7 = 0 THEN '/inner-extract/x' ELSE '/f' END)
             || CAST(k AS VARCHAR) || '.c' AS resource_path
    FROM base
  ),
  matches AS (
    SELECT directory, resource_path, 'A' || CAST(g AS VARCHAR) AS package_uid
    FROM rows_ WHERE k % 2 = 0 AND k % 4 <> 0
    UNION ALL
    SELECT directory, resource_path, 'B' || CAST(g AS VARCHAR)
    FROM rows_ WHERE k % 2 = 1
    UNION ALL
    SELECT directory, resource_path, 'E' || CAST(g AS VARCHAR)
    FROM rows_ WHERE k % 4 = 0
    UNION ALL
    SELECT directory, resource_path, 'F' || CAST(g AS VARCHAR)
    FROM rows_ WHERE k % 4 = 0
    UNION ALL
    SELECT directory, resource_path, 'Z' || CAST(g AS VARCHAR)
    FROM rows_ WHERE k % 10 < 2
  ),
  kept AS (
    SELECT * FROM matches
    WHERE NOT regexp_matches(
      substring(resource_path, length(directory) + 1), '.*-extract/.*')
  ),
  counts AS (
    SELECT directory, package_uid, count(*) AS package_coverage
    FROM kept GROUP BY 1, 2
  ),
  ranked AS (
    SELECT k.directory, k.resource_path, k.package_uid, c.package_coverage,
           row_number() OVER (
             PARTITION BY k.directory, k.resource_path
             ORDER BY c.package_coverage DESC, k.package_uid ASC
           ) AS rn
    FROM kept k JOIN counts c
      ON k.directory = c.directory AND k.package_uid = c.package_uid
  ),
  assigned AS (
    SELECT directory, resource_path, package_uid, package_coverage
    FROM ranked WHERE rn = 1
  )
"""


def _matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    g = (k % 40).cast("string")
    directory = F.concat(F.lit("proj/d"), g, F.lit("-extract"))
    path = F.concat(
        directory,
        F.when(k % 7 == 0, F.lit("/inner-extract/x")).otherwise(F.lit("/f")),
        k.cast("string"),
        F.lit(".c"),
    )
    base = p.select(
        k.alias("k"), directory.alias("directory"), path.alias("resource_path")
    )
    kk = F.col("k")

    def pick(cond, prefix):
        return base.filter(cond).select(
            "directory",
            "resource_path",
            F.concat(
                F.lit(prefix),
                F.regexp_extract("directory", r"d(\d+)-extract", 1),
            ).alias("package_uid"),
        )

    return (
        pick((kk % 2 == 0) & (kk % 4 != 0), "A")
        .unionByName(pick(kk % 2 == 1, "B"))
        .unionByName(pick(kk % 4 == 0, "E"))
        .unionByName(pick(kk % 4 == 0, "F"))
        .unionByName(pick(kk % 10 < 2, "Z"))
    )


@query(
    "match_post_assign",
    oracle=_MATCHES_SQL
    + """
    SELECT directory, resource_path, package_uid,
           CAST(package_coverage AS BIGINT) AS package_coverage
    FROM assigned
    """,
)
def match_post_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-package reassignment (matching.py:494-529): coverage counts
    per (extract directory, package) with nested-extract contents
    excluded, then a per-resource argmax (coverage desc, package id asc)
    — the set-oriented equivalent of the reference's greedy ranked
    walk."""
    return assign_best_packages(_matches(spark, sf_dir))


@query(
    "match_post_packages",
    oracle=_MATCHES_SQL
    + """
    SELECT package_uid, CAST(count(*) AS BIGINT) AS n_resources
    FROM assigned GROUP BY package_uid
    """,
)
def match_post_packages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving packages after reassignment — the complement of
    remove_packages_without_resources (pipelines/matching.py:136-139):
    packages retaining >= 1 resource, with their retained count; losers
    (every F package, out-ranked Z packages) are absent."""
    return surviving_packages(assign_best_packages(_matches(spark, sf_dir)))
