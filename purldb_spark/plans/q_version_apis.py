"""V1 version-list API queries: every ecosystem response shape from the
reference's 11 VersionAPI fetchers (packagedb/package_managers.py:139-541)
parsed by sources/version_apis.py and checked against a DuckDB oracle.

Same fixture strategy as q_miners: each query GENERATES ecosystem-shaped
response documents (real JSON / XML / proxy-text strings built with column
concat) from a base table, runs the real from_json/regexp parsers on the
Spark side, and the oracle SQL computes the expected (pkg, version,
release_date) rows directly — any drift in map-explode semantics, epoch
stripping, dev-version skipping, v-prefix cleaning, or the get_until split
breaks the hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query
from purldb_spark.sources.version_apis import (
    parse_composer,
    parse_crates,
    parse_debian,
    parse_goproxy_list,
    parse_hex,
    parse_launchpad,
    parse_maven_metadata,
    parse_npm,
    parse_nuget,
    parse_pypi,
    parse_rubygems,
    split_until,
)

_UNTIL = "2020-06-01T00:00:00Z"

_BASE_SQL = """
  SELECT 'pkg' || CAST(s_suppkey AS VARCHAR) AS pkg,
         CAST(s_suppkey % 5 AS VARCHAR) || '.'
           || CAST(s_suppkey % 3 AS VARCHAR) || '.0' AS v1,
         CAST(s_suppkey % 5 AS VARCHAR) || '.'
           || CAST(s_suppkey % 3 AS VARCHAR) || '.1' AS v2,
         CAST(DATE '2020-01-01' + CAST(s_suppkey % 400 AS INTEGER) AS VARCHAR)
           || 'T00:00:00Z' AS d1,
         CAST(DATE '2020-01-01' + CAST(s_suppkey % 300 AS INTEGER) AS VARCHAR)
           || 'T12:00:00Z' AS d2
  FROM supplier
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    day = lambda n, t: F.concat(  # noqa: E731
        F.date_add(F.to_date(F.lit("2020-01-01")), (k % n).cast("int")).cast("string"),
        F.lit(t),
    )
    return s.select(
        F.concat(F.lit("pkg"), k.cast("string")).alias("pkg"),
        F.concat((k % 5).cast("string"), F.lit("."), (k % 3).cast("string"), F.lit(".0")).alias("v1"),
        F.concat((k % 5).cast("string"), F.lit("."), (k % 3).cast("string"), F.lit(".1")).alias("v2"),
        day(400, "T00:00:00Z").alias("d1"),
        day(300, "T12:00:00Z").alias("d2"),
    )


def _tagged(parser, base: DataFrame, doc, source: str) -> DataFrame:
    return parser(base.select("pkg", doc.alias("doc"))).select(
        F.lit(source).alias("source"), "pkg", "version", "release_date"
    )


@query(
    "x_version_api_parse_json",
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    parsed AS (
      SELECT 'npm' AS source, pkg, v1 AS version, d1 AS release_date FROM base
      UNION ALL SELECT 'npm', pkg, v2, d2 FROM base
      UNION ALL SELECT 'cargo', pkg, v1, d1 FROM base
      UNION ALL SELECT 'cargo', pkg, v2, d2 FROM base
      UNION ALL SELECT 'hex', pkg, v1, d1 FROM base
      UNION ALL SELECT 'hex', pkg, v2, d2 FROM base
      UNION ALL SELECT 'pypi', pkg, v1, greatest(d1, d2) FROM base
    )
    SELECT source, pkg, version, release_date,
           release_date IS NOT NULL AND release_date > '{_UNTIL}' AS is_newer
    FROM parsed
    """,
)
def x_version_api_parse_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """npm / crates / hex / pypi JSON shapes: map-keys explode with time
    lookup, versions arrays, and pypi's latest-upload-date fold; plus the
    VersionAPI.get_until valid/newer split as is_newer."""
    b = _base(spark, sf_dir)
    v1, v2, d1, d2 = F.col("v1"), F.col("v2"), F.col("d1"), F.col("d2")
    npm = F.concat(
        F.lit('{"versions":{"'), v1, F.lit('":{},"'), v2, F.lit('":{}},"time":{"'),
        v1, F.lit('":"'), d1, F.lit('","'), v2, F.lit('":"'), d2, F.lit('"}}'),
    )
    crates = F.concat(
        F.lit('{"versions":[{"num":"'), v1, F.lit('","updated_at":"'), d1,
        F.lit('"},{"num":"'), v2, F.lit('","updated_at":"'), d2, F.lit('"}]}'),
    )
    hexd = F.concat(
        F.lit('{"releases":[{"version":"'), v1, F.lit('","inserted_at":"'), d1,
        F.lit('"},{"version":"'), v2, F.lit('","inserted_at":"'), d2, F.lit('"}]}'),
    )
    # v2 has an empty download list -> dropped; v1's date folds to the max
    pypi = F.concat(
        F.lit('{"releases":{"'), v1, F.lit('":[{"upload_time_iso_8601":"'), d1,
        F.lit('"},{"upload_time_iso_8601":"'), d2, F.lit('"}],"'), v2, F.lit('":[]}}'),
    )
    out = (
        _tagged(parse_npm, b, npm, "npm")
        .unionByName(_tagged(parse_crates, b, crates, "cargo"))
        .unionByName(_tagged(parse_hex, b, hexd, "hex"))
        .unionByName(_tagged(parse_pypi, b, pypi, "pypi"))
    )
    return out.withColumn(
        "is_newer", split_until(F.col("release_date"), F.lit(_UNTIL))
    )


@query(
    "x_version_api_parse_text",
    oracle=f"""
    WITH base AS ({_BASE_SQL})
    SELECT 'maven' AS source, pkg, v1 AS version,
           CAST(NULL AS VARCHAR) AS release_date FROM base
    UNION ALL SELECT 'maven', pkg, v2, NULL FROM base
    UNION ALL SELECT 'golang', pkg, 'v' || v1, d1 FROM base
    UNION ALL SELECT 'golang', pkg, 'v' || v2, NULL FROM base
    UNION ALL SELECT 'deb', pkg, v1 || '-1', NULL FROM base
    UNION ALL SELECT 'deb', pkg, v2, NULL FROM base
    UNION ALL SELECT 'deb/ubuntu', pkg, v1, d1 FROM base
    UNION ALL SELECT 'composer', pkg, v1, d1 FROM base
    UNION ALL SELECT 'nuget', pkg, v1, d1 FROM base
    UNION ALL SELECT 'gem', pkg, v1, d1 FROM base
    UNION ALL SELECT 'gem', pkg, v2, d2 FROM base
    """,
)
def x_version_api_parse_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maven-metadata.xml regexp extraction, goproxy @v/list line split,
    Debian/Launchpad epoch strip, composer dev-skip + v-strip, nuget nested
    registration pages, rubygems published/created fallback."""
    b = _base(spark, sf_dir)
    v1, v2, d1, d2 = F.col("v1"), F.col("v2"), F.col("d1"), F.col("d2")
    maven = F.concat(
        F.lit("<metadata><versioning><versions><version>"), v1,
        F.lit("</version><version>"), v2,
        F.lit("</version></versions></versioning></metadata>"),
    )
    goproxy = F.concat(F.lit("v"), v1, F.lit(" "), d1, F.lit("\nv"), v2, F.lit("\n"))
    debian = F.concat(
        F.lit('{"versions":[{"version":"0:'), v1, F.lit('-1"},{"version":"'),
        v2, F.lit('"}]}'),
    )
    launchpad = F.concat(
        F.lit('{"entries":[{"source_package_version":"0:'), v1,
        F.lit('","date_published":"'), d1,
        F.lit('"},{"date_published":"'), d2, F.lit('"}]}'),
    )
    composer = F.concat(
        F.lit('{"packages":{"'), F.col("pkg"), F.lit('":{"v'), v1,
        F.lit('":{"time":"'), d1, F.lit('"},"'), v2, F.lit('-dev":{"time":"'),
        d2, F.lit('"}}}}'),
    )
    nuget = F.concat(
        F.lit('{"items":[{"items":[{"catalogEntry":{"version":"'), v1,
        F.lit('","published":"'), d1, F.lit('"}},{"catalogEntry":{}}]}]}'),
    )
    gem = F.concat(
        F.lit('[{"number":"'), v1, F.lit('","published_at":"'), d1,
        F.lit('"},{"number":"'), v2, F.lit('","created_at":"'), d2,
        F.lit('"},{"published_at":"'), d1, F.lit('"}]'),
    )
    return (
        _tagged(parse_maven_metadata, b, maven, "maven")
        .unionByName(_tagged(parse_goproxy_list, b, goproxy, "golang"))
        .unionByName(_tagged(parse_debian, b, debian, "deb"))
        .unionByName(_tagged(parse_launchpad, b, launchpad, "deb/ubuntu"))
        .unionByName(_tagged(parse_composer, b, composer, "composer"))
        .unionByName(_tagged(parse_nuget, b, nuget, "nuget"))
        .unionByName(_tagged(parse_rubygems, b, gem, "gem"))
    )
