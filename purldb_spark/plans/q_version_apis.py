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
from purldb_spark.plans import sqltext as S
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
    k = S.col("s_suppkey")
    day = lambda n, t: S.concat(  # noqa: E731
        S.fn(
            "date_add", S.fn("to_date", "2020-01-01"), (k % n).cast("int")
        ).cast("string"),
        t,
    )
    return S.sel(
        s,
        S.concat("pkg", k.cast("string")).alias("pkg"),
        S.concat((k % 5).cast("string"), ".", (k % 3).cast("string"), ".0").alias("v1"),
        S.concat((k % 5).cast("string"), ".", (k % 3).cast("string"), ".1").alias("v2"),
        day(400, "T00:00:00Z").alias("d1"),
        day(300, "T12:00:00Z").alias("d2"),
    )


def _tagged(parser, base: DataFrame, doc, source: str) -> DataFrame:
    return parser(S.sel(base, "pkg", doc.alias("doc"))).selectExpr(
        f"{S.lit(source).sql} AS source", "pkg", "version", "release_date"
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
    v1, v2, d1, d2 = S.col("v1"), S.col("v2"), S.col("d1"), S.col("d2")
    npm = S.concat(
        '{"versions":{"', v1, '":{},"', v2, '":{}},"time":{"',
        v1, '":"', d1, '","', v2, '":"', d2, '"}}',
    )
    crates = S.concat(
        '{"versions":[{"num":"', v1, '","updated_at":"', d1,
        '"},{"num":"', v2, '","updated_at":"', d2, '"}]}',
    )
    hexd = S.concat(
        '{"releases":[{"version":"', v1, '","inserted_at":"', d1,
        '"},{"version":"', v2, '","inserted_at":"', d2, '"}]}',
    )
    # v2 has an empty download list -> dropped; v1's date folds to the max
    pypi = S.concat(
        '{"releases":{"', v1, '":[{"upload_time_iso_8601":"', d1,
        '"},{"upload_time_iso_8601":"', d2, '"}],"', v2, '":[]}}',
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
    v1, v2, d1, d2 = S.col("v1"), S.col("v2"), S.col("d1"), S.col("d2")
    maven = S.concat(
        "<metadata><versioning><versions><version>", v1,
        "</version><version>", v2,
        "</version></versions></versioning></metadata>",
    )
    goproxy = S.concat("v", v1, " ", d1, "\nv", v2, "\n")
    debian = S.concat(
        '{"versions":[{"version":"0:', v1, '-1"},{"version":"',
        v2, '"}]}',
    )
    launchpad = S.concat(
        '{"entries":[{"source_package_version":"0:', v1,
        '","date_published":"', d1,
        '"},{"date_published":"', d2, '"}]}',
    )
    composer = S.concat(
        '{"packages":{"', S.col("pkg"), '":{"v', v1,
        '":{"time":"', d1, '"},"', v2, '-dev":{"time":"',
        d2, '"}}}}',
    )
    nuget = S.concat(
        '{"items":[{"items":[{"catalogEntry":{"version":"', v1,
        '","published":"', d1, '"}},{"catalogEntry":{}}]}]}',
    )
    gem = S.concat(
        '[{"number":"', v1, '","published_at":"', d1,
        '"},{"number":"', v2, '","created_at":"', d2,
        '"},{"published_at":"', d1, '"}]',
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
