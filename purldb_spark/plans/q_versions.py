"""Version-resolution queries — SURVEY §2.4 A7, §2.5 W2, §2.9 V2-V4.

The synthetic catalog has no version column, so one is derived
deterministically from part keys — identically on both engines — with
dotted multi-digit segments and prerelease suffixes, exactly the shapes that
break lexicographic ordering ("1.10.0" vs "1.9.0", "2.0.0-beta2" vs
"2.0.0").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.functions.versions import (
    nat_version_key,
    nat_version_key_sql,
    version_in_range,
    version_in_range_sql,
)
from purldb_spark.plans.registry import query

# version := (size%3).(key%12).(key%7) plus '-beta(key%3)' on every 5th key
_VERSION_SQL = (
    "CAST(p_size % 3 AS VARCHAR) || '.' || CAST(p_partkey % 12 AS VARCHAR)"
    " || '.' || CAST(p_partkey % 7 AS VARCHAR)"
    " || CASE WHEN p_partkey % 5 = 0 THEN '-beta' || CAST(p_partkey % 3 AS VARCHAR)"
    " ELSE '' END"
)


def _with_version(df: DataFrame) -> DataFrame:
    v = F.concat(
        (F.col("p_size") % 3).cast("string"),
        F.lit("."),
        (F.col("p_partkey") % 12).cast("string"),
        F.lit("."),
        (F.col("p_partkey") % 7).cast("string"),
        F.when(
            F.col("p_partkey") % 5 == 0,
            F.concat(F.lit("-beta"), (F.col("p_partkey") % 3).cast("string")),
        ).otherwise(F.lit("")),
    )
    return df.withColumn("version", v)


@query(
    "a7_latest_version",
    oracle=f"""
    WITH versioned AS (
      SELECT p_brand, {_VERSION_SQL} AS version FROM part
    )
    SELECT p_brand,
           arg_max(version, {nat_version_key_sql("version")}) AS latest_version,
           count(DISTINCT version) AS n_versions
    FROM versioned GROUP BY p_brand
    """,
)
def a7_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/W2: highest version per package under NATURAL ordering
    (packagedb/models.py:51-53,595-609). max_by over the order-preserving
    key — one aggregation, no window, no UDF; '0.10.3' beats '0.9.6' and
    '2.0.0' beats '2.0.0-beta1'."""
    p = _with_version(load(spark, sf_dir, "part"))
    return p.groupBy("p_brand").agg(
        F.expr("max_by(version, " + _NAT_KEY_EXPR + ")").alias("latest_version"),
        F.countDistinct("version").alias("n_versions"),
    )


# the same key expression nat_version_key builds, as inline text for max_by
_NAT_KEY_EXPR = (
    "concat("
    "array_join(transform(regexp_extract_all(regexp_extract(version, '^([^-]*)', 1),"
    " '([0-9]+)', 1), x -> lpad(x, 12, '0')), '.'),"
    " case when contains(version, '-') then concat('.!',"
    " array_join(transform(regexp_extract_all(regexp_extract(version, '-(.*)$', 1),"
    " '([0-9]+)', 1), x -> lpad(x, 12, '0')), '.')) else '.+' end)"
)


@query(
    "v2_version_range_filter",
    oracle=f"""
    WITH versioned AS (
      SELECT p_partkey, {_VERSION_SQL} AS version FROM part
    )
    SELECT p_partkey, version FROM versioned
    WHERE {version_in_range_sql("version", "0.10.0", "2.3.0")}
    """,
)
def v2_version_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2: `vers:` range containment (packagedb/api.py:1309-1342) — keep
    versions in [0.10.0, 2.3.0) under natural ordering. Lexicographic
    comparison would wrongly exclude 0.10.x (`'0.10' < '0.9'` as strings);
    the key makes the range a plain string-range predicate that pushes into
    the scan."""
    p = _with_version(load(spark, sf_dir, "part")).select("p_partkey", "version")
    return p.filter(version_in_range("version", "0.10.0", "2.3.0"))


@query(
    "v3_until_date_partition",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN ts <= TIMESTAMP '2024-03-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN ts >  TIMESTAMP '2024-03-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_newer
    FROM events GROUP BY event_type
    """,
)
def v3_until_date_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3: until-date version split (packagedb/package_managers.py:109-124)
    — partition releases into valid vs newer-than-cutoff."""
    e = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-03-01 00:00:00").cast("timestamp")
    return e.groupBy("event_type").agg(
        F.sum(F.when(F.col("ts") <= cutoff, 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(F.col("ts") > cutoff, 1).otherwise(0)).alias("n_newer"),
    )


@query(
    "v4_version_expansion",
    oracle=f"""
    WITH versioned AS (
      SELECT p_brand, {_VERSION_SQL} AS version FROM part
    ),
    rolled AS (
      SELECT p_brand, list(DISTINCT version) AS versions FROM versioned GROUP BY p_brand
    )
    SELECT p_brand, unnest(versions) AS version FROM rolled
    """,
)
def v4_version_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4: versionless purl -> one row per released version
    (packagedb/api.py:1292-1306): roll all versions of a package up into an
    array, explode back to rows — the explode(versions_array) shape used by
    the collect/index endpoints."""
    p = _with_version(load(spark, sf_dir, "part"))
    rolled = p.groupBy("p_brand").agg(F.collect_set("version").alias("versions"))
    return rolled.select("p_brand", F.explode("versions").alias("version"))
