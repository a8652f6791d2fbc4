"""update_packages intake query (reference packagedb/api.py:520-591
PackageUpdateSet, registered at purldb/urls.py:45). The endpoint takes
(purl, content_type) items plus an optional package-set uuid:

* a uuid naming no existing PackageSet rejects the request with the literal
  ``"No Package Set found for {uuid}"`` message (api.py:560-562);
* an item whose purl already matches a catalog package is passed through
  untouched with update_status ``"Already Exists"`` (api.py:573-574);
* otherwise a stub package is created from the purl lookups with
  ``download_url = " "`` and the item's PackageContentType value, added to
  the given set (or a freshly created one), update_status ``"Updated"``
  (api.py:576-585).

Spark shape: parse the purl into field columns (the same lookups
purl_to_lookups builds, packageurl field equality), one broadcast semi/anti
join against the catalog on (type, name, version), one broadcast lookup of
the set uuid — map-side only, no wide shuffle; at 100 TB of request logs the
catalog side is the big table and the join key (type, name, version) is its
natural bucketing key."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query

# PackageContentType (packagedb/models.py:438-449): name -> integer value
_CONTENT_TYPES = [
    "CURATION",
    "PATCH",
    "SOURCE_REPO",
    "SOURCE_ARCHIVE",
    "BINARY",
    "TEST",
    "DOC",
]

_NAME_SQL = "lower(replace(p_brand, '#', '-')) || '-' || CAST(p_partkey AS VARCHAR)"
_VER_SQL = (
    "CAST(p_partkey % 9 AS VARCHAR) || '.' || CAST(p_partkey % 5 AS VARCHAR) || '.0'"
)
_CT_NAME_SQL = (
    "["
    + ", ".join(f"'{n}'" for n in _CONTENT_TYPES)
    + "][(k % 7) + 1]"
)


@query(
    "x_update_packages",
    oracle=f"""
    WITH base AS (
      SELECT p_partkey AS k, {_NAME_SQL} AS name, {_VER_SQL} AS ver
      FROM part
    ),
    req AS (
      SELECT k, 'pkg:npm/' || name || '@' || ver AS purl,
             {_CT_NAME_SQL} AS content_type,
             CASE WHEN k % 5 = 0 THEN 'set-' || CAST(k AS VARCHAR)
                  WHEN k % 5 = 4 THEN 'feed-' || CAST(k AS VARCHAR)
             END AS set_uuid
      FROM base
    )
    SELECT k AS request_id, CAST(NULL AS VARCHAR) AS purl,
           'No Package Set found for feed-' || CAST(k AS VARCHAR)
             AS update_status,
           CAST(NULL AS BIGINT) AS package_content,
           CAST(NULL AS VARCHAR) AS download_url,
           CAST(NULL AS VARCHAR) AS set_uuid
    FROM req WHERE k % 5 = 4
    UNION ALL
    SELECT k, purl, 'Already Exists',
           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM req WHERE k % 5 <> 4 AND k % 3 = 0
    UNION ALL
    SELECT k, purl, 'Updated', CAST((k % 7) + 1 AS BIGINT), ' ',
           CASE WHEN k % 5 = 0 THEN 'set-' || CAST(k AS VARCHAR)
                ELSE 'new-' || CAST(k AS VARCHAR) END
    FROM req WHERE k % 5 <> 4 AND k % 3 <> 0
    """,
)
def x_update_packages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/api/update_packages as a batch pass: k%5=4 carries an unknown set
    uuid (request rejected with the api.py:561 message); remaining items
    match the catalog when k%3=0 (purls parsed to field lookups, equality
    on type/name/version) -> 'Already Exists'; the rest create stub
    packages (download_url ' ', PackageContentType value) in the given
    (k%5=0) or a fresh set -> 'Updated'."""
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    name = F.concat(
        F.lower(F.replace(F.col("p_brand"), F.lit("#"), F.lit("-"))),
        F.lit("-"),
        k.cast("string"),
    )
    ver = F.concat(
        (k % 9).cast("string"), F.lit("."), (k % 5).cast("string"), F.lit(".0")
    )
    ct_names = F.array(*[F.lit(n) for n in _CONTENT_TYPES])
    req = p.select(
        k.cast("long").alias("request_id"),
        F.concat(F.lit("pkg:npm/"), name, F.lit("@"), ver).alias("purl"),
        F.element_at(ct_names, (k % 7 + 1).cast("int")).alias("content_type"),
        F.when(k % 5 == 0, F.concat(F.lit("set-"), k.cast("string")))
        .when(k % 5 == 4, F.concat(F.lit("feed-"), k.cast("string")))
        .alias("set_uuid"),
    )
    # catalog + package-set fixtures (field columns, as packagedb stores them)
    catalog = p.filter(k % 3 == 0).select(
        F.lit("npm").alias("c_type"),
        name.alias("c_name"),
        ver.alias("c_version"),
    )
    sets = p.filter(k % 5 == 0).select(
        F.concat(F.lit("set-"), k.cast("string")).alias("known_set")
    )

    # purl -> lookups, column-side (the purl_to_lookups field split)
    parsed = req.select(
        "*",
        F.regexp_extract("purl", r"^pkg:([^/]+)/", 1).alias("r_type"),
        F.regexp_extract("purl", r"^pkg:[^/]+/([^@]+)@", 1).alias("r_name"),
        F.regexp_extract("purl", r"@(.+)$", 1).alias("r_version"),
    )
    with_set = parsed.join(
        F.broadcast(sets), parsed["set_uuid"] == sets["known_set"], "left"
    )
    in_catalog = (
        parsed.join(
            F.broadcast(catalog),
            (F.col("r_type") == F.col("c_type"))
            & (F.col("r_name") == F.col("c_name"))
            & (F.col("r_version") == F.col("c_version")),
            "left_semi",
        )
        .select(F.col("request_id").alias("hit_id"))
    )
    out = with_set.join(
        F.broadcast(in_catalog),
        with_set["request_id"] == in_catalog["hit_id"],
        "left",
    )
    set_missing = F.col("set_uuid").isNotNull() & F.col("known_set").isNull()
    exists = F.col("hit_id").isNotNull()
    content_val = F.array_position(ct_names, F.col("content_type")).cast("long")
    return out.select(
        "request_id",
        F.when(~set_missing, F.col("purl")).alias("purl"),
        F.when(
            set_missing,
            F.concat(F.lit("No Package Set found for "), F.col("set_uuid")),
        )
        .when(exists, F.lit("Already Exists"))
        .otherwise(F.lit("Updated"))
        .alias("update_status"),
        F.when(~set_missing & ~exists, content_val).alias("package_content"),
        F.when(~set_missing & ~exists, F.lit(" ")).alias("download_url"),
        F.when(
            ~set_missing & ~exists,
            F.coalesce(
                F.col("known_set"),
                F.concat(F.lit("new-"), F.col("request_id").cast("string")),
            ),
        ).alias("set_uuid"),
    )
