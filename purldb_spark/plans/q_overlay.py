"""M4 enhanced-package overlay, M5 history append, and the §2.8 scalar
bundle (C5/C7/C8/C10) as oracle-verified queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query


@query(
    "m4_enhanced_overlay",
    oracle="""
    WITH sets AS (
      SELECT p_partkey, p_brand || '/' || p_type AS set_key,
             p_size % 3 + 1 AS package_content,
             CASE WHEN p_size % 3 = 0 THEN NULL ELSE p_name END AS description,
             CASE WHEN p_partkey % 2 = 0 THEN NULL
                  ELSE CAST(p_retailprice AS VARCHAR) END AS homepage
      FROM part
    )
    SELECT p_partkey, set_key, package_content,
           coalesce(description,
                    first_value(description IGNORE NULLS)
                      OVER (PARTITION BY set_key
                            ORDER BY package_content, p_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING)) AS description,
           coalesce(homepage,
                    first_value(homepage IGNORE NULLS)
                      OVER (PARTITION BY set_key
                            ORDER BY package_content, p_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING)) AS homepage
    FROM sets
    """,
)
def m4_enhanced_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: enhanced-package overlay (packagedb/api.py:643-721): fill a
    package's missing fields from its package-set peers, preferring lower
    `package_content` (source-repo < source-archive < binary), keeping the
    row's own value when present. One window per field — no self-join
    explosion; the whole overlay is a single shuffle on the set key."""
    p = load(spark, sf_dir, "part")
    sets = p.select(
        "p_partkey",
        F.concat_ws("/", "p_brand", "p_type").alias("set_key"),
        (F.col("p_size") % 3 + 1).alias("package_content"),
        F.when(F.col("p_size") % 3 == 0, F.lit(None))
        .otherwise(F.col("p_name"))
        .alias("description"),
        F.when(F.col("p_partkey") % 2 == 0, F.lit(None))
        .otherwise(F.col("p_retailprice").cast("string"))
        .alias("homepage"),
    )
    w = (
        Window.partitionBy("set_key")
        .orderBy("package_content", "p_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    fill = lambda c: F.coalesce(F.col(c), F.first(F.col(c), ignorenulls=True).over(w))  # noqa: E731
    return sets.select(
        "p_partkey",
        "set_key",
        "package_content",
        fill("description").alias("description"),
        fill("homepage").alias("homepage"),
    )


@query(
    "m5_history_append",
    oracle="""
    SELECT o_orderkey,
           array_to_string([
             'created:' || strftime(o_orderdate, '%Y-%m-%d'),
             'status:' || o_orderstatus
           ], '|') AS history,
           2 AS n_events
    FROM orders WHERE o_orderkey % 500 = 0
    """,
)
def m5_history_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5/C11: append-only history column (packagedb/models.py:123-136) —
    build + extend a typed event array with pure array functions
    (concat/array_union shape); serialized as array<string> for
    engine-portable comparison."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 500 == 0)
    created = F.concat(F.lit("created:"), F.date_format("o_orderdate", "yyyy-MM-dd"))
    status = F.concat(F.lit("status:"), F.col("o_orderstatus"))
    hist = F.concat(F.array(created), F.array(status))
    # serialized for comparison: array cells round-trip differently through
    # pandas in the two engines (list vs numpy array)
    return o.select(
        "o_orderkey",
        F.array_join(hist, "|").alias("history"),
        F.size(hist).alias("n_events"),
    )


@query(
    "c_scalar_bundle",
    oracle="""
    SELECT e.event_id,
           lower(e.event_type) AS norm_type,                              -- C1
           split_part(e.props, '"', 1) IS NOT NULL
             AND e.event_id IS NOT NULL AS flags_ok,                      -- P9-ish guard
           list_extract(string_split(
             'https://host.example/a/b/pkg-' || CAST(e.event_id AS VARCHAR) || '.tgz',
             '/'), -1) AS filename,                                       -- C7
           strftime(e.ts, '%Y-%m-%d') AS day,                             -- C8
           CAST(epoch_ms(e.ts) AS BIGINT) AS epoch_millis,                -- C8
           CASE WHEN length(md5(CAST(e.event_id AS VARCHAR))) = 32
                THEN md5(CAST(e.event_id AS VARCHAR)) END AS checked_md5, -- C10
           upper(substr(md5(CAST(e.event_id AS VARCHAR)), 1, 8)) AS hex_up -- C5
    FROM events e WHERE e.event_id % 200 = 0
    """,
)
def c_scalar_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 scalar bundle: lowercase normalization (C1), filename-from-URL
    via split (C7), date formatting + epoch millis (C8), checksum length
    validation (C10), hex case handling (C5). All single-pass projections."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 200 == 0)
    url = F.concat(
        F.lit("https://host.example/a/b/pkg-"),
        F.col("event_id").cast("string"),
        F.lit(".tgz"),
    )
    md5k = F.md5(F.col("event_id").cast("string"))
    return e.select(
        "event_id",
        F.lower("event_type").alias("norm_type"),
        (F.split("props", '"').getItem(0).isNotNull() & F.col("event_id").isNotNull()).alias(
            "flags_ok"
        ),
        F.element_at(F.split(url, "/"), -1).alias("filename"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("epoch_millis"),
        F.when(F.length(md5k) == 32, md5k).alias("checked_md5"),
        F.upper(F.substring(md5k, 1, 8)).alias("hex_up"),
    )


@query(
    "c9_license_combine",
    oracle="""
    WITH detected AS (
      SELECT p_brand,
             CASE p_size % 4 WHEN 0 THEN 'mit'
                             WHEN 1 THEN 'apache-2.0'
                             WHEN 2 THEN 'gpl-2.0 WITH classpath-exception-2.0'
                             ELSE 'bsd-new OR mit' END AS expr
      FROM part
    ),
    uniq AS (SELECT DISTINCT p_brand, expr FROM detected),
    rolled AS (
      SELECT p_brand,
             list(CASE WHEN contains(expr, ' OR ') OR contains(expr, ' AND ')
                       THEN '(' || expr || ')' ELSE expr END
                  ORDER BY expr) AS exprs
      FROM uniq GROUP BY p_brand
    )
    SELECT p_brand, array_to_string(exprs, ' AND ') AS declared_license_expression,
           len(exprs) AS n_licenses
    FROM rolled
    """,
)
def c9_license_combine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: roll per-file detected license expressions up to one package-level
    declared expression (minecode/indexing.py:208-215): dedup, deterministic
    sort, parenthesize compound sub-expressions, AND-join — entirely as
    aggregation (sort_array + transform + array_join), no UDF. The Python
    twin for driver-side use is functions/licenses.combine_expressions."""
    p = load(spark, sf_dir, "part")
    expr = (
        F.when(F.col("p_size") % 4 == 0, "mit")
        .when(F.col("p_size") % 4 == 1, "apache-2.0")
        .when(F.col("p_size") % 4 == 2, "gpl-2.0 WITH classpath-exception-2.0")
        .otherwise("bsd-new OR mit")
    )
    uniq = p.select("p_brand", expr.alias("expr")).dropDuplicates()
    rolled = uniq.groupBy("p_brand").agg(
        F.expr(
            "transform(sort_array(collect_set(expr)),"
            " e -> CASE WHEN e LIKE '% OR %' OR e LIKE '% AND %'"
            " THEN concat('(', e, ')') ELSE e END)"
        ).alias("exprs")
    )
    return rolled.select(
        "p_brand",
        F.array_join("exprs", " AND ").alias("declared_license_expression"),
        F.size("exprs").alias("n_licenses"),
    )
