"""Bonus coverage: grouping-set aggregates (SURVEY §2.4's 'free if wanted'
note — cube/rollup don't exist in the reference but fall out of Spark), and
column-level URL<->purl extraction (C3 at query level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query


@query(
    "a_rollup_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS gross
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def a_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority): per-pair, per-status subtotal, grand
    total in one pass — the hierarchy the reference's stats endpoints compute
    with separate queries (minecode/models.py:597-611). NULL grouping slots
    are coalesced to 'ALL' so the three levels are distinguishable and
    hash-comparable."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
            .cast("double")
            .alias("gross"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "gross",
        )
    )


@query(
    "c3_url_purl_extract",
    oracle="""
    WITH urls AS (
      SELECT p_partkey,
             'https://registry.npmjs.org/' || replace(p_name, ' ', '-')
               || '/-/' || replace(p_name, ' ', '-') || '-'
               || CAST(p_size AS VARCHAR) || '.0.0.tgz' AS url
      FROM part WHERE p_partkey % 25 = 0
    )
    SELECT p_partkey, url,
           'pkg:npm/' || regexp_extract(url, 'registry\\.npmjs\\.org/([^/]+)/-/', 1)
             || '@' || regexp_extract(url, '-([0-9]+\\.[0-9]+\\.[0-9]+)\\.tgz$', 1)
             AS purl,
           regexp_extract(url, 'registry\\.npmjs\\.org/([^/]+)/-/', 1) AS name,
           regexp_extract(url, '-([0-9]+\\.[0-9]+\\.[0-9]+)\\.tgz$', 1) AS version
    FROM urls
    """,
)
def c3_url_purl_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3/to_purl at the column level (packagedb/to_purl.py:28-70): derive
    registry download URLs, then extract purl coordinates back out with
    JVM-side regexes — the url2purl path as a projection, no UDF."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 25 == 0)
    name = F.regexp_replace("p_name", " ", "-")
    url = F.concat(
        F.lit("https://registry.npmjs.org/"),
        name,
        F.lit("/-/"),
        name,
        F.lit("-"),
        F.col("p_size").cast("string"),
        F.lit(".0.0.tgz"),
    )
    urls = p.select("p_partkey", url.alias("url"))
    ex_name = F.regexp_extract("url", r"registry\.npmjs\.org/([^/]+)/-/", 1)
    ex_ver = F.regexp_extract("url", r"-([0-9]+\.[0-9]+\.[0-9]+)\.tgz$", 1)
    return urls.select(
        "p_partkey",
        "url",
        F.concat(F.lit("pkg:npm/"), ex_name, F.lit("@"), ex_ver).alias("purl"),
        ex_name.alias("name"),
        ex_ver.alias("version"),
    )
