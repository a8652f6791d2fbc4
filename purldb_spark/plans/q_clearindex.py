"""ClearlyDefined harvest-mapping queries (sources/clearindex.py vs the
reference's clearindex/harvest.py map_scancode_harvest).

Fixture strategy as in q_miners/q_version_apis: real harvest-shaped JSON
documents are built with column concat from the part table, the Spark side
runs the actual from_json mapper, and the oracle SQL emits the expected
package / resource rows directly — covering the download_url dead-letter
rule, the file/directory flag, duplicate-path first-wins, and the sorted
newline-joined copyright / license rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query
from purldb_spark.sources.clearindex import harvest_packages, harvest_resources

_BASE_SQL = """
  SELECT 'harvest/' || lower(replace(p_brand, '#', '-'))
           || '-' || CAST(p_partkey AS VARCHAR) || '.json' AS cditem_path,
         lower(replace(p_brand, '#', '-')) || '-'
           || CAST(p_partkey AS VARCHAR) AS name,
         CAST(p_partkey % 7 AS VARCHAR) || '.'
           || CAST(p_partkey % 4 AS VARCHAR) AS version,
         p_partkey % 5 = 0 AS no_url,
         CAST(p_size AS BIGINT) AS size,
         md5(p_name) AS sha1,
         p_partkey AS k
  FROM part
"""


def _cditems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One CDitem row per part: a harvest doc with one package scan (every
    5th missing its download_url) and three file scans — a file with
    duplicated copyright/license entries, a directory, and a duplicate of
    the first path that must lose first-wins."""
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    name = F.concat(
        F.lower(F.replace(F.col("p_brand"), F.lit("#"), F.lit("-"))),
        F.lit("-"),
        k.cast("string"),
    )
    version = F.concat((k % 7).cast("string"), F.lit("."), (k % 4).cast("string"))
    purl = F.concat(F.lit("pkg:generic/"), name, F.lit("@"), version)
    url = F.concat(F.lit("https://dl.example/"), name, F.lit("-"), version, F.lit(".tar.gz"))
    sz = F.col("p_size").cast("long").cast("string")
    sha1 = F.md5("p_name")
    pkg_json = F.concat(
        F.lit('{"purl":"'), purl,
        F.lit('","type":"generic","name":"'), name,
        F.lit('","version":"'), version, F.lit('"'),
        F.when(k % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit(',"download_url":"'), url, F.lit('"'))
        ),
        F.lit(',"size":'), sz,
        F.lit(',"sha1":"'), sha1, F.lit('"}'),
    )
    f1 = F.concat(
        F.lit('{"path":"src/'), name, F.lit('/main.c","type":"file","size":'), sz,
        F.lit(',"sha1":"'), sha1, F.lit('",'),
        F.lit('"copyrights":[{"value":"(c) B"},{"value":"(c) A"},{"value":"(c) A"}],'),
        F.lit('"license_expressions":["mit","apache-2.0","mit"]}'),
    )
    f2 = F.concat(F.lit('{"path":"src/'), name, F.lit('","type":"directory"}'))
    f3 = F.concat(
        F.lit('{"path":"src/'), name, F.lit('/main.c","type":"file","size":'),
        (F.col("p_size").cast("long") + 1).cast("string"), F.lit("}"),
    )
    doc = F.concat(
        F.lit('{"content":{"files":['), f1, F.lit(","), f2, F.lit(","), f3,
        F.lit('],"summary":{"packages":['), pkg_json, F.lit("]}}}"),
    )
    return load(spark, sf_dir, "part").select(
        F.concat(F.lit("harvest/"), name, F.lit(".json")).alias("path"),
        doc.alias("data"),
    )


@query(
    "x_cd_harvest_packages",
    oracle=f"""
    WITH base AS ({_BASE_SQL})
    SELECT cditem_path, 'generic' AS type, name, version,
           CASE WHEN no_url THEN NULL
                ELSE 'https://dl.example/' || name || '-' || version || '.tar.gz'
           END AS download_url,
           size, sha1,
           CASE WHEN no_url
                THEN 'CDitemError: empty download_url for package: '
                     || 'pkg:generic/' || name || '@' || version
           END AS map_error
    FROM base
    """,
)
def x_cd_harvest_packages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harvest docs -> package scan rows with the dead-letter map_error for
    download_url-less scans (harvest.py:183-194)."""
    return harvest_packages(_cditems(spark, sf_dir)).select(
        "cditem_path", "type", "name", "version", "download_url", "size", "sha1", "map_error"
    )


@query(
    "x_cd_harvest_resources",
    oracle=f"""
    WITH base AS ({_BASE_SQL})
    SELECT cditem_path, 'src/' || name || '/main.c' AS path, size, sha1,
           TRUE AS is_file,
           '(c) A' || chr(10) || '(c) B' AS copyright,
           'apache-2.0' || chr(10) || 'mit' AS license_expression
    FROM base
    UNION ALL
    SELECT cditem_path, 'src/' || name, NULL, NULL, FALSE, NULL, NULL
    FROM base
    """,
)
def x_cd_harvest_resources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harvest docs -> one Resource row per scanned file: duplicate paths
    keep the first occurrence, copyright/license statements dedup into
    sorted newline-joined rollups (harvest.py:26-52,134-156)."""
    return harvest_resources(_cditems(spark, sf_dir)).select(
        "cditem_path", "path", "size", "sha1", "is_file", "copyright", "license_expression"
    )
