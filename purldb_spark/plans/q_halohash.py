"""BAH128 halohash computation queries: directory-tree fingerprints built
from a flat file listing (functions/halohash.py), the computation the
reference delegates to matchcode-toolkit and then indexes in
matchcode/models.py:144-245.

The synthetic tree derives deterministically from `part` on both engines:
each part is a file at ``pkg{K}/{brand}/{name}.bin`` with sha1 = md5(name),
so every directory fingerprint (bit-majority of descendant digests) is
independently recomputed by the DuckDB oracle from first principles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.functions.fingerprints import attach_chunks
from purldb_spark.functions.halohash import directory_fingerprints_sql
from purldb_spark.plans.fixture_cache import dir_fingerprint_index
from purldb_spark.plans.registry import query

_FILES_SQL = """
  SELECT 'pkg' || CAST(p_partkey % 20 AS VARCHAR) || '/'
           || lower(replace(p_brand, '#', '')) || '/'
           || lower(replace(p_name, ' ', '-')) || '.bin' AS path,
         md5(p_name) AS sha1,
         CAST(p_size AS BIGINT) AS size
  FROM part
"""


def _files(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        F.concat(
            F.lit("pkg"),
            (k % 20).cast("string"),
            F.lit("/"),
            F.lower(F.replace(F.col("p_brand"), F.lit("#"), F.lit(""))),
            F.lit("/"),
            F.lower(F.replace(F.col("p_name"), F.lit(" "), F.lit("-"))),
            F.lit(".bin"),
        ).alias("path"),
        F.md5("p_name").alias("sha1"),
        F.col("p_size").cast("long").alias("size"),
    )


def _with_chunks_sql(fp_sql: str) -> str:
    chunk_exprs = ", ".join(
        f"CAST('0x' || substr(bah128, {1 + 8 * i}, 8) AS BIGINT) AS c{i + 1}"
        for i in range(4)
    )
    return f"""
    SELECT directory, elements_count, bah128, fingerprint, {chunk_exprs}
    FROM ({fp_sql})
    """


@query(
    "x_bah128_dir_content",
    oracle=_with_chunks_sql(directory_fingerprints_sql(_FILES_SQL, [], "content")),
)
def x_bah128_dir_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory CONTENT fingerprints (elements = descendant file sha1s):
    ancestor explode + one 128-column bit-majority aggregation, then F1/F2
    split into the four LSH chunk keys — the full
    ApproximateDirectoryContentIndex row build, computed not ingested."""
    fp = dir_fingerprint_index(spark, sf_dir, "content")
    return attach_chunks(fp, "bah128")


@query(
    "x_bah128_dir_structure",
    oracle=_with_chunks_sql(directory_fingerprints_sql(_FILES_SQL, [], "structure")),
)
def x_bah128_dir_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory STRUCTURE fingerprints (elements = size + path below the
    directory), the ApproximateDirectoryStructureIndex counterpart."""
    fp = dir_fingerprint_index(spark, sf_dir, "structure")
    return attach_chunks(fp, "bah128")
