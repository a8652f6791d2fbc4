"""S7: ScanCode-format scan JSON ingest (minecode/indexing.py:26-113,
model_utils.py:452-497).

Input shape (FIXTURES.md §7): one JSON document per scanned package with
top-level ``{"files": [...]}``; each file row carries path/type/hashes/
scan fields plus ``extra_data`` holding directory/halohash fingerprints and
snippet lists.

Spark shape: read with an EXPLICIT schema (never inferSchema on a 100 TB
ingest — schema inference is a full extra pass and races schema drift),
explode `files`, and project three outputs from one scan pass:

  resources            — one row per file/dir
  exact_file_index     — sha1 -> package (matchcode/models.py:67-123)
  approx_dir_index     — halohash count+chunks (matchcode/models.py:144-398)
  snippet_index        — exploded snippet fingerprints w/ positions

All four writes reuse the same exploded frame (cache it for multi-sink
fan-out; on a lake this is one job with four sinks partitioned by
package_uid prefix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from purldb_spark.functions.fingerprints import split_fingerprint
from purldb_spark.functions.halohash import directory_fingerprints

SNIPPET_FIELD = T.ArrayType(
    T.StructType(
        [
            T.StructField("snippet", T.StringType()),
            T.StructField("position", T.IntegerType()),
        ]
    )
)

FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("extension", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("md5", T.StringType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("file_type", T.StringType()),
        T.StructField("programming_language", T.StringType()),
        T.StructField("is_binary", T.BooleanType()),
        T.StructField("is_text", T.BooleanType()),
        T.StructField("is_archive", T.BooleanType()),
        T.StructField("is_media", T.BooleanType()),
        T.StructField("is_key_file", T.BooleanType()),
        T.StructField(
            "extra_data",
            T.StructType(
                [
                    T.StructField("directory_content", T.StringType()),
                    T.StructField("directory_structure", T.StringType()),
                    T.StructField("halo1", T.StringType()),
                    T.StructField("snippets", SNIPPET_FIELD),
                    T.StructField("stemmed_snippets", SNIPPET_FIELD),
                ]
            ),
        ),
    ]
)

SCAN_SCHEMA = T.StructType(
    [
        T.StructField("package_uid", T.StringType()),
        T.StructField("files", T.ArrayType(FILE_SCHEMA)),
    ]
)


def read_scan(spark: SparkSession, path: str) -> DataFrame:
    """Load scan JSON(s) -> exploded per-file frame with package_uid."""
    raw = spark.read.schema(SCAN_SCHEMA).option("multiLine", "true").json(path)
    return raw.select(
        "package_uid", F.explode("files").alias("f")
    ).select("package_uid", "f.*")


def resources_from_scan(files: DataFrame) -> DataFrame:
    """packagedb-resources projection (ScanFieldsModelMixin subset)."""
    return files.select(
        "package_uid",
        "path",
        "name",
        "extension",
        (F.col("type") == "file").alias("is_file"),
        "size",
        "sha1",
        "md5",
        "sha256",
        "mime_type",
        "file_type",
        "programming_language",
        "is_binary",
        "is_text",
        "is_archive",
        "is_media",
        "is_key_file",
    )


def exact_file_index_from_scan(files: DataFrame) -> DataFrame:
    """sha1 -> package rows for files with a sha1 (indexing.py:69-75)."""
    return (
        files.filter((F.col("type") == "file") & F.col("sha1").isNotNull())
        .select("sha1", "package_uid", "path")
        .dropDuplicates(["sha1", "package_uid", "path"])
    )


def approx_dir_index_from_scan(files: DataFrame, kind: str = "content") -> DataFrame:
    """Directory fingerprint index rows: hex fingerprint split into
    element_count + 4 int chunks (F1/F2; matchcode/models.py:204-245)."""
    col = f"directory_{kind}"
    dirs = files.filter(
        (F.col("type") == "directory") & F.col(f"extra_data.{col}").isNotNull()
    ).select(
        "package_uid", "path", F.col(f"extra_data.{col}").alias("fingerprint")
    )
    return split_fingerprint(dirs, "fingerprint").drop("fingerprint")


def snippet_index_from_scan(files: DataFrame, stemmed: bool = False) -> DataFrame:
    """Snippet inverted-index rows (matchcode/models.py:425-657): explode
    (fingerprint, position) per file."""
    col = "stemmed_snippets" if stemmed else "snippets"
    return files.filter(F.col(f"extra_data.{col}").isNotNull()).select(
        "package_uid",
        "path",
        F.explode(F.col(f"extra_data.{col}")).alias("s"),
    ).select(
        "package_uid",
        "path",
        F.col("s.snippet").alias("fingerprint"),
        F.col("s.position").alias("position"),
    )


def compute_dir_index_from_scan(files: DataFrame, kind: str = "content") -> DataFrame:
    """Directory fingerprints COMPUTED from the scanned file rows (not read
    from extra_data): bah128 bit-majority over descendant sha1s (content) or
    size+subpath features (structure) — what the reference delegates to
    matchcode-toolkit before matchcode/models.py:193-225 indexes it."""
    plain = files.filter(F.col("type") == "file").select(
        "package_uid", "path", "sha1", "size"
    )
    return directory_fingerprints(
        plain, extra_group_cols=["package_uid"], kind=kind
    )


def ingest_scan(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """One scan pass -> all index tables (the S7 fan-out)."""
    files = read_scan(spark, path).cache()
    return {
        "resources": resources_from_scan(files),
        "exact_file_index": exact_file_index_from_scan(files),
        "approx_dir_content_index": approx_dir_index_from_scan(files, "content"),
        "approx_dir_structure_index": approx_dir_index_from_scan(files, "structure"),
        "computed_dir_content_index": compute_dir_index_from_scan(files, "content"),
        "computed_dir_structure_index": compute_dir_index_from_scan(files, "structure"),
        "snippet_index": snippet_index_from_scan(files, stemmed=False),
        "stemmed_snippet_index": snippet_index_from_scan(files, stemmed=True),
    }
