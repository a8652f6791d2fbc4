"""ClearlyDefined harvest -> catalog mapping — the map stage of the
reference's clearindex (clearindex/harvest.py:1-203).

The reference walks CDitem rows (path + gzipped-JSON ``data``), takes the
ScanCode-Toolkit harvest payload ``content.summary.packages`` /
``content.files``, and per item creates-or-merges a Package plus one
Resource per scanned file (``map_scancode_harvest`` ->
``create_from_harvest``). S6 blob sync already lands the blobs; THIS module
maps a whole table of harvest documents in one pass:

- ``harvest_packages``: one row per package scan with the
  ``create_from_harvest`` field subset (harvest.py:57-86); scans with an
  empty ``download_url`` become dead-letter rows (``map_error``, mirroring
  harvest.py:183-194 where the reference records the error on the CDitem
  and skips the package),
- ``harvest_resources``: one row per scanned file with the newline-joined
  deduped copyright statements / license expressions
  (get_resource_copyright_statements / get_resource_license_expressions,
  harvest.py:26-52). The reference builds each list via ``set`` — its
  join order is interpreter-dependent; we sort before joining, a
  deterministic refinement of the same dedup. Path collisions within one
  item keep the first occurrence (harvest.py:152-156 skips existing paths),
- ``merge_harvest``: new packages vs an existing catalog through the M1
  merge (merge_packages with replace=False, harvest.py:113-124 — i.e.
  FILL_IF_NULL semantics: existing non-empty values win), with the
  ``history`` append left to m5_history_append.

Everything is from_json + explode + aggregation — JVM-side, no Python in
the row path; a 100 TB harvest dump maps as one shuffle-free projection
per output (the resource dedup aggregates within (item, path) only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from purldb_spark.operators.merge import MergeSpec, Policy, merge_upsert

# create_from_harvest's field tuple (harvest.py:57-84), minus the ones the
# synthetic fixtures never carry; keep the order for the output projection.
PACKAGE_FIELDS = (
    "type",
    "namespace",
    "name",
    "version",
    "qualifiers",
    "primary_language",
    "description",
    "homepage_url",
    "download_url",
    "size",
    "sha1",
    "md5",
    "sha256",
    "copyright",
    "license_expression",
)

_PKG_STRUCT = T.StructType(
    [
        T.StructField("purl", T.StringType()),
        *[
            T.StructField(f, T.LongType() if f == "size" else T.StringType())
            for f in PACKAGE_FIELDS
        ],
    ]
)

_FILE_STRUCT = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("md5", T.StringType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("git_sha1", T.StringType()),
        T.StructField("copyrights", T.ArrayType(
            T.StructType([T.StructField("value", T.StringType())])
        )),
        T.StructField("license_expressions", T.ArrayType(T.StringType())),
    ]
)

HARVEST_SCHEMA = T.StructType(
    [
        T.StructField(
            "content",
            T.StructType(
                [
                    T.StructField("files", T.ArrayType(_FILE_STRUCT)),
                    T.StructField(
                        "summary",
                        T.StructType(
                            [T.StructField("packages", T.ArrayType(_PKG_STRUCT))]
                        ),
                    ),
                ]
            ),
        )
    ]
)


def harvest_packages(cditems: DataFrame, path: str = "path", data: str = "data") -> DataFrame:
    """CDitem harvest docs -> one row per package scan.

    ``map_error`` is null for mappable scans and carries the reference's
    dead-letter message for download_url-less ones (harvest.py:183-194);
    callers filter on it before merging.
    """
    j = F.from_json(F.col(data), HARVEST_SCHEMA)
    pkgs = F.coalesce(j["content"]["summary"]["packages"], F.array())
    out = cditems.select(F.col(path).alias("cditem_path"), F.explode(pkgs).alias("p"))
    no_url = F.col("p.download_url").isNull() | (F.col("p.download_url") == "")
    return out.select(
        "cditem_path",
        *[F.col(f"p.{f}").alias(f) for f in PACKAGE_FIELDS],
        F.when(
            no_url,
            F.concat(F.lit("CDitemError: empty download_url for package: "), F.col("p.purl")),
        ).alias("map_error"),
    )


def harvest_resources(cditems: DataFrame, path: str = "path", data: str = "data") -> DataFrame:
    """CDitem harvest docs -> one Resource row per scanned file
    (harvest.py:134-156): path, checksums, is_file, and the newline-joined
    deduped (sorted) copyright / license_expression rollups."""
    j = F.from_json(F.col(data), HARVEST_SCHEMA)
    files = F.coalesce(j["content"]["files"], F.array())
    out = cditems.select(
        F.col(path).alias("cditem_path"), F.posexplode(files).alias("pos", "f")
    )
    # first occurrence (document order) wins on a duplicate path within one
    # item — harvest.py:152-156 skips paths already created
    first = out.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cditem_path", F.col("f.path")).orderBy("pos")
        ),
    ).where(F.col("rn") == 1)
    joined = lambda arr: F.when(  # noqa: E731
        F.size(arr) > 0, F.array_join(F.array_sort(F.array_distinct(arr)), "\n")
    )
    return first.select(
        "cditem_path",
        F.col("f.path").alias("path"),
        F.col("f.size").alias("size"),
        F.col("f.sha1").alias("sha1"),
        F.col("f.md5").alias("md5"),
        F.col("f.sha256").alias("sha256"),
        F.col("f.git_sha1").alias("git_sha1"),
        (F.coalesce(F.col("f.type"), F.lit("")) == "file").alias("is_file"),
        joined(
            F.transform(F.coalesce(F.col("f.copyrights"), F.array()), lambda c: c["value"])
        ).alias("copyright"),
        joined(F.coalesce(F.col("f.license_expressions"), F.array())).alias(
            "license_expression"
        ),
    )


# merge_packages(..., replace=False) updates only empty fields
# (harvest.py:113-124 -> minecode/model_utils.py merge_packages). Keyed on
# the purl identity — the reference looks packages up by purl
# type/namespace/name/version first (harvest.py get_or_create_package) with
# download_url as one more merged component, so two versions sharing a
# download URL stay distinct rows. Namespace is null-safe-matched (most
# generic packages carry none).
_PURL_KEY = ("type", "namespace", "name", "version")
HARVEST_MERGE_SPEC = MergeSpec(
    key=_PURL_KEY,
    fields={f: Policy.FILL_IF_NULL for f in PACKAGE_FIELDS if f not in _PURL_KEY}
    | {"sha1": Policy.CHECKSUM, "md5": Policy.CHECKSUM, "sha256": Policy.CHECKSUM},
)


def merge_harvest(existing: DataFrame, cditems: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Map harvest docs and merge the mappable package rows into the
    catalog keyed on the purl identity type/namespace/name/version
    (harvest.py:96-129: lookup by purl fields, download_url merged as a
    field; checksums conflict rather than overwrite).
    Catalogs that don't carry every harvest field get the missing ones as
    nulls (absent attribute == empty, same as the reference's model).
    Returns (merged_snapshot, conflicts)."""
    for f in PACKAGE_FIELDS:
        if f not in existing.columns:
            typ = "bigint" if f == "size" else "string"
            existing = existing.withColumn(f, F.lit(None).cast(typ))
    mapped = harvest_packages(cditems).where(F.col("map_error").isNull())
    return merge_upsert(existing, mapped, HARVEST_MERGE_SPEC)
