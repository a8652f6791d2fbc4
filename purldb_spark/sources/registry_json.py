"""S3/X2: package-registry JSON metadata -> catalog package rows.

The reference's 44 miners fetch per-ecosystem registry documents and map
them into PackageData (e.g. npm: minecode/collectors/npm.py:30-105, mapper
minecode/miners/npm.py). Network fetch stays driver-side / mapPartitions
(politeness-limited, T7); THIS module is the parse+map stage, which is where
the Spark value is: given a frame of raw JSON documents (one per package),
explode every released version into a catalog row with an explicit schema.

The shape handled here is the npm-registry-ish document:

    {"name": ..., "description": ...,
     "dist-tags": {"latest": ...},
     "versions": {"1.0.0": {"version": ..., "dist": {"tarball", "shasum"},
                            "license": ..., "homepage": ...}, ...}}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VERSION_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType()),
        T.StructField("license", T.StringType()),
        T.StructField("homepage", T.StringType()),
        T.StructField(
            "dist",
            T.StructType(
                [
                    T.StructField("tarball", T.StringType()),
                    T.StructField("shasum", T.StringType()),
                ]
            ),
        ),
    ]
)

REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("dist-tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("versions", T.MapType(T.StringType(), VERSION_SCHEMA)),
    ]
)


def read_registry_docs(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(REGISTRY_SCHEMA).option("multiLine", "true").json(path)


def packages_from_registry(docs: DataFrame, ecosystem: str = "npm") -> DataFrame:
    """Explode versions map -> one catalog package row per release, with the
    purl assembled from coordinate columns (C3 kept columnar — the purl
    string is derived output, the coordinates stay the join keys)."""
    exploded = docs.select(
        "name",
        "description",
        F.col("`dist-tags`").getItem("latest").alias("latest_version"),
        F.explode("versions").alias("version", "v"),
    )
    purl = F.concat(
        F.lit(f"pkg:{ecosystem}/"), F.col("name"), F.lit("@"), F.col("version")
    )
    # old registry documents carry http:// tarball URLs; the reference's
    # mapped output uses https for the registry host (visible in its own
    # 0flux fixture: doc says http://registry.npmjs.org/..., expected-*
    # says https://) — normalize the scheme for the registry host only
    tarball = F.regexp_replace(
        F.col("v.dist.tarball"),
        r"^http://registry\.npmjs\.org/",
        "https://registry.npmjs.org/",
    )
    return exploded.select(
        purl.alias("purl"),
        F.lit(ecosystem).alias("type"),
        "name",
        "version",
        "description",
        tarball.alias("download_url"),
        F.col("v.dist.shasum").alias("sha1"),
        F.col("v.license").alias("declared_license_expression"),
        F.col("v.homepage").alias("homepage_url"),
        (F.col("version") == F.col("latest_version")).alias("is_latest"),
    )
