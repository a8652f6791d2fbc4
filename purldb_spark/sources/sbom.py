"""S8: CycloneDX SBOM projection (packagedb/models.py:802-887,
endpoint packagedb/api.py:503-507).

A pure format function: one package row -> one CycloneDX component JSON
string via to_json(struct(...)) — stays columnar until the final
serialization, so SBOM export of the full catalog is a single projection
job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cyclonedx_component(
    purl: str = "purl",
    name: str = "name",
    version: str = "version",
    sha1: str = "sha1",
    download_url: str = "download_url",
    declared_license: str = "declared_license_expression",
) -> Column:
    """CycloneDX 1.4 component object for a package row."""
    return F.to_json(
        F.struct(
            F.lit("library").alias("type"),
            F.col(name).alias("name"),
            F.col(version).alias("version"),
            F.col(purl).alias("purl"),
            F.array(
                F.struct(F.lit("SHA-1").alias("alg"), F.col(sha1).alias("content"))
            ).alias("hashes"),
            F.array(
                F.struct(
                    F.struct(F.col(declared_license).alias("expression")).alias(
                        "license"
                    )
                )
            ).alias("licenses"),
            F.array(
                F.struct(
                    F.lit("distribution").alias("type"),
                    F.col(download_url).alias("url"),
                )
            ).alias("externalReferences"),
        ),
    )


def to_cyclonedx(df: DataFrame, **colmap: str) -> DataFrame:
    return df.withColumn("cyclonedx", cyclonedx_component(**colmap))
