"""Purl validation — the /api/validate endpoint as a batch operator.

Reference: packagedb/api.py:1124-1235 (PurlValidateViewSet.list).
Per input purl:

- ``valid``: does it parse as a PackageURL (scheme + type + name);
- ``exists`` (only when check_existence is set): catalog lookup first,
  then — for the ten supported ecosystems — the upstream version list:
  exists when the list is non-empty and the purl either has no version
  or its version is a member; NULL (with its own message) for
  unsupported ecosystems;
- ``message``: the endpoint's five literal response strings.

Everything is column expressions + two left joins (catalog marker,
upstream version membership) — batch-validating a million purls is one
pass, vs the reference's per-request view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# api.py:1150-1162 — the endpoint's literal messages
MSG_VALID = "The provided PackageURL is valid."
MSG_NOT_VALID = "The provided PackageURL is not valid."
MSG_VALID_AND_EXISTS = (
    "The provided Package URL is valid, and the package exists in the upstream repo."
)
MSG_VALID_NOT_EXISTS = (
    "The provided PackageURL is valid, but does not exist in the upstream repo."
)
MSG_UNSUPPORTED = (
    "The provided PackageURL is valid, but `check_existence` is not supported"
    " for this package type."
)

# api.py docstring + VERSION_API_CLASSES_BY_PACKAGE_TYPE ∩ VERSION_CLASS
SUPPORTED_EXISTENCE_TYPES = (
    "cargo", "composer", "deb", "gem", "golang", "hex", "maven", "npm",
    "nuget", "pypi",
)

# scheme, at least type/name, optional version/qualifiers/subpath —
# the same subset functions/purl.py::PackageURL.parse accepts
_PURL_RX = r"^pkg:/*[^/@?#]+/([^@?#]*/)*[^/@?#]+(@[^?#]+)?(\?[^#]*)?(#.*)?$"


def purl_valid_col(purl) -> "F.Column":
    return purl.rlike(_PURL_RX)


def validate_purls(
    requests: DataFrame, catalog: DataFrame, upstream_versions: DataFrame
) -> DataFrame:
    """requests(purl, check_existence) + catalog(purl) +
    upstream_versions(vkey, version) -> (purl, valid, exists, message).

    ``vkey`` is the versionless purl (type[/namespace]/name) the
    version APIs are keyed by — the reference's versionless_purl
    rebuild (api.py:1205-1210).
    """
    p = F.col("purl")
    ptype = F.lower(F.regexp_extract(p, r"^pkg:/*([^/@?#]+)/", 1))
    vkey = F.concat(
        F.lit("pkg:"), ptype, F.lit("/"),
        F.regexp_extract(p, r"^pkg:/*[^/]+/([^@?#]+)", 1),
    )
    version = F.nullif(F.regexp_extract(p, r"@([^?#]+)", 1), F.lit(""))
    supported = F.lit(False)
    for t in SUPPORTED_EXISTENCE_TYPES:
        supported = supported | (ptype == t)
    base = requests.select(
        "purl",
        F.col("check_existence").alias("_chk"),
        purl_valid_col(p).alias("valid"),
        vkey.alias("_vkey"),
        version.alias("_ver"),
        supported.alias("_sup"),
    )
    cat = catalog.select(F.col("purl").alias("_cp"), F.lit(True).alias("_in_cat"))
    vs = upstream_versions.groupBy(F.col("vkey").alias("_vk")).agg(
        F.collect_set("version").alias("_versions")
    )
    j = (
        base.join(cat, base["purl"] == F.col("_cp"), "left")
        .join(vs, F.col("_vkey") == F.col("_vk"), "left")
    )
    upstream_ok = F.col("_versions").isNotNull() & (
        F.col("_ver").isNull() | F.array_contains("_versions", F.col("_ver"))
    )
    exists = F.when(
        ~F.col("valid") | ~F.col("_chk"), F.lit(None).cast("boolean")
    ).otherwise(
        F.when(F.coalesce(F.col("_in_cat"), F.lit(False)), F.lit(True)).otherwise(
            F.when(F.col("_sup"), F.coalesce(upstream_ok, F.lit(False))).otherwise(
                F.lit(None).cast("boolean")
            )
        )
    )
    message = (
        F.when(~F.col("valid"), F.lit(MSG_NOT_VALID))
        .when(~F.col("_chk"), F.lit(MSG_VALID))
        .when(exists, F.lit(MSG_VALID_AND_EXISTS))
        .when(exists.isNull(), F.lit(MSG_UNSUPPORTED))
        .otherwise(F.lit(MSG_VALID_NOT_EXISTS))
    )
    # exists is emitted as a STRING ('true'/'false'/NULL): a nullable
    # boolean column round-trips as None in Spark's toPandas but NaN in
    # DuckDB's fetchdf, which breaks the driver's repr-based comparator
    return j.select(
        "purl",
        "valid",
        exists.cast("string").alias("exists"),
        message.alias("message"),
    )
