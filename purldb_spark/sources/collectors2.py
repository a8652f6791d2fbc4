"""Collector enrichment, batch 2: huggingface models and generic
download-url purls — the priority-router collect handlers beyond the
maven/debian enrichment in sources/collectors.py. Reference:
minecode/collectors/huggingface.py and generic.py. Fetching (model API
JSON, LICENSE text) stays on the frontier as pre-fetched document
tables; mapping is pure column expressions:

- huggingface (collectors/huggingface.py:79-153
  map_huggingface_package): purls must carry a namespace and a
  version/sha (error rows otherwise, huggingface.py:91-99); the model
  API doc supplies author/createdAt/siblings; ONE catalog row per
  ".bin" sibling (find_siblings_with_bin, huggingface.py:54-64 — the
  reference's generator only matches ".bin" despite its docstring
  naming .pt/.safetensors too; quirk kept), download_url =
  /resolve/<sha>/<file> (build_resolve_url, huggingface.py:67-76),
  homepage + api_data_url from the coordinates, the license text
  fetched from /resolve/<sha>/LICENSE when published.
- generic (collectors/generic.py:30-90 map_generic_package +
  process_request): the purl must carry a download_url qualifier
  (error rows otherwise); identity passes through with the qualifier
  as the download_url and package_content "binary".

Both emit a ``status`` column ("collected" or the reference's error
condition) so the collect flow can report per-purl outcomes exactly
like the existing x_collect_flow query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HF_MODEL_SCHEMA = T.StructType(
    [
        T.StructField("author", T.StringType()),
        T.StructField("createdAt", T.StringType()),
        T.StructField(
            "siblings",
            T.ArrayType(
                T.StructType([T.StructField("rfilename", T.StringType())])
            ),
        ),
    ]
)


def _resolve_url(ns: Column, name: Column, sha: Column, filename: Column) -> Column:
    """https://huggingface.co/{ns}/{name}/resolve/{sha}/{file}
    (build_resolve_url, huggingface.py:67-76)."""
    return F.concat(
        F.lit("https://huggingface.co/"), ns, F.lit("/"), name,
        F.lit("/resolve/"), sha, F.lit("/"), filename,
    )


def map_huggingface_requests(
    requests: DataFrame,
    models: DataFrame,
    licenses: DataFrame | None = None,
) -> DataFrame:
    """HuggingFace collect: requests (purl/namespace/name/version) x
    model-API docs (namespace/name/doc) x optional license texts
    (namespace/name/license_text) -> one row per .bin sibling, or an
    error-status row (huggingface.py:79-153)."""
    reqs = requests.select(
        "purl",
        F.col("namespace").alias("_ns"),
        F.col("name").alias("_name"),
        F.col("version").alias("_ver"),
    )
    bad_ns = reqs.filter(F.col("_ns").isNull()).select(
        "purl", F.lit("missing_namespace").alias("status")
    )
    bad_ver = reqs.filter(
        F.col("_ns").isNotNull() & F.col("_ver").isNull()
    ).select("purl", F.lit("missing_version").alias("status"))
    ok = reqs.filter(F.col("_ns").isNotNull() & F.col("_ver").isNotNull())

    m = models.select(
        F.col("namespace").alias("_mns"),
        F.col("name").alias("_mname"),
        F.from_json(F.col("doc"), HF_MODEL_SCHEMA).alias("_m"),
    )
    joined = ok.join(
        m,
        (F.col("_ns") == F.col("_mns")) & (F.col("_name") == F.col("_mname")),
        "left",
    )
    no_model = joined.filter(F.col("_m").isNull()).select(
        "purl", F.lit("no_model_data").alias("status")
    )
    with_model = joined.filter(F.col("_m").isNotNull())
    bins = with_model.select(
        "purl",
        "_ns",
        "_name",
        "_ver",
        F.col("_m")["author"].alias("_author"),
        F.col("_m")["createdAt"].alias("_created"),
        F.explode(
            F.filter(
                F.coalesce(
                    F.col("_m")["siblings"],
                    F.array().cast("array<struct<rfilename:string>>"),
                ),
                # only ".bin" matches — the reference generator's sole
                # pattern (huggingface.py:54-64)
                lambda s: s["rfilename"].endswith(".bin"),
            )
        ).alias("_s"),
    )
    if licenses is not None:
        lic = licenses.select(
            F.col("namespace").alias("_lns"),
            F.col("name").alias("_lname"),
            F.col("license_text").alias("_lic"),
        )
        bins = bins.join(
            F.broadcast(lic),
            (F.col("_ns") == F.col("_lns")) & (F.col("_name") == F.col("_lname")),
            "left",
        )
    else:
        bins = bins.withColumn("_lic", F.lit(None).cast("string"))
    rows = bins.select(
        F.col("purl"),
        F.lit("collected").alias("status"),
        F.lit("huggingface").alias("type"),
        F.col("_ns").alias("namespace"),
        F.col("_name").alias("name"),
        F.col("_ver").alias("version"),
        _resolve_url(
            F.col("_ns"), F.col("_name"), F.col("_ver"), F.col("_s")["rfilename"]
        ).alias("download_url"),
        F.concat(
            F.lit("https://huggingface.co/"), F.col("_ns"), F.lit("/"), F.col("_name")
        ).alias("homepage_url"),
        F.concat(
            F.lit("https://huggingface.co/api/models/"),
            F.col("_ns"),
            F.lit("/"),
            F.col("_name"),
        ).alias("api_data_url"),
        F.col("_author").alias("parties"),
        F.col("_created").alias("release_date"),
        F.col("_lic").alias("extracted_license_statement"),
        F.lit("source_archive").alias("package_content"),
    )
    errors = bad_ns.unionByName(bad_ver).unionByName(no_model)
    null_cols = [
        F.lit(None).cast(rows.schema[c].dataType).alias(c)
        for c in rows.columns
        if c not in ("purl", "status")
    ]
    return rows.unionByName(errors.select("purl", "status", *null_cols))


def map_generic_requests(requests: DataFrame, purl_col: str = "purl") -> DataFrame:
    """Generic collect: purls with a download_url qualifier pass through
    as binary packages; the rest are error rows
    (generic.py:30-90)."""
    purl = F.col(purl_col)
    dl = F.nullif(
        F.url_decode(F.regexp_extract(purl, r"[?&]download_url=([^&#]*)", 1)),
        F.lit(""),
    )
    name = F.nullif(
        F.regexp_extract(purl, r"^pkg:generic/(?:[^/@?]+/)?([^/@?]+)", 1), F.lit("")
    )
    ns = F.nullif(
        F.regexp_extract(purl, r"^pkg:generic/([^/@?]+)/[^/@?]+", 1), F.lit("")
    )
    ver = F.nullif(F.regexp_extract(purl, r"@([^?#]+)", 1), F.lit(""))
    return requests.select(
        purl.alias("purl"),
        F.when(dl.isNotNull(), F.lit("collected"))
        .otherwise(F.lit("missing_download_url"))
        .alias("status"),
        F.when(dl.isNotNull(), F.lit("generic")).alias("type"),
        F.when(dl.isNotNull(), ns).alias("namespace"),
        F.when(dl.isNotNull(), name).alias("name"),
        F.when(dl.isNotNull(), ver).alias("version"),
        dl.alias("download_url"),
        F.when(dl.isNotNull(), F.lit("binary")).alias("package_content"),
    )
