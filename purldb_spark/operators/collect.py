"""Collect-on-miss flow — the `/api/collect` equivalent
(packagedb/api.py:807-855): purls in, package rows out.

Reference behavior: look the purl up in the catalog; on miss, route it to
the ecosystem handler (priority_router.process), ingest the mapped
metadata, and re-query; finally pair each served package with its source
repository in a PackageSet (purl2vcs/find_source_repo.py:137-188
get_source_package_and_add_to_package_set).

Spark-first shape: the whole flow is set-oriented over a BATCH of request
purls — parse is a regexp projection, the miss test is an anti-join, the
route is the vectorized rlike cascade (operators/router.py), ingest is the
keyed merge_upsert (operators/merge.py), and the re-lookup is the
hits/collected union.  Nothing is per-purl; a billion-purl collect is the
same five distributed operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from purldb_spark.operators.merge import MergeSpec, merge_upsert
from purldb_spark.operators.router import Router

#: identity columns of a purl lookup (purl_to_lookups,
#: packagedb/api.py:276-300) — the catalog key.
PURL_IDENTITY = ("type", "namespace", "name", "version")


def parse_purl_cols(purl: Column) -> list[Column]:
    """purl string -> (type, namespace, name, version) columns; '' -> null.
    The same regexes run verbatim in the DuckDB oracle."""
    return [
        F.nullif(F.regexp_extract(purl, r"^pkg:([^/@]+)/", 1), F.lit("")).alias(
            "type"
        ),
        F.nullif(
            F.regexp_extract(purl, r"^pkg:[^/@]+/(?:([^/@]+)/)?[^/@]+@", 1),
            F.lit(""),
        ).alias("namespace"),
        F.nullif(
            F.regexp_extract(purl, r"^pkg:[^/@]+/(?:[^/@]+/)?([^/@]+)@", 1),
            F.lit(""),
        ).alias("name"),
        F.nullif(F.regexp_extract(purl, r"@([^?#]+)", 1), F.lit("")).alias(
            "version"
        ),
    ]


def _identity_cond(a: DataFrame, b: DataFrame) -> Column:
    from functools import reduce

    return reduce(
        lambda x, y: x & y,
        [a[c].eqNullSafe(b[c]) for c in PURL_IDENTITY],
    )


def collect_on_miss(
    requests: DataFrame,
    catalog: DataFrame,
    router: Router,
    fetch_map: Callable[[DataFrame], DataFrame],
    spec: MergeSpec,
    purl_col: str = "purl",
) -> tuple[DataFrame, DataFrame]:
    """Run the batch collect flow.  Returns ``(packages, catalog_after)``:

    - ``packages``: one row per (request purl x catalog match) with the
      catalog fields and a ``status`` of ``existing`` (hit before collect),
      ``collected`` (served by the miss path), or ``no_route`` (no handler
      — the reference's 400, packagedb/api.py:835-838; package fields null).
    - ``catalog_after``: the post-merge catalog snapshot.

    ``fetch_map`` maps the ROUTED miss frame (purl + identity + handler) to
    incoming catalog rows — the per-ecosystem mapper composition; in
    production it wraps the miner mappers (sources/miners*.py) over
    driver-fetched documents, keyed so merge_upsert can ingest.
    """
    reqs = requests.select(
        F.col(purl_col).alias("purl"), *parse_purl_cols(F.col(purl_col))
    )
    hits = reqs.join(catalog, _identity_cond(reqs, catalog), "left_semi")
    misses = reqs.join(catalog, _identity_cond(reqs, catalog), "left_anti")
    routed = router.route_frontier(misses, "purl")
    no_route = routed.filter(F.col("handler").isNull()).select("purl")
    incoming = fetch_map(routed.filter(F.col("handler").isNotNull()))
    catalog_after, _conflicts = merge_upsert(catalog, incoming, spec)

    served = reqs.join(
        catalog_after, _identity_cond(reqs, catalog_after), "inner"
    ).select(
        reqs["purl"],
        *[catalog_after[c] for c in catalog_after.columns],
    )
    hit_keys = hits.select("purl")
    packages = served.join(hit_keys, "purl", "left_semi").withColumn(
        "status", F.lit("existing")
    ).unionByName(
        served.join(hit_keys, "purl", "left_anti").withColumn(
            "status", F.lit("collected")
        )
    )
    null_fields = [
        F.lit(None).cast(packages.schema[c].dataType).alias(c)
        for c in packages.columns
        if c not in ("purl", "status")
    ]
    packages = packages.unionByName(
        no_route.select("purl", *null_fields, F.lit("no_route").alias("status"))
    )
    return packages, catalog_after


def add_source_package_set(
    packages: DataFrame,
    source_purl: Column,
    source_download_url: Column,
) -> DataFrame:
    """PackageSet pairing (find_source_repo.py:137-188): rows whose
    ``source_purl`` expression is non-null get ``package_set =
    md5(source purl)``, and the distinct source-repo packages are
    get_or_create'd as extra rows (``package_content='source_repo'``,
    status ``source_created``) sharing the same set id.  Distributed
    shape: one projection + one dedup aggregation, no per-package loop."""
    tagged = packages.withColumn("__src", source_purl).withColumn(
        "package_set", F.md5(F.col("__src"))
    )
    sources = (
        tagged.filter(F.col("__src").isNotNull())
        .select(
            F.col("__src").alias("purl"),
            *parse_purl_cols(F.col("__src")),
            source_download_url.alias("download_url"),
            F.col("package_set"),
        )
        .dropDuplicates(["purl"])
        .withColumn("package_content", F.lit("source_repo"))
        .withColumn("status", F.lit("source_created"))
    )
    out_cols = [c for c in tagged.columns if c != "__src"]
    binaries = tagged.select(*out_cols).withColumn(
        "package_content", F.lit(None).cast("string")
    )
    missing = [
        F.lit(None).cast(binaries.schema[c].dataType).alias(c)
        for c in binaries.columns
        if c not in sources.columns
    ]
    return binaries.unionByName(sources.select(*sources.columns, *missing))
