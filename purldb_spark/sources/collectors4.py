"""Collector enrichment, batch 4: the registry-API collect family —
pypi, cargo, gem (rubygems), nuget, npm. Reference:
minecode/collectors/{pypi,cargo,rubygems,nuget,npm}.py.

These collectors share one shape: build the registry API URL from the
purl fields, fetch the JSON document, map it to catalog rows with the
SAME per-ecosystem mapper the miners use (sources/miners.py /
miners2.py / registry_json.py), then classify package content and
merge. What is collect-specific — and implemented here — is:

- version resolution: pypi (pypi.py:45-57 get_all_package_version +
  process_request:118-131) and rubygems (rubygems.py:37-52) FAN OUT a
  versionless purl to every known version; npm (npm.py:100-103)
  silently skips versionless purls; cargo (cargo.py:14-30
  build_packages) maps every version in the crate document unless the
  purl pins one; nuget (nuget.py:29-44) iterates every catalogEntry
  and keeps the matching version when pinned.
- existence status: a missing registry document is the reference's
  "Package does not exist on <registry>" error string
  (pypi.py:76-79 etc.) — a ``does_not_exist`` status row here; a
  fan-out request whose version list cannot be fetched is
  ``no_versions``.
- package content: pypi classifies each download by extension
  (pypi.py:85-95): source archives (.tar.gz .zip .tar.bz2 .tar.xz
  .tar.Z .tgz .tbz) -> source_archive, wheels/eggs -> binary; every
  other collector in this family hardcodes source_archive.
- the npm API URL (packagedcode npm_api_url semantics, used by
  npm.py:30-44): scoped packages percent-encode the namespace/name
  separator and cannot pin a version in the URL; unscoped packages
  append /{version}.

All joins are name- or (name, version)-keyed equi-joins over the
pre-fetched document tables (the fetch itself is frontier I/O, same as
every other collector batch): at 100 TB the request and document sides
shuffle once on the same key and every mapping stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from purldb_spark.sources.miners import map_pypi_docs, parse_pypi_docs
from purldb_spark.sources.miners2 import map_cargo_docs, map_gem_docs

SOURCE_EXTENSIONS = (".tar.gz", ".zip", ".tar.bz2", ".tar.xz", ".tar.Z", ".tgz", ".tbz")
BINARY_EXTENSIONS = (".whl", ".egg")


def classify_download_content(url: Column) -> Column:
    """pypi's extension classification (collectors/pypi.py:85-95):
    source_archive / binary / NULL for anything else."""
    is_src = F.lit(False)
    for ext in SOURCE_EXTENSIONS:
        is_src = is_src | url.endswith(ext)
    is_bin = F.lit(False)
    for ext in BINARY_EXTENSIONS:
        is_bin = is_bin | url.endswith(ext)
    return (
        F.when(is_src, F.lit("source_archive"))
        .when(is_bin, F.lit("binary"))
    )


def fan_out_versions(requests: DataFrame, versions: DataFrame) -> DataFrame:
    """Resolve versionless requests to one row per known version.

    ``requests``: (purl, name, version?). ``versions``: (name, version)
    — the parsed get_all_package_version response. Versioned requests
    pass through; versionless ones join the version list (the
    reference's per-version loop, pypi.py:118-126); a versionless name
    with no version rows becomes a ``no_versions`` status row. Output:
    (purl, name, version, status) with status NULL on the happy path.
    """
    pinned = requests.filter("version IS NOT NULL").selectExpr(
        "purl", "name", "version", "CAST(NULL AS STRING) AS status"
    )
    vlist = versions.selectExpr("name AS _vn", "version AS _vv")
    loose = (
        requests.filter("version IS NULL")
        .select("purl", "name")
        .join(vlist, F.expr("name = _vn"), "left")
    )
    missing = loose.filter("_vv IS NULL").selectExpr(
        "purl",
        "name",
        "CAST(NULL AS STRING) AS version",
        "'no_versions' AS status",
    )
    fanned = loose.filter("_vv IS NOT NULL").selectExpr(
        "purl",
        "name",
        "_vv AS version",
        "CAST(NULL AS STRING) AS status",
    )
    return pinned.unionByName(fanned).unionByName(missing)


def _status_rows(df: DataFrame, status: str, like: DataFrame) -> DataFrame:
    """(purl) rows -> the full output schema of `like` with NULL fields."""
    null_cols = [
        f"CAST(NULL AS {like.schema[c].dataType.simpleString()}) AS {c}"
        for c in like.columns
        if c not in ("purl", "status")
    ]
    return df.selectExpr("purl", f"'{status}' AS status", *null_cols)


def map_pypi_collect(
    requests: DataFrame, docs: DataFrame, versions: DataFrame
) -> DataFrame:
    """PyPI collect (collectors/pypi.py:29-131): fan out versionless
    purls, join the per-(name, version) release JSON, map one row per
    download via the miner mapper, classify content by extension."""
    resolved = fan_out_versions(requests, versions)
    no_versions = resolved.filter("status = 'no_versions'")
    ok = resolved.filter("status IS NULL")
    d = docs.selectExpr("name AS _dn", "version AS _dv", "doc")
    joined = ok.join(d, F.expr("name = _dn AND version = _dv"), "left")
    missing = joined.filter("doc IS NULL").select("purl")
    mapped = map_pypi_docs(parse_pypi_docs(joined.filter("doc IS NOT NULL")))
    rows = mapped.select(
        "purl",
        F.lit("collected").alias("status"),
        F.lit("pypi").alias("type"),
        "name",
        "version",
        "download_url",
        "declared_license",
        "sha256",
        classify_download_content(F.col("download_url")).alias("package_content"),
        "datasource_id",
    )
    return rows.unionByName(_status_rows(missing, "does_not_exist", rows)).unionByName(
        _status_rows(no_versions.select("purl"), "no_versions", rows)
    )


def map_cargo_collect(requests: DataFrame, docs: DataFrame) -> DataFrame:
    """Cargo collect (collectors/cargo.py:24-59 + miners/cargo.py:14-30):
    the crate document is keyed by name and carries every version; a
    pinned purl keeps only its version, an unpinned one keeps all."""
    reqs = requests.selectExpr("purl", "name", "version AS _want")
    d = docs.selectExpr("name AS _dn", "doc")
    joined = reqs.join(d, F.expr("name = _dn"), "left")
    missing = joined.filter("doc IS NULL").select("purl")
    found = joined.filter("doc IS NOT NULL")
    # map_cargo_docs projects the doc columns only; map each distinct
    # crate document once, then re-attach the request keyed by name (the
    # crate doc is name-unique) to apply the version pin
    mapped = map_cargo_docs(found.select("doc").distinct())
    reattach = mapped.join(
        found.selectExpr("purl AS req_purl", "name AS _rn", "_want"),
        mapped["name"] == F.col("_rn"),
    ).filter("_want IS NULL OR version = _want")
    # one package per mapped version, keyed by its own purl (the
    # reference's merge_or_create_package is per built package)
    rows = reattach.selectExpr(
        "purl",
        "'collected' AS status",
        "type",
        "name",
        "version",
        "download_url",
        "declared_license",
        "sha256",
        "'source_archive' AS package_content",
        "datasource_id",
    )
    return rows.unionByName(_status_rows(missing, "does_not_exist", rows))


def map_gem_collect(
    requests: DataFrame, docs: DataFrame, versions: DataFrame
) -> DataFrame:
    """RubyGems collect (collectors/rubygems.py:24-88): fan out via the
    v1 versions list, join the v2 (name, version) document, map via the
    miner mapper; source_archive always."""
    resolved = fan_out_versions(requests, versions)
    no_versions = resolved.filter("status = 'no_versions'")
    ok = resolved.filter("status IS NULL")
    d = docs.selectExpr("name AS _dn", "version AS _dv", "doc")
    joined = ok.join(d, F.expr("name = _dn AND version = _dv"), "left")
    missing = joined.filter("doc IS NULL").select("purl")
    mapped = map_gem_docs(joined.filter("doc IS NOT NULL"))
    rows = mapped.selectExpr(
        "purl",
        "'collected' AS status",
        "'gem' AS type",
        "name",
        "version",
        "download_url",
        "declared_license",
        "sha256",
        "'source_archive' AS package_content",
        "datasource_id",
    )
    return rows.unionByName(_status_rows(missing, "does_not_exist", rows)).unionByName(
        _status_rows(no_versions.select("purl"), "no_versions", rows)
    )


NUGET_INDEX_SCHEMA = T.ArrayType(T.StringType())


def map_nuget_collect(requests: DataFrame, index_docs: DataFrame) -> DataFrame:
    """NuGet collect (collectors/nuget.py:17-62): the registration
    index is fetched by LOWERCASED name (nuget.py:40); its
    items[0].items[*].catalogEntry entries each map to a catalog row
    via the miner mapper; a pinned purl keeps only the matching
    version (nuget.py:46-51).

    ``index_docs``: (name_lc, entries) where entries is the array of
    catalogEntry JSON strings (the items[0].items unwrap of the
    registration page — kept pre-split so the mapper's schema matches
    the miner's catalog-entry schema).
    """
    from purldb_spark.sources.miners2 import map_nuget_docs

    reqs = requests.selectExpr(
        "purl", "lower(name) AS _nlc", "version AS _want"
    )
    d = index_docs.selectExpr("name_lc AS _dn", "entries")
    joined = reqs.join(d, F.expr("_nlc = _dn"), "left")
    missing = joined.filter("entries IS NULL").select("purl")
    # map_nuget_docs drops the request columns; map each distinct catalog
    # entry once and rejoin on the mapped lowercased name — catalog
    # entries are version-unique per package
    exploded = (
        joined.filter("entries IS NOT NULL")
        .selectExpr("explode(entries) AS doc")
        .distinct()
    )
    entry_keys = (
        map_nuget_docs(exploded)
        .withColumnRenamed("purl", "entry_purl")
        .withColumn("_en", F.lower(F.col("name")))
    )
    reattach = joined.filter("entries IS NOT NULL").select(
        "purl", "_nlc", "_want"
    ).join(entry_keys, F.expr("_nlc = _en")).filter(
        "_want IS NULL OR version = _want"
    )
    rows = reattach.selectExpr(
        "purl",
        "'collected' AS status",
        "type",
        "name",
        "version",
        "download_url",
        "declared_license",
        "CAST(NULL AS STRING) AS sha256",
        "'source_archive' AS package_content",
        "datasource_id",
    )
    return rows.unionByName(_status_rows(missing, "does_not_exist", rows))


def npm_api_url(
    namespace: Column, name: Column, version: Column
) -> Column:
    """packagedcode npm_api_url semantics (used by collectors/npm.py:30):
    scoped packages percent-encode the '/' between scope and name and
    never pin a version in the URL; unscoped append /{version}."""
    base = F.lit("https://registry.npmjs.org/")
    scoped = F.concat(base, namespace, F.lit("%2f"), name)
    unscoped = F.when(
        version.isNotNull(), F.concat(base, name, F.lit("/"), version)
    ).otherwise(F.concat(base, name))
    return F.when(namespace.isNotNull(), scoped).otherwise(unscoped)


def map_npm_collect(requests: DataFrame, docs: DataFrame) -> DataFrame:
    """npm collect (collectors/npm.py:24-105): a versionless purl is
    silently skipped (process_request returns None — a
    ``missing_version`` status row here so the skip is observable); the
    (namespace?, name, version) package.json maps via the registry
    mapper; source_archive always."""
    from purldb_spark.sources.registry_json import packages_from_registry

    reqs = requests.selectExpr(
        "purl",
        "namespace AS _ns",
        "name AS _n",
        "version AS _v",
    )
    no_ver = reqs.filter("_v IS NULL").select("purl")
    # doc table is keyed by the FULL registry name ("@scope/name" for
    # scoped packages) — the same identifier the registry URL resolves
    ok = reqs.filter("_v IS NOT NULL").selectExpr(
        "*",
        "CASE WHEN _ns IS NOT NULL"
        " THEN concat('https://registry.npmjs.org/', _ns, '%2f', _n)"
        " ELSE CASE WHEN _v IS NOT NULL"
        " THEN concat('https://registry.npmjs.org/', _n, '/', _v)"
        " ELSE concat('https://registry.npmjs.org/', _n) END END AS api_url",
        "CASE WHEN _ns IS NOT NULL THEN concat(_ns, '/', _n)"
        " ELSE _n END AS _full",
    )
    d = docs.selectExpr("name AS _dn", "doc")
    joined = ok.join(d, F.expr("_full = _dn"), "left")
    missing = joined.filter("doc IS NULL").select("purl")
    found = joined.filter("doc IS NOT NULL")
    # registry mapper explodes the versions map; parse each distinct doc
    # once and rejoin on (full name, version) to pick the pinned release
    from purldb_spark.sources.registry_json import REGISTRY_SCHEMA

    parsed = (
        found.select("doc")
        .distinct()
        .select(F.from_json("doc", REGISTRY_SCHEMA).alias("r"))
        .select("r.*")
    )
    mapped = packages_from_registry(parsed, "npm")
    reattach = found.select("purl", "api_url", "_full", "_v").join(
        mapped.withColumnRenamed("purl", "entry_purl").withColumnRenamed(
            "name", "full_name"
        ),
        F.expr("_full = full_name AND _v = version"),
    )
    rows = reattach.selectExpr(
        "purl",
        "'collected' AS status",
        "'npm' AS type",
        "full_name AS name",
        "version",
        "api_url",
        "download_url",
        "'source_archive' AS package_content",
    )
    out_missing = _status_rows(missing, "does_not_exist", rows)
    out_no_ver = _status_rows(no_ver, "missing_version", rows)
    return rows.unionByName(out_missing).unionByName(out_no_ver)
