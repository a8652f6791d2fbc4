"""Collector enrichment, batch 3: conan-center recipes. Reference:
minecode/collectors/conan.py. The three recipe documents (config.yml,
conandata.yml, conanfile.py) arrive as pre-fetched tables keyed by
package name; mapping is pure column expressions:

- config.yml (collectors/conan.py:42-77 get_conan_recipe): the
  versions map names the recipe folder per version — purls whose
  version is absent resolve no recipe.
- conandata.yml (conan.py:79-91 get_download_info): sources[version]
  url + sha256; a url LIST takes its first element.
- conanfile.py (ConanFileHandler semantics): the recipe's class
  attributes — description, license, homepage, topics — read with
  anchored attribute regexes (the reference parses the python source;
  the attributes are string/tuple literals in conan-center recipes).
- flow (conan.py:93-130 map_conan_package + process_request): purls
  without a version are skipped there (no error string) — a
  ``missing_version`` status row here; missing recipe documents map to
  ``no_recipe``; a resolved recipe without a download url to
  ``no_download_url``; otherwise a ``collected`` row with
  package_content "source_archive".

The YAML reads are line-index lookups (array_position on the trimmed
line, folder/url/sha256 from the following indented lines) — exact for
the machine-written conan-center-index layout, and entirely inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lines(doc: Column) -> Column:
    return F.split(doc, "\n")


def _version_idx(doc: Column, section_child: Column) -> Column:
    """1-based index of the `"<version>":` line; 0 when absent."""
    return F.array_position(
        F.transform(_lines(doc), lambda l: F.trim(l)), section_child
    )


def config_folder(doc: Column, version: Column) -> Column:
    """Recipe folder for a version from config.yml (conan.py:53-60)."""
    key = F.concat(F.lit('"'), version, F.lit('":'))
    idx = _version_idx(doc, key)
    nxt = F.try_element_at(_lines(doc), (idx + 1).cast("int"))
    folder = F.nullif(
        F.trim(F.regexp_extract(F.coalesce(nxt, F.lit("")), r"folder:\s*(\S+)", 1)),
        F.lit(""),
    )
    return F.when(idx > 0, folder)


def conandata_download(doc: Column, version: Column) -> list[Column]:
    """(download_url, sha256) from conandata.yml sources[version]
    (conan.py:79-91); a url list takes its first element."""
    ls = _lines(doc)
    key = F.concat(F.lit('"'), version, F.lit('":'))
    idx = _version_idx(doc, key)
    block = F.when(idx > 0, F.slice(ls, (idx + 1).cast("int"), 6)).otherwise(
        F.array().cast("array<string>")
    )
    url_scalar = F.aggregate(
        block,
        F.lit(None).cast("string"),
        lambda acc, l: F.coalesce(
            acc,
            F.nullif(
                F.regexp_extract(l, r'^\s+url:\s*"?([^"\s][^"]*)"?\s*$', 1),
                F.lit(""),
            ),
        ),
    )
    url_list_first = F.aggregate(
        block,
        F.lit(None).cast("string"),
        lambda acc, l: F.coalesce(
            acc,
            F.nullif(
                F.regexp_extract(l, r'^\s+-\s*"?([^"\s][^"]*)"?\s*$', 1),
                F.lit(""),
            ),
        ),
    )
    sha = F.aggregate(
        block,
        F.lit(None).cast("string"),
        lambda acc, l: F.coalesce(
            acc,
            F.nullif(
                F.regexp_extract(l, r'^\s+sha256:\s*"?([0-9a-f]+)"?\s*$', 1),
                F.lit(""),
            ),
        ),
    )
    return [F.coalesce(url_scalar, url_list_first).alias("download_url"), sha.alias("sha256")]


def _class_attr(src: Column, attr: str) -> Column:
    """Class attribute value: a plain string literal, or the
    parenthesized adjacent-string-literal form real conan-center
    recipes use for long descriptions —

        description = (
            "part one "
            "part two"
        )

    whose value is the concatenation of the quoted parts."""
    plain = F.nullif(
        F.regexp_extract(src, rf'(?m)^\s*{attr}\s*=\s*"([^"]*)"', 1), F.lit("")
    )
    block = F.regexp_extract(src, rf"(?s)\b{attr}\s*=\s*\((.*?)\)", 1)
    joined = F.nullif(
        F.array_join(
            F.regexp_extract_all(block, F.lit(r'"([^"]*)"'), 1), ""
        ),
        F.lit(""),
    )
    return F.coalesce(plain, joined)


def conanfile_fields(src: Column) -> list[Column]:
    """description/license/homepage/topics class attributes of a
    conan-center conanfile.py (ConanFileHandler semantics)."""
    topics = F.nullif(
        F.array_join(
            F.regexp_extract_all(
                F.regexp_extract(src, r"(?m)^\s*topics\s*=\s*\(([^)]*)\)", 1),
                F.lit(r'"([^"]*)"'),
                1,
            ),
            "; ",
        ),
        F.lit(""),
    )
    return [
        _class_attr(src, "description").alias("description"),
        _class_attr(src, "license").alias("extracted_license_statement"),
        _class_attr(src, "homepage").alias("homepage_url"),
        topics.alias("keywords"),
    ]


def map_conan_requests(
    requests: DataFrame,
    configs: DataFrame,
    conandatas: DataFrame,
    conanfiles: DataFrame,
) -> DataFrame:
    """Conan collect flow (conan.py:93-156): requests carry
    purl/name/version; the three document tables are keyed by name
    (config) and (name, folder) (conandata/conanfile)."""
    reqs = requests.select(
        "purl", F.col("name").alias("_name"), F.col("version").alias("_ver")
    )
    no_ver = reqs.filter(F.col("_ver").isNull()).select(
        "purl", F.lit("missing_version").alias("status")
    )
    ok = reqs.filter(F.col("_ver").isNotNull())
    cfg = configs.select(
        F.col("name").alias("_cname"), F.col("doc").alias("_cfg")
    )
    with_folder = ok.join(
        cfg, F.col("_name") == F.col("_cname"), "left"
    ).withColumn("_folder", config_folder(F.col("_cfg"), F.col("_ver")))
    no_recipe1 = with_folder.filter(F.col("_folder").isNull()).select(
        "purl", F.lit("no_recipe").alias("status")
    )
    found = with_folder.filter(F.col("_folder").isNotNull())
    cd = conandatas.select(
        F.col("name").alias("_dname"),
        F.col("folder").alias("_dfolder"),
        F.col("doc").alias("_cd"),
    )
    cf = conanfiles.select(
        F.col("name").alias("_fname"),
        F.col("folder").alias("_ffolder"),
        F.col("doc").alias("_cf"),
    )
    joined = found.join(
        cd,
        (F.col("_name") == F.col("_dname")) & (F.col("_folder") == F.col("_dfolder")),
        "left",
    ).join(
        cf,
        (F.col("_name") == F.col("_fname")) & (F.col("_folder") == F.col("_ffolder")),
        "left",
    )
    # the reference errors when the conanfile is missing (conan.py:110-113)
    no_recipe2 = joined.filter(F.col("_cf").isNull()).select(
        "purl", F.lit("no_recipe").alias("status")
    )
    with_files = joined.filter(F.col("_cf").isNotNull())
    dl, sha = conandata_download(
        F.coalesce(F.col("_cd"), F.lit("")), F.col("_ver")
    )
    enriched = with_files.select(
        "purl",
        F.col("_name").alias("name"),
        F.col("_ver").alias("version"),
        dl,
        sha,
        *conanfile_fields(F.col("_cf")),
    )
    no_dl = enriched.filter(F.col("download_url").isNull()).select(
        "purl", F.lit("no_download_url").alias("status")
    )
    rows = enriched.filter(F.col("download_url").isNotNull()).select(
        "purl",
        F.lit("collected").alias("status"),
        F.lit("conan").alias("type"),
        "name",
        "version",
        "download_url",
        "sha256",
        "description",
        "extracted_license_statement",
        "homepage_url",
        "keywords",
        F.lit("source_archive").alias("package_content"),
    )
    errors = no_ver.unionByName(no_recipe1).unionByName(no_recipe2).unionByName(
        no_dl
    )
    null_cols = [
        F.lit(None).cast(rows.schema[c].dataType).alias(c)
        for c in rows.columns
        if c not in ("purl", "status")
    ]
    return rows.unionByName(errors.select("purl", "status", *null_cols))


# ---------------------------------------------------------------- golang --


def strip_go_version_prefix(v: Column) -> Column:
    """'version1.2' -> '1.2', 'v1.2' -> '1.2', else unchanged — the
    collector's tag normalization before building github purls
    (collectors/golang.py:210-214)."""
    return (
        F.when(v.startswith("version"), F.substring(v, 8, 1 << 20))
        .when(v.startswith("v"), F.substring(v, 2, 1 << 20))
        .otherwise(v)
    )


def golang_route_cols(purl: Column) -> list[Column]:
    """Route a pkg:golang purl to its metadata source the way the
    reference collector does (collectors/golang.py:33-65 + 171-249):

    - github.com hosts: subset = the two path segments after the host
      (extract_golang_subset_purl), target = the rewritten pkg:github
      purl handed to fetchcode.
    - gitlab.com hosts: subset = the FULL path after the host,
      percent-encoded including "/" (gitlab_updated_purl's
      quote(safe='')), target = the gitlab projects API URL.
    - bitbucket.org hosts: subset = the two segments, target = the
      bitbucket repositories API URL.
    - anything else: target = the deps.dev version API URL, with a "v"
      prefixed onto versions that lack one (get_package_json,
      golang.py:88-100).

    The version is everything after the LAST "@" (the reference's
    rpartition).
    """
    body = F.regexp_replace(purl, r"^pkg:golang/", "")
    version = F.nullif(
        F.when(purl.contains("@"), F.substring_index(purl, "@", -1)).otherwise(
            F.lit("")
        ),
        F.lit(""),
    )
    path = F.substring_index(body, "@", 1)
    parts = F.split(path, "/")
    host = F.element_at(parts, 1)
    two_seg = F.concat_ws("/", F.element_at(parts, 2), F.element_at(parts, 3))
    full_sub = F.regexp_replace(path, r"^[^/]+/", "")
    route = (
        F.when(host == "github.com", F.lit("github"))
        .when(host == "gitlab.com", F.lit("gitlab"))
        .when(host == "bitbucket.org", F.lit("bitbucket"))
        .otherwise(F.lit("depsdev"))
    )
    subset = (
        F.when(route == "gitlab", F.url_encode(full_sub))
        .when(route == "depsdev", F.url_encode(path))
        .otherwise(two_seg)
    )
    deps_version = F.when(
        version.startswith("v"), version
    ).otherwise(F.concat(F.lit("v"), version))
    target = (
        F.when(
            route == "github",
            F.when(
                version.isNotNull(),
                F.concat(F.lit("pkg:github/"), two_seg, F.lit("@"), version),
            ),
        )
        .when(
            route == "gitlab",
            F.concat(F.lit("https://gitlab.com/api/v4/projects/"), subset),
        )
        .when(
            route == "bitbucket",
            F.concat(
                F.lit("https://api.bitbucket.org/2.0/repositories/"), two_seg
            ),
        )
        .otherwise(
            F.when(
                version.isNotNull(),
                F.concat(
                    F.lit("https://api.deps.dev/v3/systems/GO/packages/"),
                    subset,
                    F.lit("/versions/"),
                    deps_version,
                ),
            )
        )
    )
    return [
        route.alias("route"),
        subset.alias("subset_path"),
        version.alias("version"),
        target.alias("target"),
    ]
