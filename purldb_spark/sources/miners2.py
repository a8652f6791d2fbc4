"""Per-ecosystem miner mappers, batch 2: cargo (crates.io), gem
(RubyGems API v2), composer (Packagist), nuget (catalog API), golang
(godoc import paths). Same design as sources/miners.py — the fetch is a
rate-limited frontier; the mapping from fetched documents to catalog rows
is pure column expressions (from_json + explode + projection, whole-stage
codegen, no Python):

- cargo: crates.io crate document {crate:{keywords}, versions:[...]}, one
  row per version (minecode/miners/cargo.py:14-89 build_packages);
  author = published_by.name else .login; license skipped when 'UNKNOWN';
  download_url = 'https://crates.io' + dl_path (the reference issues a
  HEAD to resolve the redirect — frontier I/O, kept as the API path here).
- gem: RubyGems v2 gem document (minecode/miners/rubygems.py:210-262
  build_rubygem_packages_from_api_v2_data); licenses array joined later,
  gem_uri download, sha -> sha256.
- composer: Packagist package document {package:{language, versions:{v:
  ...}}} (minecode/miners/packagist.py:82-150 build_packages_with_json);
  vcs_url = 'git+' + source.url when source.type = git; dist url/shasum.
- nuget: catalog entry document (minecode/miners/nuget.py:183-225
  build_packages_with_json); description = summary '\\n' description
  unless identical; authors comma-split.
- golang: parse_package_path (minecode/miners/golang.py:179-212) as a
  column expression — well-known hosts keep 3 segments and gain a
  vcs_repository qualifier; namespace = all-but-last, name = last.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ----------------------------------------------------------------- cargo --

CARGO_DOC_SCHEMA = T.StructType(
    [
        T.StructField(
            "crate", T.StructType([T.StructField("keywords", T.ArrayType(T.StringType()))])
        ),
        T.StructField(
            "versions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("crate", T.StringType()),
                        T.StructField("num", T.StringType()),
                        T.StructField("description", T.StringType()),
                        T.StructField("homepage", T.StringType()),
                        T.StructField("repository", T.StringType()),
                        T.StructField("license", T.StringType()),
                        T.StructField("dl_path", T.StringType()),
                        T.StructField("crate_size", T.LongType()),
                        T.StructField("checksum", T.StringType()),
                        T.StructField(
                            "published_by",
                            T.StructType(
                                [
                                    T.StructField("name", T.StringType()),
                                    T.StructField("login", T.StringType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def map_cargo_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """crates.io API documents -> one catalog row per version
    (cargo.py:14-89): rows without a dl_path are dropped exactly like the
    reference (no download -> no package)."""
    j = F.from_json(F.col(json_col), CARGO_DOC_SCHEMA)
    out = docs.select(
        j["crate"]["keywords"].alias("keywords"), F.explode(j["versions"]).alias("v")
    ).where(F.col("v.dl_path").isNotNull())
    v = F.col("v")
    author = F.coalesce(v["published_by"]["name"], v["published_by"]["login"])
    return out.select(
        F.lit("cargo").alias("type"),
        v["crate"].alias("name"),
        v["num"].alias("version"),
        F.concat(F.lit("pkg:cargo/"), v["crate"], F.lit("@"), v["num"]).alias("purl"),
        v["description"].alias("description"),
        v["homepage"].alias("homepage_url"),
        v["repository"].alias("repository_homepage_url"),
        F.when(
            v["license"].isNotNull() & (v["license"] != "UNKNOWN"), v["license"]
        ).alias("declared_license"),
        F.col("keywords"),
        author.alias("author"),
        F.concat(F.lit("https://crates.io"), v["dl_path"]).alias("download_url"),
        v["crate_size"].alias("size"),
        v["checksum"].alias("sha256"),
        F.lit("cargo_api_metadata").alias("datasource_id"),
    )


# ------------------------------------------------------------------- gem --

GEM_V2_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("homepage_uri", T.StringType()),
        T.StructField("project_uri", T.StringType()),
        T.StructField("version_created_at", T.StringType()),
        T.StructField("licenses", T.ArrayType(T.StringType())),
        T.StructField("authors", T.StringType()),
        T.StructField("gem_uri", T.StringType()),
        T.StructField("sha", T.StringType()),
    ]
)


def map_gem_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """RubyGems API v2 documents -> one catalog row each
    (rubygems.py:210-262)."""
    j = F.from_json(F.col(json_col), GEM_V2_SCHEMA)
    return docs.select(j.alias("g")).select(
        F.lit("gem").alias("type"),
        F.col("g.name").alias("name"),
        F.col("g.version").alias("version"),
        F.concat(F.lit("pkg:gem/"), F.col("g.name"), F.lit("@"), F.col("g.version")).alias(
            "purl"
        ),
        F.col("g.description").alias("description"),
        F.col("g.homepage_uri").alias("homepage_url"),
        F.col("g.project_uri").alias("repository_homepage_url"),
        F.col("g.version_created_at").alias("release_date_raw"),
        F.nullif(
            F.array_join(F.coalesce(F.col("g.licenses"), F.array()), "; "), F.lit("")
        ).alias("declared_license"),
        F.col("g.authors").alias("author"),
        F.col("g.gem_uri").alias("download_url"),
        F.col("g.sha").alias("sha256"),
        F.lit("gem_api_metadata").alias("datasource_id"),
    )


# -------------------------------------------------------------- composer --

PACKAGIST_SCHEMA = T.StructType(
    [
        T.StructField(
            "package",
            T.StructType(
                [
                    T.StructField("language", T.StringType()),
                    T.StructField(
                        "versions",
                        T.MapType(
                            T.StringType(),
                            T.StructType(
                                [
                                    T.StructField("name", T.StringType()),
                                    T.StructField("version", T.StringType()),
                                    T.StructField("description", T.StringType()),
                                    T.StructField("homepage", T.StringType()),
                                    T.StructField(
                                        "keywords", T.ArrayType(T.StringType())
                                    ),
                                    T.StructField(
                                        "source",
                                        T.StructType(
                                            [
                                                T.StructField("type", T.StringType()),
                                                T.StructField("url", T.StringType()),
                                            ]
                                        ),
                                    ),
                                    T.StructField(
                                        "dist",
                                        T.StructType(
                                            [
                                                T.StructField("url", T.StringType()),
                                                T.StructField("shasum", T.StringType()),
                                            ]
                                        ),
                                    ),
                                    T.StructField(
                                        "license", T.ArrayType(T.StringType())
                                    ),
                                ]
                            ),
                        ),
                    ),
                ]
            ),
        )
    ]
)


def map_packagist_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """Packagist package documents -> one catalog row per version
    (packagist.py:82-150): vcs_url only for git sources ('Packagist only
    has the github repo'), license array deduped and joined."""
    j = F.from_json(F.col(json_col), PACKAGIST_SCHEMA)
    out = docs.select(
        j["package"]["language"].alias("primary_language"),
        F.explode(j["package"]["versions"]).alias("vkey", "v"),
    )
    v = F.col("v")
    vcs = F.when(
        (v["source"]["type"] == "git") & v["source"]["url"].isNotNull(),
        F.concat(F.lit("git+"), v["source"]["url"]),
    )
    return out.select(
        F.lit("composer").alias("type"),
        v["name"].alias("name"),
        v["version"].alias("version"),
        F.concat(F.lit("pkg:composer/"), v["name"], F.lit("@"), v["version"]).alias("purl"),
        v["description"].alias("description"),
        F.col("primary_language"),
        v["homepage"].alias("homepage_url"),
        F.col("v.keywords").alias("keywords"),
        vcs.alias("vcs_url"),
        v["dist"]["url"].alias("download_url"),
        v["dist"]["shasum"].alias("sha1"),
        F.nullif(
            F.array_join(
                F.array_sort(F.array_distinct(F.coalesce(v["license"], F.array()))), "; "
            ),
            F.lit(""),
        ).alias("declared_license"),
        F.lit("php_composer_json").alias("datasource_id"),
    )


# ----------------------------------------------------------------- nuget --

NUGET_DOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("licenseUrl", T.StringType()),
        T.StructField("licenseExpression", T.StringType()),
        T.StructField("copyright", T.StringType()),
        T.StructField("authors", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("projectUrl", T.StringType()),
        T.StructField("packageContent", T.StringType()),
    ]
)


def map_nuget_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """NuGet catalog documents -> one catalog row each (nuget.py:183-225):
    description = summary '\\n' long description, dropping the long part
    when identical to the summary; authors comma-split into an array."""
    j = F.from_json(F.col(json_col), NUGET_DOC_SCHEMA)
    out = docs.select(j.alias("n"))
    n = F.col("n")
    nonblank = lambda c: F.when(c.isNotNull() & (F.trim(c) != ""), c)  # noqa: E731
    # keep the long description when summary is null (NULL != x is SQL NULL,
    # not false — the reference keeps the description in that common case)
    long_desc = F.when(
        n["summary"].isNull() | (n["description"] != n["summary"]), n["description"]
    )
    return out.select(
        F.lit("nuget").alias("type"),
        n["id"].alias("name"),
        n["version"].alias("version"),
        F.concat(F.lit("pkg:nuget/"), n["id"], F.lit("@"), n["version"]).alias("purl"),
        F.nullif(
            F.concat_ws("\n", nonblank(n["summary"]), nonblank(long_desc)), F.lit("")
        ).alias("description"),
        n["projectUrl"].alias("homepage_url"),
        n["licenseUrl"].alias("declared_license"),
        n["licenseExpression"].alias("declared_license_expression"),
        n["copyright"].alias("copyright"),
        F.when(
            n["authors"].isNotNull(),
            F.transform(F.split(n["authors"], ","), lambda a: F.trim(a)),
        ).alias("authors"),
        n["tags"].alias("keywords"),
        n["packageContent"].alias("download_url"),
        F.lit("nuget_api_metadata").alias("datasource_id"),
    )


# ---------------------------------------------------------------- golang --

_GO_HOSTS = ("bitbucket.org/", "github.com/", "gitlab.com/")


def parse_golang_path(path: Column) -> DataFrame:
    """parse_package_path (golang.py:179-212) as one struct-valued column:
    (namespace, name, vcs_repository, trimmed_path). Well-known repo hosts
    keep only host/owner/repo and carry the repo URL qualifier."""
    well_known = F.lit(False)
    for h in _GO_HOSTS:
        well_known = well_known | path.startswith(h)
    segs = F.split(path, "/")
    kept = F.when(well_known, F.slice(segs, 1, 3)).otherwise(segs)
    nseg = F.size(kept)
    namespace = F.when(
        nseg > 1, F.array_join(F.slice(kept, 1, nseg - 1), "/")
    )
    name = F.element_at(kept, -1)
    repo = F.when(well_known, F.concat(F.lit("https://"), F.array_join(kept, "/")))
    return F.struct(
        namespace.alias("namespace"),
        name.alias("name"),
        repo.alias("vcs_repository"),
        F.array_join(kept, "/").alias("path"),
    )


def map_golang_paths(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Go import paths -> catalog rows (build_golang_package,
    golang.py:222-240): purl with the vcs_repository qualifier, homepage
    from namespace/name, git vcs_url for github namespaces."""
    parsed = df.select(parse_golang_path(F.col(path_col)).alias("p"))
    p = F.col("p")
    qual = F.when(
        p["vcs_repository"].isNotNull(),
        F.concat(F.lit("?vcs_repository="), p["vcs_repository"]),
    ).otherwise(F.lit(""))
    vcs = F.when(
        p["namespace"].contains("github.com") & p["vcs_repository"].isNotNull(),
        F.concat(F.lit("git+"), p["vcs_repository"]),
    ).otherwise(p["vcs_repository"])
    return parsed.select(
        F.lit("golang").alias("type"),
        p["namespace"].alias("namespace"),
        p["name"].alias("name"),
        F.concat(
            F.lit("pkg:golang/"),
            F.concat_ws("/", p["namespace"], p["name"]),
            qual,
        ).alias("purl"),
        F.lit("Go").alias("primary_language"),
        F.concat(
            F.lit("https://"), F.concat_ws("/", p["namespace"], p["name"])
        ).alias("homepage_url"),
        vcs.alias("vcs_url"),
        F.lit("golang_godoc").alias("datasource_id"),
    )


def map_godoc_api_docs(
    docs: DataFrame, json_col: str = "doc", purl_col: str = "purl"
) -> DataFrame:
    """godoc api package JSON + its visitor-assigned purl -> catalog row
    (build_golang_package, golang.py:219-239): type/namespace/name come
    from the PURL (the bitbucket-hosted variant keeps its pkg:bitbucket
    type), vcs_url from the purl's vcs_repository qualifier with a `git+`
    prefix only for github namespaces, homepage https://{ns}/{name},
    description = the godoc synopsis."""
    purl = F.col(purl_col)
    j = F.from_json(F.col(json_col), "struct<name:string,synopsis:string>")
    ptype = F.regexp_extract(purl, r"^pkg:([^/]+)/", 1)
    rest = F.regexp_replace(
        F.regexp_replace(purl, r"^pkg:[^/]+/", ""), r"\?.*$", ""
    )
    segs = F.split(rest, "/")
    name = F.element_at(segs, -1)
    namespace = F.nullif(
        F.array_join(F.slice(segs, 1, F.size(segs) - 1), "/"), F.lit("")
    )
    vcs_repo = F.nullif(
        F.regexp_extract(purl, r"[?&]vcs_repository=([^&]+)", 1), F.lit("")
    )
    vcs = F.when(
        namespace.contains("github.com") & vcs_repo.isNotNull(),
        F.concat(F.lit("git+"), vcs_repo),
    ).otherwise(vcs_repo)
    return docs.select(
        ptype.alias("type"),
        namespace.alias("namespace"),
        name.alias("name"),
        F.concat(F.lit("pkg:"), ptype, F.lit("/"), rest).alias("purl"),
        j["synopsis"].alias("description"),
        F.concat(F.lit("https://"), F.concat_ws("/", namespace, name)).alias(
            "homepage_url"
        ),
        vcs.alias("vcs_url"),
        F.lit("Go").alias("primary_language"),
    )


def map_gemspec_yaml_docs(
    docs: DataFrame,
    yaml_col: str = "metadata",
    dl_col: str = "download_url",
) -> DataFrame:
    """Gem-archive gemspec YAML (the `metadata` file inside a .gem) ->
    catalog row (build_rubygem_packages_from_metadata,
    minecode/miners/rubygems.py:271-327 + get_dependencies_from_meta at
    329-374): summary joined with a distinct description, license and
    author list blocks, date's first token as the release date, the
    two-level !ruby/object version, and the dependency array — bare-name
    purls, scope from the :type tag, `>= 0` constraints dropped as
    no-ops. The ruby YAML never leaves the JVM: every field is a regexp
    over the document (top-level keys anchor at column 0, so indented
    dependency fields can't shadow them)."""
    y = F.col(yaml_col)
    line = lambda key: F.nullif(  # noqa: E731
        F.trim(F.regexp_extract(y, rf"(?m)^{key}: (.+)$", 1)), F.lit("")
    )
    name = line("name")
    summary = line("summary")
    desc = line("description")
    description = F.concat_ws(
        "\n",
        F.filter(
            F.array(summary, F.when(desc != summary, desc)),
            lambda d: d.isNotNull() & (F.trim(d) != ""),
        ),
    )
    version = F.nullif(
        F.regexp_replace(
            F.trim(
                F.regexp_extract(
                    y,
                    r"(?ms)^version: !ruby/object:Gem::Version\s*\n\s+version: (.+?)$",
                    1,
                )
            ),
            r"^'|'$",
            "",
        ),
        F.lit(""),
    )
    # [^\n] not `.` — with (?s) in play a dot-star would swallow the
    # rest of the document past the block
    lic_block = F.regexp_extract(
        y, r"(?m)^licenses:[ \t]*\n((?:- [^\n]*\n)+)", 1
    )
    licenses = F.regexp_extract_all(lic_block, F.lit(r"(?m)^- (.+)$"), 1)
    auth_block = F.regexp_extract(
        y, r"(?m)^authors:[ \t]*\n((?:- [^\n]*\n)+)", 1
    )
    authors = F.regexp_extract_all(auth_block, F.lit(r"(?m)^- (.+)$"), 1)
    release_date = F.substring(line("date"), 1, 10)
    dep_frags = F.regexp_extract_all(
        y, F.lit(r"(?s)- !ruby/object:Gem::Dependency\n(.*?)(?=type:)"), 1
    )
    dep_scopes = F.regexp_extract_all(
        y,
        F.lit(r"(?s)- !ruby/object:Gem::Dependency\n.*?type: :(\w+)"),
        1,
    )
    req_of = lambda frag: F.array_join(  # noqa: E731
        F.filter(
            F.transform(
                F.regexp_extract_all(
                    frag,
                    F.lit(
                        r'- - "([^"]+)"\s*\n\s*- !ruby/object:Gem::Version'
                        r"\s*\n\s*version: '([^']*)'"
                    ),
                    0,
                ),
                lambda m: F.concat_ws(
                    " ",
                    F.regexp_extract(m, r'- - "([^"]+)"', 1),
                    F.regexp_extract(m, r"version: '([^']*)'", 1),
                ),
            ),
            lambda c: c != ">= 0",
        ),
        ", ",
    )
    deps = F.zip_with(
        dep_frags,
        dep_scopes,
        lambda frag, scope: F.struct(
            F.regexp_extract(frag, r"name: (.+)", 1).alias("purl"),
            F.nullif(req_of(frag), F.lit("")).alias("extracted_requirement"),
            scope.alias("scope"),
        ),
    )
    return docs.select(
        F.lit("gem").alias("type"),
        name.alias("name"),
        version.alias("version"),
        F.concat(F.lit("pkg:gem/"), name, F.lit("@"), version).alias("purl"),
        F.nullif(description, F.lit("")).alias("description"),
        line("homepage").alias("homepage_url"),
        licenses.alias("extracted_license_statement"),
        authors.alias("authors"),
        release_date.alias("release_date"),
        F.col(dl_col).alias("download_url"),
        deps.alias("dependencies"),
    )
