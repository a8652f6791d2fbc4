"""Per-ecosystem miner mappers, batch 6: bower (bower.json), haxe
(haxelib.json), dockerhub (repositories API + tags), nix
(NixOS package metadata API + narinfo cache). Same design as
sources/miners*.py — fetching stays on the rate-limited frontier; the
mapping from fetched documents to catalog rows is pure column
expressions (from_json + explode + projection, whole-stage codegen, no
Python UDFs):

- bower: bower.json content (minecode/miners/bower.py:105-206
  build_packages_from_jsonfile): licenses may be a string OR a list (both
  shapes parsed, list joined in first-seen order — the reference
  accumulates a set), vcs_url is "type+url" per the SPDX convention when
  the repository block has both, the single `author` string wins over the
  `authors` list, and `authors` entries take the part AFTER the first
  ":" — entries without a colon are dropped (the reference's split
  quirk, bower.py:176-184). Rows without a name are dropped
  (bower.py:139). The purl carries no version (the top-registry visitor
  mints it name-only, bower.py:66).
- haxe: haxelib.json via packagedcode's HaxelibJsonHandler semantics
  (minecode/miners/haxe.py:106-111 build_packages_with_json): homepage
  from `url`, license string, keywords from `tags`, contributor parties,
  dependency map -> pkg:haxe purls (version kept when non-empty), and
  the lib.haxe.org /download/ URL when a version exists.
- dockerhub: repository summary + tags API (minecode/miners/
  dockerhub.py:200-246 build_package_data): description joins
  short+full (blank parts dropped), namespace defaults to "library"
  (with the /_/ vs /r/ homepage split), one row per tag — version from
  the purl else the tag name, sha256 strips the "sha256:" digest prefix,
  last_updater_username party, layers download URL.
- nix: package metadata API (minecode/miners/nix.py:53-121
  build_packages + update_purl_with_version_qualifiers): releases
  filtered to the purl version when present, platforms x outputs
  exploded (null outputs skipped), system/commit/output become purl
  qualifiers (alphabetical, empties dropped), and the download URL
  resolves through the narinfo cache — a (hash -> url path) table joined
  by the store-path hash prefix (get_nix_download_url, nix.py:16-50;
  the reference fetches each narinfo over HTTP — the frontier
  pre-fetches them into the table here; unresolved hashes yield null).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ----------------------------------------------------------------- bower --

BOWER_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("homepage", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField("author", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField(
            "repository",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("url", T.StringType()),
                ]
            ),
        ),
        T.StructField("dependencies", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "devDependencies", T.MapType(T.StringType(), T.StringType())
        ),
    ]
)

# licenses is string-or-list in the wild; a second parse with the other
# shape nulls out on mismatch and coalesce picks the one that stuck
_BOWER_LIC_LIST = T.StructType(
    [T.StructField("licenses", T.ArrayType(T.StringType()))]
)
_BOWER_LIC_STR = T.StructType([T.StructField("licenses", T.StringType())])


def _dep_join(deps: Column) -> Column:
    """map<name,requirement> -> "name@req; ..." in map order."""
    return F.when(
        deps.isNotNull() & (F.size(deps) > 0),
        F.array_join(
            F.transform(
                F.map_entries(deps),
                lambda e: F.concat_ws("@", e["key"], F.nullif(e["value"], F.lit(""))),
            ),
            "; ",
        ),
    )


def map_bower_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """bower.json -> catalog rows (bower.py:105-206)."""
    raw = F.col(json_col)
    j = F.from_json(raw, BOWER_SCHEMA)
    lic_list = F.from_json(raw, _BOWER_LIC_LIST)["licenses"]
    lic_str = F.from_json(raw, _BOWER_LIC_STR)["licenses"]
    p = docs.select(
        j.alias("p"), lic_list.alias("_ll"), lic_str.alias("_ls")
    ).select("p.*", "_ll", "_ls")
    name = F.col("name")
    repo = F.col("repository")
    vcs = F.when(
        repo["type"].isNotNull() & repo["url"].isNotNull(),
        F.concat(repo["type"], F.lit("+"), repo["url"]),
    )
    # single author wins; else entries of `authors` containing ":" keep
    # the part after the first colon (bower.py:160-184)
    from_list = F.array_join(
        F.filter(
            F.transform(
                F.col("authors"),
                lambda a: F.when(
                    F.instr(a, ":") > 0,
                    F.trim(F.substring(a, F.instr(a, ":") + 1, F.lit(1 << 20))),
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        "; ",
    )
    parties = F.coalesce(F.col("author"), F.nullif(from_list, F.lit("")))
    lic = F.coalesce(
        F.when(
            F.col("_ll").isNotNull(),
            F.array_join(F.array_distinct(F.col("_ll")), "; "),
        ),
        F.col("_ls"),
    )
    return p.filter(name.isNotNull()).select(
        F.lit("bower").alias("type"),
        name.alias("name"),
        F.col("version"),
        # the reference purl carries the version when present
        # (expected_mapper_example1_bower fixture: pkg:bower/...@1.3.1)
        F.concat(
            F.lit("pkg:bower/"),
            name,
            F.when(
                F.col("version").isNotNull(),
                F.concat(F.lit("@"), F.col("version")),
            ).otherwise(F.lit("")),
        ).alias("purl"),
        F.col("description"),
        F.col("homepage").alias("homepage_url"),
        lic.alias("extracted_license_statement"),
        F.when(
            F.col("keywords").isNotNull(), F.array_join(F.col("keywords"), "; ")
        ).alias("keywords"),
        parties.alias("parties"),
        vcs.alias("vcs_url"),
        _dep_join(F.col("dependencies")).alias("dependencies"),
        _dep_join(F.col("devDependencies")).alias("dev_dependencies"),
        F.lit("bower_json").alias("datasource_id"),
    )


# ------------------------------------------------------------------ haxe --

HAXE_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("license", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("description", T.StringType()),
        T.StructField("contributors", T.ArrayType(T.StringType())),
        T.StructField("dependencies", T.MapType(T.StringType(), T.StringType())),
    ]
)


def map_haxe_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """haxelib.json -> catalog rows (haxe.py:106-111 via packagedcode
    HaxelibJsonHandler)."""
    p = docs.select(F.from_json(F.col(json_col), HAXE_SCHEMA).alias("p")).select(
        "p.*"
    )
    name, ver = F.col("name"), F.col("version")
    dl = F.when(
        ver.isNotNull(),
        F.concat(
            F.lit("https://lib.haxe.org/p/"), name, F.lit("/"), ver, F.lit("/download/")
        ),
    )
    deps = F.when(
        F.col("dependencies").isNotNull(),
        F.array_join(
            F.transform(
                F.map_entries(F.col("dependencies")),
                lambda e: F.concat(
                    F.lit("pkg:haxe/"),
                    e["key"],
                    F.when(
                        F.nullif(F.trim(e["value"]), F.lit("")).isNotNull(),
                        # purl version segments percent-encode reserved
                        # chars — the reference's expected dep purls carry
                        # %5E for the ^ range prefix
                        F.concat(F.lit("@"), F.url_encode(F.trim(e["value"]))),
                    ).otherwise(F.lit("")),
                ),
            ),
            "; ",
        ),
    )
    return p.filter(name.isNotNull()).select(
        F.lit("haxe").alias("type"),
        name.alias("name"),
        ver.alias("version"),
        F.concat_ws("@", F.concat(F.lit("pkg:haxe/"), name), ver).alias("purl"),
        F.col("description"),
        F.col("url").alias("homepage_url"),
        F.col("license").alias("extracted_license_statement"),
        F.when(F.col("tags").isNotNull(), F.array_join(F.col("tags"), "; ")).alias(
            "keywords"
        ),
        F.when(
            F.col("contributors").isNotNull(),
            F.array_join(F.col("contributors"), "; "),
        ).alias("parties"),
        dl.alias("download_url"),
        deps.alias("dependencies"),
        F.lit("haxelib_json").alias("datasource_id"),
    )


# ------------------------------------------------------------- dockerhub --

DOCKERHUB_SCHEMA = T.StructType(
    [
        T.StructField(
            "summary",
            T.StructType(
                [
                    T.StructField("description", T.StringType()),
                    T.StructField("full_description", T.StringType()),
                    T.StructField("is_private", T.BooleanType()),
                ]
            ),
        ),
        T.StructField(
            "tags",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("full_size", T.LongType()),
                        T.StructField("digest", T.StringType()),
                        T.StructField(
                            "last_updater_username", T.StringType()
                        ),
                    ]
                )
            ),
        ),
    ]
)


def map_dockerhub_docs(
    docs: DataFrame,
    json_col: str = "doc",
    name_col: str = "name",
    namespace_col: str = "namespace",
) -> DataFrame:
    """Docker Hub repository summary + tags -> one row per tag
    (dockerhub.py:200-246 build_package_data); a doc with NO tags still
    yields one summary-only row (the library-JSON mapper path,
    miners/dockerhub.py:174-198 build_packages_from_jsonfile — its
    expected fixture is the elixir summary with no version/download)."""
    j = F.from_json(F.col(json_col), DOCKERHUB_SCHEMA)
    null_tag = F.lit(None).cast(
        "struct<name:string,full_size:bigint,digest:string,"
        "last_updater_username:string>"
    )
    tags_or_summary = F.when(
        j["tags"].isNotNull() & (F.size(j["tags"]) > 0), j["tags"]
    ).otherwise(F.array(null_tag))
    base = docs.select(
        F.col(name_col).alias("_name"),
        F.col(namespace_col).alias("_ns_raw"),
        j["summary"].alias("s"),
        F.explode(tags_or_summary).alias("t"),
    )
    ns = F.coalesce(F.col("_ns_raw"), F.lit("library"))
    s, t = F.col("s"), F.col("t")
    desc = F.nullif(
        F.concat_ws(
            "\n",
            F.nullif(F.trim(F.coalesce(s["description"], F.lit(""))), F.lit("")),
            F.nullif(
                F.trim(F.coalesce(s["full_description"], F.lit(""))), F.lit("")
            ),
        ),
        F.lit(""),
    )
    # the join drops blank parts but keeps the ORIGINAL text of kept ones
    desc = F.when(
        desc.isNotNull(),
        F.array_join(
            F.filter(
                F.array(s["description"], s["full_description"]),
                lambda d: d.isNotNull() & (F.trim(d) != ""),
            ),
            "\n",
        ),
    )
    homepage = F.when(
        ns == "library",
        F.concat(F.lit("https://hub.docker.com/_/"), F.col("_name")),
    ).otherwise(
        F.concat(F.lit("https://hub.docker.com/r/"), ns, F.lit("/"), F.col("_name"))
    )
    return base.select(
        F.lit("docker").alias("type"),
        F.col("_name").alias("name"),
        F.col("_ns_raw").alias("namespace"),
        t["name"].alias("version"),
        F.concat_ws(
            "@",
            F.concat(
                F.lit("pkg:docker/"),
                F.when(F.col("_ns_raw").isNotNull(), F.concat(ns, F.lit("/"))).otherwise(
                    F.lit("")
                ),
                F.col("_name"),
            ),
            t["name"],
        ).alias("purl"),
        desc.alias("description"),
        s["is_private"].alias("is_private"),
        F.when(
            t["digest"].isNotNull(), F.substring(t["digest"], 8, 1 << 20)
        ).alias("sha256"),
        t["full_size"].alias("size"),
        t["last_updater_username"].alias("parties"),
        homepage.alias("homepage_url"),
        F.concat(
            F.lit("https://hub.docker.com/layers/"),
            ns,
            F.lit("/"),
            F.col("_name"),
            F.lit("/"),
            t["name"],
            F.lit("/images/"),
            t["digest"],
        ).alias("download_url"),
        F.lit("dockerhub_repositories").alias("datasource_id"),
    )


# ------------------------------------------------------------------- nix --

NIX_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("summary", T.StringType()),
        T.StructField("homepage_url", T.StringType()),
        T.StructField(
            "releases",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("version", T.StringType()),
                        T.StructField(
                            "platforms",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("date", T.StringType()),
                                        T.StructField("system", T.StringType()),
                                        T.StructField(
                                            "commit_hash", T.StringType()
                                        ),
                                        T.StructField(
                                            "outputs",
                                            T.ArrayType(
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "name", T.StringType()
                                                        ),
                                                        T.StructField(
                                                            "path", T.StringType()
                                                        ),
                                                    ]
                                                )
                                            ),
                                        ),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)
_NIX_LIC_LIST = T.StructType(
    [T.StructField("license", T.ArrayType(T.StringType()))]
)
_NIX_LIC_STR = T.StructType([T.StructField("license", T.StringType())])


def map_nix_docs(
    docs: DataFrame,
    narinfo: DataFrame | None = None,
    json_col: str = "doc",
    version_col: str | None = None,
) -> DataFrame:
    """Nix metadata -> one row per (release x platform x output)
    (nix.py:53-107); ``narinfo`` maps store-path hash -> nar URL path
    (``hash``/``url_path`` columns) and resolves download URLs
    (nix.py:16-50); null outputs are skipped, qualifiers are alphabetical
    with empties dropped (packageurl renders them sorted)."""
    raw = F.col(json_col)
    j = F.from_json(raw, NIX_SCHEMA)
    lic_list = F.from_json(raw, _NIX_LIC_LIST)["license"]
    lic_str = F.from_json(raw, _NIX_LIC_STR)["license"]
    want = F.col(version_col) if version_col else F.lit(None).cast("string")
    rel = docs.select(
        j["name"].alias("_name"),
        j["summary"].alias("_desc"),
        j["homepage_url"].alias("_home"),
        F.coalesce(
            F.when(lic_list.isNotNull(), F.array_join(lic_list, "; ")), lic_str
        ).alias("_lic"),
        want.alias("_want"),
        F.explode(j["releases"]).alias("r"),
    ).filter(F.col("_want").isNull() | (F.col("r")["version"] == F.col("_want")))
    plat = rel.select(
        "_name",
        "_desc",
        "_home",
        "_lic",
        F.col("r")["version"].alias("_ver"),
        F.explode(F.col("r")["platforms"]).alias("p"),
    ).filter(F.col("p")["outputs"].isNotNull())
    out = plat.select(
        "_name",
        "_desc",
        "_home",
        "_lic",
        "_ver",
        F.col("p")["date"].alias("_date"),
        F.col("p")["system"].alias("_sys"),
        F.col("p")["commit_hash"].alias("_commit"),
        F.explode(F.col("p")["outputs"]).alias("o"),
    )
    store_hash = F.substring_index(
        F.replace(F.col("o")["path"], F.lit("/nix/store/"), F.lit("")), "-", 1
    )
    quals = F.concat_ws(
        "&",
        *[
            F.when(
                F.nullif(c, F.lit("")).isNotNull(), F.concat(F.lit(q + "="), c)
            )
            for q, c in (
                ("commit", F.col("_commit")),
                ("output", F.col("o")["name"]),
                ("system", F.col("_sys")),
            )
        ],
    )
    rows = out.select(
        F.lit("nix").alias("type"),
        F.col("_name").alias("name"),
        F.col("_ver").alias("version"),
        F.concat(
            F.lit("pkg:nix/"),
            F.col("_name"),
            F.lit("@"),
            F.col("_ver"),
            F.when(F.nullif(quals, F.lit("")).isNotNull(), F.concat(F.lit("?"), quals)).otherwise(
                F.lit("")
            ),
        ).alias("purl"),
        F.col("_desc").alias("description"),
        F.col("_home").alias("homepage_url"),
        F.col("_lic").alias("extracted_license_statement"),
        F.to_date(F.col("_date")).alias("release_date"),
        store_hash.alias("_hash"),
        F.lit("nix_api_metadata").alias("datasource_id"),
    )
    if narinfo is None:
        return rows.withColumn("download_url", F.lit(None).cast("string")).drop(
            "_hash"
        )
    ni = narinfo.select(
        F.col("hash").alias("_hash"), F.col("url_path").alias("_url_path")
    )
    return (
        rows.join(F.broadcast(ni), "_hash", "left")
        .withColumn(
            "download_url",
            F.when(
                F.col("_url_path").isNotNull(),
                F.concat(F.lit("https://cache.nixos.org/"), F.col("_url_path")),
            ),
        )
        .drop("_hash", "_url_path")
    )


_DH_SEARCH_SCHEMA = T.StructType(
    [
        T.StructField("num_pages", T.IntegerType()),
        T.StructField("page", T.IntegerType()),
        T.StructField(
            "results",
            T.ArrayType(
                T.StructType([T.StructField("name", T.StringType())])
            ),
        ),
    ]
)


def dockerhub_search_uris(
    docs: DataFrame, json_col: str = "doc", uri_col: str = "uri"
) -> DataFrame:
    """DockerHub v1 search JSON -> repository API URIs with purls plus the
    next search page while page < num_pages
    (DockHubGetAllProjectsFromSearchVisitor,
    minecode/miners/dockerhub.py:135-159)."""
    j = F.from_json(F.col(json_col), _DH_SEARCH_SCHEMA)
    base = docs.select(
        F.col(uri_col).alias("source_uri"),
        j["num_pages"].alias("_np"),
        j["page"].alias("_p"),
        j["results"].alias("_rs"),
    )
    nxt = base.filter(
        F.col("_np").isNotNull()
        & F.col("_p").isNotNull()
        & (F.col("_p") < F.col("_np"))
    ).select(
        F.concat(
            F.regexp_replace(F.col("source_uri"), r"=[^=]*$", "="),
            (F.col("_p") + 1).cast("string"),
        ).alias("uri"),
        F.lit(None).cast("string").alias("package_url"),
        "source_uri",
    )
    names = base.select(
        "source_uri", F.explode("_rs").alias("r")
    ).filter(F.col("r.name").isNotNull())
    repos = names.select(
        F.concat(
            F.lit("https://hub.docker.com/v2/repositories/"), F.col("r.name")
        ).alias("uri"),
        F.concat(F.lit("pkg:docker/"), F.col("r.name")).alias("package_url"),
        "source_uri",
    )
    return nxt.unionByName(repos)
