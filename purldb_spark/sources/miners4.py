"""Per-ecosystem miner mappers, batch 4: bitbucket (API 2.0 repo +
downloads), gitlab (projects API), github (repos API with tags /
downloads / branch fallbacks), eclipse (projects-JSON API), hex (hex.pm
API), pub (pub.dev versions API). Same design as sources/miners.py /
miners2.py / miners3.py — fetching stays on the rate-limited frontier;
the mapping from fetched documents to catalog rows is pure column
expressions (from_json + explode + projection, whole-stage codegen, no
Python UDFs):

- bitbucket repo template: minecode/miners/bitbucket.py:263-301
  build_bitbucket_repo_package — scm defaults to git, bb_url =
  '<scm>+https://bitbucket.org/<ns>/<name>', homepage = website else
  bb_url, code_view = bb_url + '/src', bug_tracking = bb_url + '/issues'
  only when has_issues, owner username as an owner party.
- bitbucket downloads: bitbucket.py:200-237 — one row per downloads
  value, download_url = links.self.href, size carried through.
- gitlab: minecode/miners/gitlab.py:116-141 build_packages_from_json —
  homepage = web_url, vcs_url = 'git+' + http_url_to_repo, code_view =
  vcs_url, release_date parsed from created_at.
- github: minecode/miners/github.py:221-294 build_github_packages —
  namespace/name from full_name; one row per download (html_url + size +
  created_at), two rows per tag (tarball_url + zipball_url with
  versioned purl + commit sha1), branch archive fallback rows when a
  repo has neither tags nor downloads.
- eclipse: minecode/miners/eclipse.py:187-232 build_packages_with_json —
  projects map explode, description = descriptions[0].value else title,
  homepage = website_url[0].url, bug_tracking = bugzilla[0].query_url,
  licenses -> names, one row per download_url entry.
- hex: minecode/miners/hex.py:20-59 build_single_package — the frontier
  pairs the package metadata doc with each fetched release version_info;
  the mapper projects description/licenses from meta, owner parties,
  sha256 from the release checksum, a repo.hex.pm tarball download URL
  (packageurl purl2url build_hex_download_url shape) and the
  per-release api_data_url.
- pub: minecode/miners/pub.py:11-78 build_packages — versions explode,
  pubspec fields, 'unknown' license dropped case-insensitively, pub.dev
  versioned .tar.gz archive download URL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------- bitbucket --

BITBUCKET_REPO_SCHEMA = T.StructType(
    [
        T.StructField("full_name", T.StringType()),
        T.StructField("scm", T.StringType()),
        T.StructField("website", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("has_issues", T.BooleanType()),
        T.StructField(
            "owner",
            T.StructType(
                [
                    T.StructField("username", T.StringType()),
                    T.StructField(
                        "links",
                        T.StructType(
                            [
                                T.StructField(
                                    "html",
                                    T.StructType([T.StructField("href", T.StringType())]),
                                )
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def _bb_ns(full_name: Column) -> Column:
    return F.substring_index(full_name, "/", 1)


def _bb_name(full_name: Column) -> Column:
    return F.substring_index(full_name, "/", -1)


def map_bitbucket_repo_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """Bitbucket repo documents -> one template catalog row each
    (bitbucket.py:263-301): no version, no download URL."""
    j = F.from_json(F.col(json_col), BITBUCKET_REPO_SCHEMA)
    r = docs.select(j.alias("r")).select("r.*").where(F.col("full_name").isNotNull())
    ns, name = _bb_ns(F.col("full_name")), _bb_name(F.col("full_name"))
    scm = F.coalesce(F.col("scm"), F.lit("git"))
    bb_url = F.concat(scm, F.lit("+https://bitbucket.org/"), ns, F.lit("/"), name)
    return r.select(
        F.lit("bitbucket").alias("type"),
        ns.alias("namespace"),
        name.alias("name"),
        F.concat(F.lit("pkg:bitbucket/"), ns, F.lit("/"), name).alias("purl"),
        # reference uses Python falsy-or: an empty-string website falls
        # back to the repo url (caught by the repository_expected fixture)
        F.coalesce(F.nullif(F.col("website"), F.lit("")), bb_url).alias(
            "homepage_url"
        ),
        F.concat(bb_url, F.lit("/src")).alias("code_view_url"),
        F.when(F.col("has_issues"), F.concat(bb_url, F.lit("/issues"))).alias(
            "bug_tracking_url"
        ),
        F.col("description"),
        bb_url.alias("vcs_url"),
        F.col("language").alias("primary_language"),
        F.col("owner")["username"].alias("owner"),
        F.col("owner")["links"]["html"]["href"].alias("owner_url"),
    )


BITBUCKET_DOWNLOADS_SCHEMA = T.StructType(
    [
        T.StructField(
            "values",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("size", T.LongType()),
                        T.StructField(
                            "links",
                            T.StructType(
                                [
                                    T.StructField(
                                        "self",
                                        T.StructType(
                                            [T.StructField("href", T.StringType())]
                                        ),
                                    )
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def map_bitbucket_download_docs(
    docs: DataFrame, json_col: str = "doc", purl_col: str = "package_url"
) -> DataFrame:
    """Bitbucket downloads documents -> one catalog row per download value
    (bitbucket.py:200-237); the frontier carries the repo purl alongside
    the fetched page exactly like ResourceURI.package_url."""
    j = F.from_json(F.col(json_col), BITBUCKET_DOWNLOADS_SCHEMA)
    rows = docs.select(
        F.col(purl_col).alias("purl"), F.explode(j["values"]).alias("d")
    )
    purl = F.col("purl")
    ns = F.substring_index(F.regexp_replace(purl, "^pkg:bitbucket/", ""), "/", 1)
    name = F.substring_index(purl, "/", -1)
    return rows.select(
        F.lit("bitbucket").alias("type"),
        ns.alias("namespace"),
        name.alias("name"),
        purl,
        F.col("d")["links"]["self"]["href"].alias("download_url"),
        F.col("d")["size"].alias("size"),
    )


# ---------------------------------------------------------------- gitlab --

GITLAB_PROJECT_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("web_url", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("http_url_to_repo", T.StringType()),
        T.StructField("created_at", T.StringType()),
    ]
)


def map_gitlab_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """GitLab project documents -> one catalog row each
    (gitlab.py:116-141): rows without a name are dropped; vcs_url and
    code_view_url are the git+ form of http_url_to_repo."""
    j = F.from_json(F.col(json_col), GITLAB_PROJECT_SCHEMA)
    p = docs.select(j.alias("p")).select("p.*").where(F.col("name").isNotNull())
    vcs = F.when(
        F.col("http_url_to_repo").isNotNull(),
        F.concat(F.lit("git+"), F.col("http_url_to_repo")),
    )
    # the purl name is the web_url's last path segment (the project slug),
    # NOT the display name — gitlab.py:88-91 rpartition("/")[-1]; display
    # names may contain spaces/uppercase and are kept only in `name`
    slug = F.substring_index(F.col("web_url"), "/", -1)
    return p.select(
        F.lit("gitlab").alias("type"),
        F.col("name"),
        F.concat(F.lit("pkg:gitlab/"), slug).alias("purl"),
        F.col("web_url").alias("homepage_url"),
        F.col("description"),
        vcs.alias("vcs_url"),
        vcs.alias("code_view_url"),
        F.to_date(F.substring(F.col("created_at"), 1, 10)).alias("release_date"),
    )


# ---------------------------------------------------------------- github --

GITHUB_REPO_SCHEMA = T.StructType(
    [
        T.StructField("full_name", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("html_url", T.StringType()),
        T.StructField("git_url", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("owner", T.StringType()),
        T.StructField(
            "downloads",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("html_url", T.StringType()),
                        T.StructField("size", T.LongType()),
                        T.StructField("created_at", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "tags",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("tarball_url", T.StringType()),
                        T.StructField("zipball_url", T.StringType()),
                        T.StructField("sha1", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("branches_download_urls", T.ArrayType(T.StringType())),
    ]
)


def map_github_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """GitHub repo documents (the visitor's enriched JSON,
    github.py:84-195) -> catalog rows per github.py:221-294: download
    rows, tag tarball+zipball rows with versioned purls and commit sha1,
    and branch-archive fallback rows. The base projection is computed
    once and reused by every row family — one scan, three projections,
    one union."""
    j = F.from_json(F.col(json_col), GITHUB_REPO_SCHEMA)
    r = docs.select(j.alias("r")).select("r.*").where(F.col("full_name").isNotNull())
    ns = _bb_ns(F.col("full_name"))
    name = _bb_name(F.col("full_name"))
    base_cols = [
        F.lit("github").alias("type"),
        ns.alias("namespace"),
        name.alias("name"),
        F.col("description"),
        F.col("language").alias("primary_language"),
        F.col("html_url").alias("homepage_url"),
        F.when(
            F.col("git_url").isNotNull(), F.concat(F.lit("git+"), F.col("git_url"))
        ).alias("vcs_url"),
        F.col("owner"),
    ]
    base = r.select(
        *base_cols,
        F.col("size").alias("repo_size"),
        F.col("downloads"),
        F.col("tags"),
        F.col("branches_download_urls"),
    )
    purl0 = F.concat(F.lit("pkg:github/"), F.col("namespace"), F.lit("/"), F.col("name"))

    dl = base.select(
        "type", "namespace", "name", "description", "primary_language",
        "homepage_url", "vcs_url", "owner", F.explode("downloads").alias("d"),
    ).select(
        "type", "namespace", "name",
        purl0.alias("purl"),
        F.lit(None).cast("string").alias("version"),
        "description", "primary_language", "homepage_url", "vcs_url", "owner",
        F.col("d")["html_url"].alias("download_url"),
        F.col("d")["size"].alias("size"),
        F.lit(None).cast("string").alias("sha1"),
        F.to_date(F.substring(F.col("d")["created_at"], 1, 10)).alias("release_date"),
    )

    # the reference mutates ONE package object across its yield loops
    # (attr.evolve, github.py:254-296): every tag row inherits the LAST
    # html_url-download's size and release_date — visible in its own
    # mojombo_grit fixture where all 30 tag rows carry the one download's
    # size/date. Replicated here deliberately for row-for-row parity.
    last_dl = F.try_element_at(
        F.filter(F.col("downloads"), lambda d: d["html_url"].isNotNull()),
        F.lit(-1),
    )
    inherited_size = F.coalesce(last_dl["size"], F.col("repo_size"))
    inherited_date = F.to_date(F.substring(last_dl["created_at"], 1, 10))
    tag_rows = base.select(
        "type", "namespace", "name", "description", "primary_language",
        "homepage_url", "vcs_url", "owner", F.col("repo_size"),
        inherited_size.alias("_isize"),
        inherited_date.alias("_idate"),
        F.explode("tags").alias("t"),
    )
    t = F.col("t")
    purl_v = F.concat(purl0, F.lit("@"), t["name"])
    tag_common = [
        F.col("type"), F.col("namespace"), F.col("name"),
        purl_v.alias("purl"),
        t["name"].alias("version"),
        F.col("description"), F.col("primary_language"), F.col("homepage_url"),
        F.col("vcs_url"), F.col("owner"),
    ]
    tails = [
        F.col("_isize").alias("size"),
        t["sha1"].alias("sha1"),
        F.col("_idate").alias("release_date"),
    ]
    tar = tag_rows.where(t["tarball_url"].isNotNull()).select(
        *tag_common, t["tarball_url"].alias("download_url"), *tails
    )
    zipb = tag_rows.where(t["zipball_url"].isNotNull()).select(
        *tag_common, t["zipball_url"].alias("download_url"), *tails
    )

    # branch rows inherit the same carried-over state (last tag's
    # version/sha1/versioned purl, last download's size/date) — the
    # evolve chain continues into the branches loop (github.py:292-296)
    last_tag = F.try_element_at(F.col("tags"), F.lit(-1))
    branches = base.select(
        "type", "namespace", "name", "description", "primary_language",
        "homepage_url", "vcs_url", "owner", F.col("repo_size"),
        inherited_size.alias("_isize"),
        inherited_date.alias("_idate"),
        last_tag["name"].alias("_lver"),
        last_tag["sha1"].alias("_lsha"),
        F.explode("branches_download_urls").alias("burl"),
    ).select(
        "type", "namespace", "name",
        F.when(
            F.col("_lver").isNotNull(),
            F.concat(purl0, F.lit("@"), F.col("_lver")),
        ).otherwise(purl0).alias("purl"),
        F.col("_lver").alias("version"),
        "description", "primary_language", "homepage_url", "vcs_url", "owner",
        F.col("burl").alias("download_url"),
        F.col("_isize").alias("size"),
        F.col("_lsha").alias("sha1"),
        F.col("_idate").alias("release_date"),
    )
    order = [
        "type", "namespace", "name", "purl", "version", "description",
        "primary_language", "homepage_url", "vcs_url", "owner",
        "download_url", "size", "sha1", "release_date",
    ]
    return dl.select(*order).unionByName(tar.select(*order)).unionByName(
        zipb.select(*order)
    ).unionByName(branches.select(*order))


# --------------------------------------------------------------- eclipse --

ECLIPSE_PROJECTS_SCHEMA = T.StructType(
    [
        T.StructField(
            "projects",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField("title", T.StringType()),
                        T.StructField(
                            "description",
                            T.ArrayType(
                                T.StructType([T.StructField("value", T.StringType())])
                            ),
                        ),
                        T.StructField(
                            "website_url",
                            T.ArrayType(
                                T.StructType([T.StructField("url", T.StringType())])
                            ),
                        ),
                        T.StructField(
                            "bugzilla",
                            T.ArrayType(
                                T.StructType(
                                    [T.StructField("query_url", T.StringType())]
                                )
                            ),
                        ),
                        T.StructField(
                            "licenses",
                            T.ArrayType(
                                T.StructType([T.StructField("name", T.StringType())])
                            ),
                        ),
                        T.StructField(
                            "download_url",
                            T.ArrayType(
                                T.StructType([T.StructField("url", T.StringType())])
                            ),
                        ),
                    ]
                ),
            ),
        )
    ]
)


def map_eclipse_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """Eclipse projects-JSON documents -> one catalog row per project
    download URL (eclipse.py:187-232): description falls back from
    descriptions[0].value to title; rows exist only for non-null
    download_url entries, like the reference's per-download yield."""
    j = F.from_json(F.col(json_col), ECLIPSE_PROJECTS_SCHEMA)
    proj = docs.select(F.explode(j["projects"]).alias("project", "m"))
    m = F.col("m")
    # F.get (not getItem): first-element access must be NULL on an empty
    # array, not an ANSI INVALID_ARRAY_INDEX error
    desc = F.coalesce(
        F.get(m["description"], 0)["value"],
        m["title"],
    )
    lic = F.when(
        F.size(m["licenses"]) > 0,
        F.array_join(F.transform(m["licenses"], lambda x: x["name"]), "; "),
    )
    rows = proj.select(
        F.col("project"),
        desc.alias("description"),
        F.get(m["website_url"], 0)["url"].alias("homepage_url"),
        F.get(m["bugzilla"], 0)["query_url"].alias("bug_tracking_url"),
        lic.alias("extracted_license_statement"),
        F.explode(m["download_url"]).alias("d"),
    ).where(F.col("d")["url"].isNotNull())
    return rows.select(
        F.lit("eclipse").alias("type"),
        F.col("project").alias("name"),
        F.concat(F.lit("pkg:eclipse/"), F.col("project")).alias("purl"),
        F.col("description"),
        F.col("homepage_url"),
        F.col("bug_tracking_url"),
        F.col("extracted_license_statement"),
        F.col("d")["url"].alias("download_url"),
        F.lit("eclipse_metadata").alias("datasource_id"),
    )


# ------------------------------------------------------------------- hex --

HEX_PAIR_SCHEMA = T.StructType(
    [
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("description", T.StringType()),
                    T.StructField("licenses", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        T.StructField(
            "owners",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("username", T.StringType()),
                        T.StructField("email", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("inserted_at", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField(
            "version_info",
            T.StructType(
                [
                    T.StructField("version", T.StringType()),
                    T.StructField("checksum", T.StringType()),
                    T.StructField("html_url", T.StringType()),
                ]
            ),
        ),
    ]
)


def map_hex_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """hex.pm package-metadata + release version_info pairs -> one
    catalog row per release (hex.py:20-59). The reference fetches each
    release URL driver-side and calls build_single_package per pair; the
    frontier emits one joined doc per pair here."""
    j = F.from_json(F.col(json_col), HEX_PAIR_SCHEMA)
    p = docs.select(j.alias("p")).select("p.*")
    v = F.col("version_info")
    name, ver = F.col("name"), v["version"]
    return p.select(
        F.lit("hex").alias("type"),
        name.alias("name"),
        ver.alias("version"),
        F.concat(F.lit("pkg:hex/"), name, F.lit("@"), ver).alias("purl"),
        F.col("meta")["description"].alias("description"),
        F.when(
            F.size(F.col("meta")["licenses"]) > 0,
            F.array_join(F.col("meta")["licenses"], "; "),
        ).alias("declared_license"),
        v["html_url"].alias("homepage_url"),
        F.concat(
            F.lit("https://repo.hex.pm/tarballs/"), name, F.lit("-"), ver, F.lit(".tar")
        ).alias("download_url"),
        v["checksum"].alias("sha256"),
        F.concat(
            F.lit("https://hex.pm/api/packages/"), name, F.lit("/releases/"), ver
        ).alias("api_data_url"),
        F.to_date(F.substring(F.col("inserted_at"), 1, 10)).alias("release_date"),
        # ALL owners become parties (hex.py:29-33), not just the first:
        # usernames and emails each joined in owner order
        F.array_join(
            F.transform(F.col("owners"), lambda o: o["username"]), "; "
        ).alias("owners"),
        F.array_join(
            F.filter(
                F.transform(F.col("owners"), lambda o: o["email"]),
                lambda e: e.isNotNull(),
            ),
            "; ",
        ).alias("owner_emails"),
        F.lit("hex_api_metadata").alias("datasource_id"),
    )


# ------------------------------------------------------------------- pub --

PUB_DOC_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField(
            "versions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("version", T.StringType()),
                        T.StructField(
                            "pubspec",
                            T.StructType(
                                [
                                    T.StructField("description", T.StringType()),
                                    T.StructField("homepage", T.StringType()),
                                    T.StructField("repository", T.StringType()),
                                    T.StructField("issue_tracker", T.StringType()),
                                    T.StructField("license", T.StringType()),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)


def map_pub_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """pub.dev all-versions documents -> one catalog row per version
    (pub.py:11-78): a pubspec license of 'unknown' (any case) is dropped;
    the download URL is the versioned pub.dev .tar.gz archive."""
    j = F.from_json(F.col(json_col), PUB_DOC_SCHEMA)
    rows = docs.select(
        j["name"].alias("name"), F.explode(j["versions"]).alias("v")
    )
    v = F.col("v")
    spec = v["pubspec"]
    name, ver = F.col("name"), v["version"]
    return rows.select(
        F.lit("pub").alias("type"),
        name.alias("name"),
        ver.alias("version"),
        F.concat(F.lit("pkg:pub/"), name, F.lit("@"), ver).alias("purl"),
        spec["description"].alias("description"),
        spec["homepage"].alias("homepage_url"),
        spec["repository"].alias("repository_homepage_url"),
        spec["issue_tracker"].alias("bug_tracking_url"),
        F.when(
            spec["license"].isNotNull() & (F.lower(spec["license"]) != "unknown"),
            spec["license"],
        ).alias("extracted_license_statement"),
        F.concat(
            F.lit("https://pub.dev/packages/"), name, F.lit("/versions/"), ver,
            F.lit(".tar.gz"),
        ).alias("download_url"),
        F.lit("pub_api_metadata").alias("datasource_id"),
    )
