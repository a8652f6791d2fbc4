"""Per-ecosystem miner mappers, batch 7: cpan (metacpan release-search
JSON + .meta files) and apache (projects.apache.org JSON, podlings, dist
download URLs). Same design as sources/miners*.py — fetching stays on
the rate-limited frontier; the mapping from fetched documents to catalog
rows is pure column expressions (from_json + explode + projection,
whole-stage codegen, no Python UDFs):

- cpan release search (minecode/miners/cpan.py:211-296
  build_packages_from_release_json): hits.hits[]._source exploded, blank
  license entries dropped, resources.license URLs appended to the
  statement list, repository url kept as vcs_url with a "git+" prefix
  ONLY when ".git" appears in it (get_vcs_repo1, cpan.py:299-310 — a
  bare url otherwise), bugtracker.web, author party; nameless releases
  dropped.
- cpan .meta file (cpan.py:325-395 build_packages_from_metafile): the
  JSON form (the reference also accepts legacy YAML metas via saneyaml —
  a driver-side codec; metas here arrive as JSON), string-or-list
  license, description defaulting to the name, download_url =
  meta url with ".meta" -> ".tar.gz", vcs only for "git:"-prefixed
  repository urls (get_vcs_repo, cpan.py:396-404 — null otherwise,
  unlike the release mapper), "Name <email>" author split.
- apache projects (minecode/miners/apache.py:389-477
  build_packages_from_projects): map of project name -> metadata
  exploded, short+long description join, first repository entry as
  code_view_url, maintainer parties with mailto: stripped, license URL
  kept verbatim as the statement plus declared "apache-2.0" when the URL
  is a known ASL-2.0 form (APACHE_LICENSE_URL, apache.py:362-372),
  comma-split category keywords, one row per release (version =
  revision, release_date only for 10-char created values) or a single
  versionless row.
- apache podlings (apache.py:493-509): name + description + homepage,
  type "apache-podling".
- apache dist downloads (apache.py:513-591): checksum-file URIs fold
  into their archive's row (the ".sha256/.sha512/.md5/.sha/.sha1"
  extension picks the download_<type> column the file content fills);
  version comes from the first all-numeric dash segment of the base name
  joined with every later segment (get_name_version, apache.py:559-592
  — whose name accumulation is dead code: the except ValueError branch
  never fires since str.isdigit doesn't raise, so the name always falls
  back to the purl's, apache.py:541-545).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------------ cpan --

CPAN_RELEASE_SCHEMA = T.StructType(
    [
        T.StructField(
            "hits",
            T.StructType(
                [
                    T.StructField(
                        "hits",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "_source",
                                        T.StructType(
                                            [
                                                T.StructField("name", T.StringType()),
                                                T.StructField(
                                                    "abstract", T.StringType()
                                                ),
                                                T.StructField(
                                                    "version", T.StringType()
                                                ),
                                                T.StructField(
                                                    "download_url", T.StringType()
                                                ),
                                                T.StructField(
                                                    "license",
                                                    T.ArrayType(T.StringType()),
                                                ),
                                                T.StructField("date", T.StringType()),
                                                T.StructField(
                                                    "author", T.StringType()
                                                ),
                                                T.StructField(
                                                    "resources",
                                                    T.StructType(
                                                        [
                                                            T.StructField(
                                                                "homepage",
                                                                T.StringType(),
                                                            ),
                                                            T.StructField(
                                                                "license",
                                                                T.ArrayType(
                                                                    T.StringType()
                                                                ),
                                                            ),
                                                            T.StructField(
                                                                "bugtracker",
                                                                T.StructType(
                                                                    [
                                                                        T.StructField(
                                                                            "web",
                                                                            T.StringType(),
                                                                        )
                                                                    ]
                                                                ),
                                                            ),
                                                            T.StructField(
                                                                "repository",
                                                                T.StructType(
                                                                    [
                                                                        T.StructField(
                                                                            "url",
                                                                            T.StringType(),
                                                                        )
                                                                    ]
                                                                ),
                                                            ),
                                                        ]
                                                    ),
                                                ),
                                            ]
                                        ),
                                    )
                                ]
                            )
                        ),
                    )
                ]
            ),
        )
    ]
)


def _clean_list(arr: Column) -> Column:
    return F.filter(arr, lambda x: x.isNotNull() & (F.trim(x) != ""))


def map_cpan_release_docs(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """metacpan release-search JSON -> one catalog row per hit
    (cpan.py:211-296)."""
    j = F.from_json(F.col(json_col), CPAN_RELEASE_SCHEMA)
    rel = docs.select(
        F.explode(j["hits"]["hits"]).alias("h")
    ).select(F.col("h")["_source"].alias("r"))
    r = F.col("r")
    res = r["resources"]
    name, ver = r["name"], r["version"]
    lic = F.concat(
        _clean_list(F.coalesce(r["license"], F.array().cast("array<string>"))),
        _clean_list(
            F.coalesce(res["license"], F.array().cast("array<string>"))
        ),
    )
    repo_url = res["repository"]["url"]
    vcs = F.when(
        repo_url.isNotNull() & repo_url.contains(".git"),
        F.concat(F.lit("git+"), repo_url),
    ).otherwise(repo_url)
    return rel.filter(name.isNotNull()).select(
        F.lit("cpan").alias("type"),
        name.alias("name"),
        ver.alias("version"),
        F.concat_ws("@", F.concat(F.lit("pkg:cpan/"), name), ver).alias("purl"),
        r["abstract"].alias("description"),
        r["download_url"].alias("download_url"),
        F.when(F.size(lic) > 0, F.array_join(lic, "; ")).alias(
            "extracted_license_statement"
        ),
        r["date"].alias("release_date"),
        res["homepage"].alias("homepage_url"),
        vcs.alias("vcs_url"),
        res["bugtracker"]["web"].alias("bug_tracking_url"),
        r["author"].alias("parties"),
        F.lit("cpan_release_json").alias("datasource_id"),
    )


CPAN_META_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("abstract", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField("author", T.ArrayType(T.StringType())),
        T.StructField(
            "resources",
            T.StructType(
                [
                    T.StructField(
                        "repository",
                        T.StructType([T.StructField("url", T.StringType())]),
                    )
                ]
            ),
        ),
    ]
)
_CPAN_LIC_LIST = T.StructType(
    [T.StructField("license", T.ArrayType(T.StringType()))]
)
_CPAN_LIC_STR = T.StructType([T.StructField("license", T.StringType())])
# resources.repository is dict-or-string in old metas (cpan.py:399-401)
_CPAN_REPO_STR = T.StructType(
    [
        T.StructField(
            "resources",
            T.StructType([T.StructField("repository", T.StringType())]),
        )
    ]
)


def map_cpan_meta_docs(
    docs: DataFrame, json_col: str = "doc", uri_col: str = "uri"
) -> DataFrame:
    """cpan .meta JSON -> catalog rows (cpan.py:325-395)."""
    raw = F.col(json_col)
    j = F.from_json(raw, CPAN_META_SCHEMA)
    lic_list = F.from_json(raw, _CPAN_LIC_LIST)["license"]
    lic_str = F.from_json(raw, _CPAN_LIC_STR)["license"]
    repo_str = F.from_json(raw, _CPAN_REPO_STR)["resources"]["repository"]
    p = docs.select(
        j.alias("p"),
        F.coalesce(
            F.when(lic_list.isNotNull(), F.array_join(lic_list, "; ")), lic_str
        ).alias("_lic"),
        F.coalesce(j["resources"]["repository"]["url"], repo_str).alias("_repo"),
        F.col(uri_col).alias("_uri"),
    ).select("p.*", "_lic", "_repo", "_uri")
    name = F.col("name")
    vcs = F.when(
        F.col("_repo").startswith("git:"), F.concat(F.lit("git+"), F.col("_repo"))
    )
    authors = F.col("author")
    party_names = F.transform(
        authors, lambda a: F.rtrim(F.substring_index(a, "<", 1))
    )
    party_emails = F.filter(
        F.transform(
            authors,
            lambda a: F.when(
                F.instr(a, "<") > 0,
                F.rtrim(F.regexp_extract(a, "<([^>]*)>?", 1)),
            ),
        ),
        lambda e: e.isNotNull(),
    )
    return p.filter(name.isNotNull()).select(
        F.lit("cpan").alias("type"),
        name.alias("name"),
        F.col("version"),
        F.concat_ws("@", F.concat(F.lit("pkg:cpan/"), name), F.col("version")).alias(
            "purl"
        ),
        F.coalesce(F.col("abstract"), name).alias("description"),
        F.when(
            F.col("_uri").isNotNull(),
            F.replace(F.col("_uri"), F.lit(".meta"), F.lit(".tar.gz")),
        ).alias("download_url"),
        F.col("_lic").alias("extracted_license_statement"),
        vcs.alias("vcs_url"),
        F.when(
            F.col("keywords").isNotNull(), F.array_join(F.col("keywords"), "; ")
        ).alias("keywords"),
        F.when(
            authors.isNotNull(), F.array_join(party_names, "; ")
        ).alias("parties"),
        F.when(
            authors.isNotNull(), F.array_join(party_emails, "; ")
        ).alias("party_emails"),
        F.lit("cpan_meta_json").alias("datasource_id"),
    )


# ---------------------------------------------------------------- apache --

#: known ASL-2.0 license URL forms (apache.py:362-372)
APACHE_LICENSE_URLS = (
    "http://usefulinc.com/doap/licenses/asl20",
    "https://usefulinc.com/doap/licenses/asl20",
    "http://spdx.org/licenses/Apache-2.0",
    "https://spdx.org/licenses/Apache-2.0",
    "http://www.apache.org/licenses/LICENSE-2.0",
    "https://www.apache.org/licenses/LICENSE-2.0",
)

APACHE_PROJECT_SCHEMA = T.MapType(
    T.StringType(),
    T.StructType(
        [
            T.StructField("shortdesc", T.StringType()),
            T.StructField("description", T.StringType()),
            T.StructField("homepage", T.StringType()),
            T.StructField("bug-database", T.StringType()),
            T.StructField("programming-language", T.StringType()),
            T.StructField("download-page", T.StringType()),
            T.StructField("license", T.StringType()),
            T.StructField("category", T.StringType()),
            T.StructField("repository", T.ArrayType(T.StringType())),
            T.StructField(
                "maintainer",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("name", T.StringType()),
                            T.StructField("mbox", T.StringType()),
                        ]
                    )
                ),
            ),
            T.StructField(
                "release",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("revision", T.StringType()),
                            T.StructField("created", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    ),
)


def map_apache_projects(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """projects.apache.org projects JSON -> one row per (project,
    release), or a versionless row for release-less projects
    (apache.py:389-477)."""
    j = F.from_json(F.col(json_col), APACHE_PROJECT_SCHEMA)
    proj = docs.select(F.explode(j).alias("pname", "m"))
    m = F.col("m")
    desc = F.array_join(
        F.filter(
            F.array(m["shortdesc"], m["description"]),
            lambda d: d.isNotNull() & (F.trim(d) != ""),
        ),
        "\n",
    )
    maint = m["maintainer"]
    parties = F.when(
        maint.isNotNull(),
        F.array_join(F.transform(maint, lambda p: p["name"]), "; "),
    )
    party_emails = F.when(
        maint.isNotNull(),
        F.array_join(
            F.transform(
                maint,
                lambda p: F.replace(
                    F.coalesce(p["mbox"], F.lit("")), F.lit("mailto:"), F.lit("")
                ),
            ),
            "; ",
        ),
    )
    declared = F.when(
        m["license"].isin(*APACHE_LICENSE_URLS), F.lit("apache-2.0")
    )
    keywords = F.when(
        m["category"].isNotNull(),
        F.array_join(
            F.filter(
                F.transform(F.split(m["category"], ","), lambda kw: F.trim(kw)),
                lambda kw: kw != "",
            ),
            "; ",
        ),
    )
    out = proj.select(
        F.lit("apache").alias("type"),
        F.col("pname").alias("name"),
        F.nullif(desc, F.lit("")).alias("description"),
        m["homepage"].alias("homepage_url"),
        m["bug-database"].alias("bug_tracking_url"),
        m["programming-language"].alias("primary_language"),
        m["download-page"].alias("download_url"),
        F.element_at(m["repository"], 1).alias("code_view_url"),
        m["license"].alias("extracted_license_statement"),
        declared.alias("declared_license_expression"),
        keywords.alias("keywords"),
        parties.alias("parties"),
        party_emails.alias("party_emails"),
        F.explode_outer(m["release"]).alias("rel"),
        F.lit("apache_json").alias("datasource_id"),
    )
    rel = F.col("rel")
    return out.select(
        *[c for c in out.columns if c != "rel"],
        rel["revision"].alias("version"),
        F.when(F.length(rel["created"]) == 10, rel["created"]).alias(
            "release_date"
        ),
    )


def map_apache_podlings(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """Podling metadata -> name/description/homepage rows, type
    apache-podling (apache.py:493-509); nameless docs dropped."""
    j = F.from_json(
        F.col(json_col),
        T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("description", T.StringType()),
                T.StructField("homepage", T.StringType()),
            ]
        ),
    )
    name = j["name"]
    return docs.filter(name.isNotNull()).select(
        F.lit("apache-podling").alias("type"),
        name.alias("name"),
        F.concat(F.lit("pkg:apache-podling/"), name).alias("purl"),
        j["description"].alias("description"),
        j["homepage"].alias("homepage_url"),
    )


_CKSUM_RX = r"\.(sha256|sha512|md5|sha|sha1)$"


def apache_version_from_base(base: Column) -> Column:
    """First all-numeric dash segment joined with every later segment
    (get_name_version, apache.py:559-592)."""
    state = F.aggregate(
        F.split(base, "-"),
        F.struct(F.lit(None).cast("string").alias("v")),
        lambda acc, s: F.when(
            acc["v"].isNotNull(),
            F.struct(F.concat_ws("-", acc["v"], s).alias("v")),
        ).otherwise(
            F.when(
                s.rlike(r"^[0-9]+(\.[0-9]+)*$"), F.struct(s.alias("v"))
            ).otherwise(acc)
        ),
    )
    return state["v"]


def map_apache_downloads(
    docs: DataFrame,
    uri_col: str = "uri",
    purl_col: str = "package_url",
    data_col: str = "data",
) -> DataFrame:
    """Apache dist download / checksum URIs -> one row per ARCHIVE with
    the checksum columns folded in (apache.py:513-555). Checksum rows
    group onto their archive URI — a per-archive pivot aggregation, the
    set shape of the reference's per-URI branch; the name always comes
    from the purl (the reference's path-derived name is dead code — see
    module docstring)."""
    uri = F.col(uri_col)
    cktype = F.regexp_extract(uri, _CKSUM_RX, 1)
    rows = docs.select(
        F.regexp_replace(uri, _CKSUM_RX, "").alias("archive_uri"),
        F.nullif(cktype, F.lit("")).alias("cktype"),
        F.when(F.nullif(cktype, F.lit("")).isNotNull(), F.trim(F.col(data_col))).alias(
            "ckval"
        ),
        F.col(purl_col).alias("package_url"),
    )
    pivoted = rows.groupBy("archive_uri").agg(
        F.max("package_url").alias("package_url"),
        *[
            F.max(
                F.when(F.col("cktype") == t, F.nullif(F.col("ckval"), F.lit("")))
            ).alias(f"download_{t}")
            for t in ("sha256", "sha512", "md5", "sha", "sha1")
        ],
    )
    fname = F.substring_index(F.col("archive_uri"), "/", -1)
    base = F.regexp_replace(fname, r"(\.tar)?\.[^.]+$", "")
    purl_name = F.nullif(
        F.regexp_extract(F.col("package_url"), r"^pkg:[^/@]+/(?:[^/@]+/)?([^/@?]+)", 1),
        F.lit(""),
    )
    purl_ns = F.nullif(
        F.regexp_extract(F.col("package_url"), r"^pkg:[^/@]+/([^/@]+)/[^/@]+", 1),
        F.lit(""),
    )
    return pivoted.select(
        F.lit("apache").alias("type"),
        purl_ns.alias("namespace"),
        purl_name.alias("name"),
        apache_version_from_base(base).alias("version"),
        F.col("archive_uri").alias("download_url"),
        F.col("package_url").alias("purl"),
        *[F.col(f"download_{t}") for t in ("sha256", "sha512", "md5", "sha", "sha1")],
    )
