"""Miner-mapper queries, batch 4: bitbucket / gitlab / github / eclipse /
hex / pub (sources/miners4.py). Same fixture strategy as q_miners,
q_miners2 and q_miners3 — real ecosystem-shaped JSON documents built with
column concat, mapped by the real mappers, expected rows computed directly
by the oracle from the generating index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query
from purldb_spark.sources.miners4 import (
    map_bitbucket_download_docs,
    map_bitbucket_repo_docs,
    map_eclipse_docs,
    map_github_docs,
    map_gitlab_docs,
    map_hex_docs,
    map_pub_docs,
)

_NAME_SQL = "lower(replace(p_brand, '#', '-')) || '-' || CAST(p_partkey AS VARCHAR)"
_VER_SQL = (
    "CAST(p_partkey % 9 AS VARCHAR) || '.' || CAST(p_partkey % 5 AS VARCHAR) || '.0'"
)

_BASE_SQL = f"""
  SELECT p_partkey AS k, {_NAME_SQL} AS name, {_VER_SQL} AS ver,
         'ns' || CAST(p_partkey % 7 AS VARCHAR) AS ns,
         CAST(p_size AS BIGINT) AS size, md5(p_name) AS cs
  FROM part
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        k.alias("k"),
        F.concat(
            F.lower(F.replace(F.col("p_brand"), F.lit("#"), F.lit("-"))),
            F.lit("-"),
            k.cast("string"),
        ).alias("name"),
        F.concat(
            (k % 9).cast("string"), F.lit("."), (k % 5).cast("string"), F.lit(".0")
        ).alias("ver"),
        F.concat(F.lit("ns"), (k % 7).cast("string")).alias("ns"),
        F.col("p_size").cast("long").alias("size"),
        F.md5("p_name").alias("cs"),
    )


_BB_COLS = [
    "type", "namespace", "name", "purl", "homepage_url", "code_view_url",
    "bug_tracking_url", "description", "vcs_url", "primary_language",
    "owner", "owner_url", "download_url", "size", "release_date",
]


@query(
    "x_bitbucket_gitlab_map",
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    bb AS (
      SELECT *,
             (CASE WHEN k % 2 = 1 THEN 'hg' ELSE 'git' END)
               || '+https://bitbucket.org/' || ns || '/' || name AS bb_url
      FROM base
    )
    SELECT 'bitbucket' AS type, ns AS namespace, name,
           'pkg:bitbucket/' || ns || '/' || name AS purl,
           CASE WHEN k % 3 = 0 THEN 'https://bb.ex/' || name
                ELSE bb_url END AS homepage_url,
           bb_url || '/src' AS code_view_url,
           CASE WHEN k % 3 = 0 THEN bb_url || '/issues' END AS bug_tracking_url,
           'Repo ' || name AS description,
           bb_url AS vcs_url,
           'python' AS primary_language,
           'u' || CAST(k % 5 AS VARCHAR) AS owner,
           'https://bitbucket.org/u' || CAST(k % 5 AS VARCHAR) AS owner_url,
           NULL AS download_url, CAST(NULL AS BIGINT) AS size,
           NULL AS release_date
    FROM bb
    UNION ALL
    SELECT 'bitbucket', ns, name, 'pkg:bitbucket/' || ns || '/' || name,
           NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
           'https://bitbucket.org/' || ns || '/' || name || '/downloads/f'
             || CAST(f.i AS VARCHAR) || '.zip',
           CASE WHEN f.i = 1 THEN size ELSE size + 5 END,
           NULL
    FROM bb, (SELECT unnest(range(1, 3)) AS i) f
    UNION ALL
    SELECT 'gitlab', NULL, 'My ' || name, 'pkg:gitlab/' || name,
           'https://gitlab.com/grp/' || name,
           CASE WHEN k % 4 <> 0
                THEN 'git+https://gitlab.com/grp/' || name || '.git' END,
           NULL, 'GL ' || name,
           CASE WHEN k % 4 <> 0
                THEN 'git+https://gitlab.com/grp/' || name || '.git' END,
           NULL, NULL, NULL, NULL, NULL, '2023-04-05'
    FROM bb
    """,
)
def x_bitbucket_gitlab_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitbucket repo-template + downloads mapping (bitbucket.py:200-301)
    and GitLab projects mapping (gitlab.py:88-141): scm-default git, website
    fallback to the bb_url, has_issues-gated bug tracker, one row per
    downloads value, and the gitlab purl name taken from the web_url slug
    (NOT the display name)."""
    b = _base(spark, sf_dir)
    k, name, ns = F.col("k"), F.col("name"), F.col("ns")

    scm = F.when(k % 2 == 1, F.lit('"scm":"hg",')).otherwise(F.lit(""))
    website = F.when(
        k % 3 == 0, F.concat(F.lit('"website":"https://bb.ex/'), name, F.lit('",'))
    ).otherwise(F.lit(""))
    issues = F.when(k % 3 == 0, F.lit("true")).otherwise(F.lit("false"))
    repo_doc = F.concat(
        F.lit('{"full_name":"'), ns, F.lit("/"), name, F.lit('",'),
        scm, website,
        F.lit('"description":"Repo '), name, F.lit('",'),
        F.lit('"language":"python","has_issues":'), issues, F.lit(","),
        F.lit('"owner":{"username":"u'), (k % 5).cast("string"),
        F.lit('","links":{"html":{"href":"https://bitbucket.org/u'),
        (k % 5).cast("string"), F.lit('"}}}}'),
    )
    repo = map_bitbucket_repo_docs(b.select(repo_doc.alias("doc"))).select(
        "type", "namespace", "name", "purl", "homepage_url", "code_view_url",
        "bug_tracking_url", "description", "vcs_url", "primary_language",
        "owner", "owner_url",
        F.lit(None).cast("string").alias("download_url"),
        F.lit(None).cast("long").alias("size"),
        F.lit(None).cast("string").alias("release_date"),
    )

    dl_href = F.concat(
        F.lit("https://bitbucket.org/"), ns, F.lit("/"), name, F.lit("/downloads/f")
    )
    dl_doc = F.concat(
        F.lit('{"values":[{"name":"f1.zip","size":'), F.col("size").cast("string"),
        F.lit(',"links":{"self":{"href":"'), dl_href, F.lit('1.zip"}}},'),
        F.lit('{"name":"f2.zip","size":'), (F.col("size") + 5).cast("string"),
        F.lit(',"links":{"self":{"href":"'), dl_href, F.lit('2.zip"}}}]}'),
    )
    dl_purl = F.concat(F.lit("pkg:bitbucket/"), ns, F.lit("/"), name)
    dls = map_bitbucket_download_docs(
        b.select(dl_doc.alias("doc"), dl_purl.alias("package_url"))
    ).select(
        "type", "namespace", "name", "purl",
        F.lit(None).cast("string").alias("homepage_url"),
        F.lit(None).cast("string").alias("code_view_url"),
        F.lit(None).cast("string").alias("bug_tracking_url"),
        F.lit(None).cast("string").alias("description"),
        F.lit(None).cast("string").alias("vcs_url"),
        F.lit(None).cast("string").alias("primary_language"),
        F.lit(None).cast("string").alias("owner"),
        F.lit(None).cast("string").alias("owner_url"),
        "download_url", "size",
        F.lit(None).cast("string").alias("release_date"),
    )

    repo_url = F.when(
        k % 4 != 0, F.concat(F.lit('"http_url_to_repo":"https://gitlab.com/grp/'),
                             name, F.lit('.git",')),
    ).otherwise(F.lit(""))
    gl_doc = F.concat(
        F.lit('{"name":"My '), name, F.lit('",'),
        F.lit('"web_url":"https://gitlab.com/grp/'), name, F.lit('",'),
        repo_url,
        F.lit('"description":"GL '), name, F.lit('",'),
        F.lit('"created_at":"2023-04-05T06:07:08.000Z"}'),
    )
    gl = map_gitlab_docs(b.select(gl_doc.alias("doc"))).select(
        "type",
        F.lit(None).cast("string").alias("namespace"),
        "name", "purl", "homepage_url", "code_view_url",
        F.lit(None).cast("string").alias("bug_tracking_url"),
        "description", "vcs_url",
        F.lit(None).cast("string").alias("primary_language"),
        F.lit(None).cast("string").alias("owner"),
        F.lit(None).cast("string").alias("owner_url"),
        F.lit(None).cast("string").alias("download_url"),
        F.lit(None).cast("long").alias("size"),
        F.col("release_date").cast("string").alias("release_date"),
    )
    return (
        repo.select(*_BB_COLS)
        .unionByName(dls.select(*_BB_COLS))
        .unionByName(gl.select(*_BB_COLS))
    )


@query(
    "x_github_map",
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    gh AS (
      SELECT *, 'https://github.com/' || ns || '/' || name AS hurl,
             'git+git://github.com/' || ns || '/' || name || '.git' AS vcs,
             'GH ' || name AS descr, 'u' || CAST(k % 5 AS VARCHAR) AS owner,
             'pkg:github/' || ns || '/' || name AS purl0
      FROM base
    )
    SELECT 'github' AS type, ns AS namespace, name, purl0 AS purl,
           NULL AS version, descr AS description, 'go' AS primary_language,
           hurl AS homepage_url, vcs AS vcs_url, owner,
           hurl || '/releases/d1' AS download_url,
           size + 1 AS size, NULL AS sha1, '2023-01-02' AS release_date
    FROM gh WHERE k % 2 = 0
    UNION ALL
    -- tag rows inherit the last download's size/date when the repo has
    -- downloads (the reference's evolve carry-over, github.py:254-296)
    SELECT 'github', ns, name, purl0 || '@v' || ver, 'v' || ver, descr, 'go',
           hurl, vcs, owner, hurl || '/tarball/v' || ver,
           CASE WHEN k % 2 = 0 THEN size + 1 ELSE size END, cs,
           CASE WHEN k % 2 = 0 THEN '2023-01-02' END
    FROM gh WHERE k % 3 <> 0
    UNION ALL
    SELECT 'github', ns, name, purl0 || '@v' || ver, 'v' || ver, descr, 'go',
           hurl, vcs, owner, hurl || '/zipball/v' || ver,
           CASE WHEN k % 2 = 0 THEN size + 1 ELSE size END, cs,
           CASE WHEN k % 2 = 0 THEN '2023-01-02' END
    FROM gh WHERE k % 3 <> 0
    UNION ALL
    SELECT 'github', ns, name, purl0, NULL, descr, 'go', hurl, vcs, owner,
           hurl || '/archive/master.zip', size, NULL, NULL
    FROM gh WHERE k % 2 = 1 AND k % 3 = 0
    """,
)
def x_github_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GitHub repo mapping (github.py:221-294): per-download rows, tag
    tarball+zipball rows with versioned purls and commit sha1, and the
    branch-archive fallback rows for repos with neither tags nor downloads
    (the visitor populates branches_download_urls only then,
    github.py:84-195)."""
    b = _base(spark, sf_dir)
    k, name, ns, ver, cs = (
        F.col("k"), F.col("name"), F.col("ns"), F.col("ver"), F.col("cs")
    )
    hurl = F.concat(F.lit("https://github.com/"), ns, F.lit("/"), name)
    downloads = F.when(
        k % 2 == 0,
        F.concat(
            F.lit('[{"html_url":"'), hurl,
            F.lit('/releases/d1","size":'), (F.col("size") + 1).cast("string"),
            F.lit(',"created_at":"2023-01-02T03:04:05Z"}]'),
        ),
    ).otherwise(F.lit("[]"))
    tags = F.when(
        k % 3 != 0,
        F.concat(
            F.lit('[{"name":"v'), ver,
            F.lit('","tarball_url":"'), hurl, F.lit("/tarball/v"), ver,
            F.lit('","zipball_url":"'), hurl, F.lit("/zipball/v"), ver,
            F.lit('","sha1":"'), cs, F.lit('"}]'),
        ),
    ).otherwise(F.lit("[]"))
    branches = F.when(
        (k % 2 == 1) & (k % 3 == 0),
        F.concat(F.lit('["'), hurl, F.lit('/archive/master.zip"]')),
    ).otherwise(F.lit("[]"))
    doc = F.concat(
        F.lit('{"full_name":"'), ns, F.lit("/"), name, F.lit('",'),
        F.lit('"name":"'), name, F.lit('",'),
        F.lit('"description":"GH '), name, F.lit('",'),
        F.lit('"language":"go",'),
        F.lit('"html_url":"'), hurl, F.lit('",'),
        F.lit('"git_url":"git://github.com/'), ns, F.lit("/"), name, F.lit('.git",'),
        F.lit('"size":'), F.col("size").cast("string"), F.lit(","),
        F.lit('"owner":"u'), (k % 5).cast("string"), F.lit('",'),
        F.lit('"downloads":'), downloads, F.lit(","),
        F.lit('"tags":'), tags, F.lit(","),
        F.lit('"branches_download_urls":'), branches, F.lit("}"),
    )
    return map_github_docs(b.select(doc.alias("doc"))).withColumn(
        "release_date", F.col("release_date").cast("string")
    )


_EHP_COLS = [
    "type", "name", "version", "purl", "description", "homepage_url",
    "bug_tracking_url", "licenses", "download_url", "sha256",
    "api_data_url", "release_date", "owners", "owner_emails",
    "repository_homepage_url",
]


@query(
    "x_eclipse_hex_pub_map",
    oracle=f"""
    WITH base AS ({_BASE_SQL})
    SELECT 'eclipse' AS type, name, NULL AS version,
           'pkg:eclipse/' || name AS purl,
           CASE WHEN k % 2 = 0 THEN 'Desc ' || name ELSE 'T ' || name END
             AS description,
           'https://ecl.ex/' || name AS homepage_url,
           'https://bugs.ex/' || name AS bug_tracking_url,
           'EPL-2.0; Apache-2.0' AS licenses,
           'https://dl.ecl.ex/' || name || '-' || CAST(f.i AS VARCHAR) || '.zip'
             AS download_url,
           NULL AS sha256, NULL AS api_data_url, NULL AS release_date,
           NULL AS owners, NULL AS owner_emails, NULL AS repository_homepage_url
    FROM base, (SELECT unnest(range(1, 3)) AS i) f
    WHERE f.i = 1 OR k % 3 = 0
    UNION ALL
    SELECT 'hex', name, ver, 'pkg:hex/' || name || '@' || ver,
           'Hex ' || name, 'https://hex.pm/packages/' || name, NULL,
           'MIT; Apache-2.0',
           'https://repo.hex.pm/tarballs/' || name || '-' || ver || '.tar',
           cs, 'https://hex.pm/api/packages/' || name || '/releases/' || ver,
           '2022-03-04',
           CASE WHEN k % 2 = 0 THEN 'o1; o2' ELSE 'o1' END,
           'o1@ex.dev', NULL
    FROM base
    UNION ALL
    SELECT 'pub', name, ver, 'pkg:pub/' || name || '@' || ver,
           'P ' || name, 'https://pub.ex/' || name,
           'https://github.com/ex/' || name || '/issues',
           'BSD-3-Clause',
           'https://pub.dev/packages/' || name || '/versions/' || ver || '.tar.gz',
           NULL, NULL, NULL, NULL, NULL, 'https://github.com/ex/' || name
    FROM base
    UNION ALL
    SELECT 'pub', name, '0.0.1', 'pkg:pub/' || name || '@0.0.1',
           NULL, NULL, NULL, NULL,
           'https://pub.dev/packages/' || name || '/versions/0.0.1.tar.gz',
           NULL, NULL, NULL, NULL, NULL, NULL
    FROM base
    """,
)
def x_eclipse_hex_pub_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eclipse projects-JSON mapping (eclipse.py:187-232: description
    fallback to title, one row per download URL), hex.pm release mapping
    (hex.py:20-59: all owners as parties, checksum sha256, repo.hex.pm
    tarball), and pub.dev versions mapping (pub.py:11-78: per-version
    pubspec rows, case-insensitive 'unknown' license dropped)."""
    b = _base(spark, sf_dir)
    k, name, ver, cs = F.col("k"), F.col("name"), F.col("ver"), F.col("cs")

    desc_arr = F.when(
        k % 2 == 0, F.concat(F.lit('[{"value":"Desc '), name, F.lit('"}]'))
    ).otherwise(F.lit("[]"))
    dl2 = F.when(
        k % 3 == 0,
        F.concat(F.lit(',{"url":"https://dl.ecl.ex/'), name, F.lit('-2.zip"}')),
    ).otherwise(F.lit(""))
    ecl_doc = F.concat(
        F.lit('{"projects":{"'), name, F.lit('":{'),
        F.lit('"title":"T '), name, F.lit('",'),
        F.lit('"description":'), desc_arr, F.lit(","),
        F.lit('"website_url":[{"url":"https://ecl.ex/'), name, F.lit('"}],'),
        F.lit('"bugzilla":[{"query_url":"https://bugs.ex/'), name, F.lit('"}],'),
        F.lit('"licenses":[{"name":"EPL-2.0"},{"name":"Apache-2.0"}],'),
        F.lit('"download_url":[{"url":"https://dl.ecl.ex/'), name, F.lit('-1.zip"}'),
        dl2, F.lit("]}}}"),
    )
    ecl = map_eclipse_docs(b.select(ecl_doc.alias("doc"))).select(
        "type", "name",
        F.lit(None).cast("string").alias("version"),
        "purl", "description", "homepage_url", "bug_tracking_url",
        F.col("extracted_license_statement").alias("licenses"),
        "download_url",
        F.lit(None).cast("string").alias("sha256"),
        F.lit(None).cast("string").alias("api_data_url"),
        F.lit(None).cast("string").alias("release_date"),
        F.lit(None).cast("string").alias("owners"),
        F.lit(None).cast("string").alias("owner_emails"),
        F.lit(None).cast("string").alias("repository_homepage_url"),
    )

    o2 = F.when(k % 2 == 0, F.lit(',{"username":"o2"}')).otherwise(F.lit(""))
    hex_doc = F.concat(
        F.lit('{"meta":{"description":"Hex '), name,
        F.lit('","licenses":["MIT","Apache-2.0"]},'),
        F.lit('"owners":[{"username":"o1","email":"o1@ex.dev"}'), o2, F.lit("],"),
        F.lit('"inserted_at":"2022-03-04T05:06:07Z",'),
        F.lit('"name":"'), name, F.lit('",'),
        F.lit('"version_info":{"version":"'), ver,
        F.lit('","checksum":"'), cs,
        F.lit('","html_url":"https://hex.pm/packages/'), name, F.lit('"}}'),
    )
    hx = map_hex_docs(b.select(hex_doc.alias("doc"))).select(
        "type", "name", "version", "purl", "description",
        "homepage_url",
        F.lit(None).cast("string").alias("bug_tracking_url"),
        F.col("declared_license").alias("licenses"),
        "download_url", "sha256", "api_data_url",
        F.col("release_date").cast("string").alias("release_date"),
        "owners", "owner_emails",
        F.lit(None).cast("string").alias("repository_homepage_url"),
    )

    pub_doc = F.concat(
        F.lit('{"name":"'), name, F.lit('","versions":['),
        F.lit('{"version":"'), ver, F.lit('","pubspec":{'),
        F.lit('"description":"P '), name, F.lit('",'),
        F.lit('"homepage":"https://pub.ex/'), name, F.lit('",'),
        F.lit('"repository":"https://github.com/ex/'), name, F.lit('",'),
        F.lit('"issue_tracker":"https://github.com/ex/'), name, F.lit('/issues",'),
        F.lit('"license":"BSD-3-Clause"}},'),
        F.lit('{"version":"0.0.1","pubspec":{"license":"UNKNOWN"}}]}'),
    )
    pub = map_pub_docs(b.select(pub_doc.alias("doc"))).select(
        "type", "name", "version", "purl", "description", "homepage_url",
        "bug_tracking_url",
        F.col("extracted_license_statement").alias("licenses"),
        "download_url",
        F.lit(None).cast("string").alias("sha256"),
        F.lit(None).cast("string").alias("api_data_url"),
        F.lit(None).cast("string").alias("release_date"),
        F.lit(None).cast("string").alias("owners"),
        F.lit(None).cast("string").alias("owner_emails"),
        "repository_homepage_url",
    )
    return (
        ecl.select(*_EHP_COLS)
        .unionByName(hx.select(*_EHP_COLS))
        .unionByName(pub.select(*_EHP_COLS))
    )
