"""Miner-mapper queries, batch 7: cpan / apache (sources/miners7.py).
Same fixture strategy as earlier batches — ecosystem-shaped documents
built with column concat, mapped by the real parsers, expected rows
computed directly by the oracle from the generating index.

The apache downloads fixture uses a dash-free project slug
(replace(name, '-', '_')) so the version-segment scan matches on the
intended numeric segment — the reference algorithm (and ours) would
otherwise latch onto the numeric dash segments inside the synthetic
part-derived names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query
from purldb_spark.sources.miners7 import (
    map_apache_downloads,
    map_apache_podlings,
    map_apache_projects,
    map_cpan_meta_docs,
    map_cpan_release_docs,
)

_NAME_SQL = "lower(replace(p_brand, '#', '-')) || '-' || CAST(p_partkey AS VARCHAR)"
_VER_SQL = (
    "CAST(p_partkey % 9 AS VARCHAR) || '.' || CAST(p_partkey % 5 AS VARCHAR) || '.0'"
)

_BASE_SQL = f"""
  SELECT p_partkey AS k, {_NAME_SQL} AS name, {_VER_SQL} AS ver,
         md5(p_name) AS cs, 'ff' || substring(md5(p_name), 3) AS cs2
  FROM part
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    cs = F.md5("p_name")
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
        cs.alias("cs"),
        F.concat(F.lit("ff"), F.substring(cs, 3, 32)).alias("cs2"),
    )


@query(
    "x_cpan_map",
    oracle=f"""
    WITH base AS ({_BASE_SQL})
    SELECT 'cpan' AS type, name, ver AS version,
           'pkg:cpan/' || name || '@' || ver AS purl,
           'Perl ' || name AS description,
           'https://cpan.metacpan.org/authors/' || name || '-' || ver
             || '.tar.gz' AS download_url,
           nullif(concat_ws('; ',
             CASE WHEN k % 3 = 0 THEN 'perl_5'
                  WHEN k % 3 = 1 THEN 'perl_5; mit' END,
             CASE WHEN k % 2 = 0 THEN 'http://dev.perl.org/licenses/' END
           ), '') AS extracted_license_statement,
           '2014-04-20T21:30:13' AS release_date,
           CASE WHEN k % 2 = 0 THEN 'http://' || name || '.ex' END
             AS homepage_url,
           CASE WHEN k % 3 = 0 THEN 'git+git://github.com/ex/' || name || '.git'
                WHEN k % 3 = 1 THEN 'https://svn.ex/' || name END AS vcs_url,
           CASE WHEN k % 3 = 0 THEN 'https://rt.cpan.org/' || name END
             AS bug_tracking_url,
           NULL AS keywords,
           'A-' || name AS parties,
           NULL AS party_emails,
           'cpan_release_json' AS datasource_id
    FROM base
    UNION ALL
    SELECT 'cpan', name, ver, 'pkg:cpan/' || name || '@' || ver,
           CASE WHEN k % 4 = 0 THEN name ELSE 'Meta ' || name END,
           'http://www.cpan.org/authors/id/' || name || '-' || ver
             || '.tar.gz',
           CASE WHEN k % 2 = 0 THEN 'perl_5' ELSE 'mit' END,
           NULL, NULL,
           CASE WHEN k % 3 = 0 THEN 'git+git://g.ex/' || name
                WHEN k % 3 = 1 THEN 'git+git://s.ex/' || name END,
           NULL,
           CASE WHEN k % 3 = 0 THEN 'k1' END,
           'Ann; Solo', 'a@ex.dev', 'cpan_meta_json'
    FROM base
    """,
)
def x_cpan_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """metacpan release-search mapping (cpan.py:211-296): blank licenses
    dropped, resources.license URLs appended, ".git"-gated git+ vcs
    prefix, nameless hits dropped; .meta mapping (cpan.py:325-395):
    string-vs-list license, dict-vs-string repository, "git:"-only vcs,
    description defaulting to the name, author name/email split."""
    b = _base(spark, sf_dir)
    k, name, ver = F.col("k"), F.col("name"), F.col("ver")

    rel_lic = (
        F.when(k % 3 == 0, F.lit('"license":["perl_5"," "],'))
        .when(k % 3 == 1, F.lit('"license":["perl_5","mit"],'))
        .otherwise(F.lit('"license":[],'))
    )
    res_lic = F.when(
        k % 2 == 0, F.lit('"license":["http://dev.perl.org/licenses/"],')
    ).otherwise(F.lit(""))
    res_home = F.when(
        k % 2 == 0, F.concat(F.lit('"homepage":"http://'), name, F.lit('.ex",'))
    ).otherwise(F.lit(""))
    res_repo = (
        F.when(
            k % 3 == 0,
            F.concat(
                F.lit('"repository":{"url":"git://github.com/ex/'), name,
                F.lit('.git"},'),
            ),
        )
        .when(
            k % 3 == 1,
            F.concat(F.lit('"repository":{"url":"https://svn.ex/'), name, F.lit('"},')),
        )
        .otherwise(F.lit(""))
    )
    res_bug = F.when(
        k % 3 == 0,
        F.concat(F.lit('"bugtracker":{"web":"https://rt.cpan.org/'), name, F.lit('"},')),
    ).otherwise(F.lit(""))
    release_doc = F.concat(
        F.lit('{"hits":{"hits":[{"_source":{"name":"'), name,
        F.lit('","abstract":"Perl '), name,
        F.lit('","version":"'), ver,
        F.lit('","download_url":"https://cpan.metacpan.org/authors/'), name,
        F.lit("-"), ver,
        F.lit('.tar.gz",'),
        rel_lic,
        F.lit('"date":"2014-04-20T21:30:13","author":"A-'), name,
        F.lit('","resources":{'),
        res_home, res_lic, res_repo, res_bug,
        F.lit('"x":null}}},{"_source":{}}]}}'),
    )
    rel = map_cpan_release_docs(b.select(release_doc.alias("doc"))).select(
        "type",
        "name",
        "version",
        "purl",
        "description",
        "download_url",
        "extracted_license_statement",
        "release_date",
        "homepage_url",
        "vcs_url",
        "bug_tracking_url",
        F.lit(None).cast("string").alias("keywords"),
        "parties",
        F.lit(None).cast("string").alias("party_emails"),
        "datasource_id",
    )

    meta_abs = F.when(
        k % 4 != 0, F.concat(F.lit('"abstract":"Meta '), name, F.lit('",'))
    ).otherwise(F.lit(""))
    meta_lic = F.when(k % 2 == 0, F.lit('"license":["perl_5"],')).otherwise(
        F.lit('"license":"mit",')
    )
    meta_kw = F.when(k % 3 == 0, F.lit('"keywords":["k1"],')).otherwise(F.lit(""))
    meta_repo = (
        F.when(
            k % 3 == 0,
            F.concat(
                F.lit('"resources":{"repository":{"url":"git://g.ex/'), name,
                F.lit('"}},'),
            ),
        )
        .when(
            k % 3 == 1,
            F.concat(F.lit('"resources":{"repository":"git://s.ex/'), name, F.lit('"},')),
        )
        .otherwise(
            F.lit('"resources":{"repository":{"url":"https://h.ex"}},')
        )
    )
    meta_doc = F.concat(
        F.lit('{"name":"'), name,
        F.lit('","version":"'), ver,
        F.lit('",'),
        meta_abs, meta_lic, meta_kw, meta_repo,
        F.lit('"author":["Ann <a@ex.dev>","Solo"]}'),
    )
    meta_uri = F.concat(
        F.lit("http://www.cpan.org/authors/id/"), name, F.lit("-"), ver, F.lit(".meta")
    )
    meta = map_cpan_meta_docs(
        b.select(meta_doc.alias("doc"), meta_uri.alias("uri"))
    ).select(
        "type",
        "name",
        "version",
        "purl",
        "description",
        "download_url",
        "extracted_license_statement",
        F.lit(None).cast("string").alias("release_date"),
        F.lit(None).cast("string").alias("homepage_url"),
        "vcs_url",
        F.lit(None).cast("string").alias("bug_tracking_url"),
        "keywords",
        "parties",
        "party_emails",
        "datasource_id",
    )
    return rel.unionByName(meta)


@query(
    "x_apache_map",
    oracle=f"""
    WITH base AS ({_BASE_SQL}),
    b2 AS (SELECT *, replace(name, '-', '_') AS dlname FROM base),
    rels(rev, created, n) AS
      (VALUES ('1.0', '2020-01-02', 0), ('2.0', '2020', 1)),
    projects AS (
      SELECT 'apache' AS type, 'proj-' || name AS name,
             CAST(NULL AS VARCHAR) AS namespace,
             CASE WHEN k % 3 = 0 THEN rev END AS version,
             NULL AS purl,
             CASE WHEN k % 3 = 1 THEN 'L ' || name
                  WHEN k % 3 = 2 THEN 'S ' || name
                  ELSE 'S ' || name || chr(10) || 'L ' || name
                  END AS description,
             'https://' || name || '.apache.org' AS homepage_url,
             'https://issues.apache.org/jira/' || name AS bug_tracking_url,
             'Java' AS primary_language,
             CASE WHEN k % 4 = 0
                  THEN 'https://' || name || '.apache.org/download' END
               AS download_url,
             'https://svn.apache.org/repos/' || name AS code_view_url,
             CASE WHEN k % 2 = 0
                  THEN 'http://usefulinc.com/doap/licenses/asl20'
                  ELSE 'https://custom.ex/lic' END
               AS extracted_license_statement,
             CASE WHEN k % 2 = 0 THEN 'apache-2.0' END
               AS declared_license_expression,
             'db; library' AS keywords,
             'M1; M2' AS parties,
             'm1@a.org; ' AS party_emails,
             CASE WHEN k % 3 = 0 AND n = 0 THEN created END AS release_date,
             CAST(NULL AS VARCHAR) AS download_sha256,
             CAST(NULL AS VARCHAR) AS download_sha512,
             CAST(NULL AS VARCHAR) AS download_md5,
             CAST(NULL AS VARCHAR) AS download_sha,
             CAST(NULL AS VARCHAR) AS download_sha1,
             'apache_json' AS datasource_id
      FROM base CROSS JOIN rels
      WHERE k % 3 = 0 OR n = 0
    ),
    podlings AS (
      SELECT 'apache-podling', 'pod-' || name, NULL, NULL,
             'pkg:apache-podling/pod-' || name,
             'Pod ' || name, 'https://' || name || '.incubator.apache.org',
             NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
             NULL, NULL, NULL, NULL, NULL, NULL
      FROM base WHERE k % 2 = 0
    ),
    downloads AS (
      SELECT 'apache', dlname, NULL, '2.4.6', 'pkg:apache/' || dlname,
             NULL, NULL, NULL, NULL,
             'https://archive.apache.org/dist/' || dlname
               || '/2.4/apache-' || dlname || '-2.4.6.zip',
             NULL, NULL, NULL, NULL, NULL, NULL, NULL,
             cs, NULL, cs2, NULL, NULL, NULL
      FROM b2
      UNION ALL
      SELECT 'apache', dlname, NULL, '0.1-M1', 'pkg:apache/' || dlname,
             NULL, NULL, NULL, NULL,
             'https://apache.org/dist/' || dlname || '/x-' || dlname
               || '-0.1-M1.tar.gz',
             NULL, NULL, NULL, NULL, NULL, NULL, NULL,
             NULL, NULL, NULL, NULL, NULL, NULL
      FROM b2
    )
    SELECT * FROM projects
    UNION ALL SELECT * FROM podlings
    UNION ALL SELECT * FROM downloads
    """,
)
def x_apache_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """projects.apache.org mapping (apache.py:389-477): short+long
    description join, per-release rows vs a versionless row, 10-char
    release-date gate, ASL-2.0 URL -> declared expression, mailto:
    strip; podlings (apache.py:493-509); dist downloads
    (apache.py:513-591): checksum files folded onto their archive row,
    version from the first numeric dash segment."""
    b = _base(spark, sf_dir)
    k, name, cs, cs2 = F.col("k"), F.col("name"), F.col("cs"), F.col("cs2")
    dlname = F.replace(name, F.lit("-"), F.lit("_"))

    shortd = F.when(
        k % 3 != 1, F.concat(F.lit('"shortdesc":"S '), name, F.lit('",'))
    ).otherwise(F.lit(""))
    longd = F.when(
        k % 3 != 2, F.concat(F.lit('"description":"L '), name, F.lit('",'))
    ).otherwise(F.lit(""))
    dlpage = F.when(
        k % 4 == 0,
        F.concat(F.lit('"download-page":"https://'), name, F.lit('.apache.org/download",')),
    ).otherwise(F.lit(""))
    lic = F.when(
        k % 2 == 0, F.lit('"license":"http://usefulinc.com/doap/licenses/asl20",')
    ).otherwise(F.lit('"license":"https://custom.ex/lic",'))
    releases = F.when(
        k % 3 == 0,
        F.lit(
            ',"release":[{"revision":"1.0","created":"2020-01-02"},'
            '{"revision":"2.0","created":"2020"}]'
        ),
    ).otherwise(F.lit(""))
    projects_doc = F.concat(
        F.lit('{"proj-'), name, F.lit('":{'),
        shortd, longd,
        F.lit('"homepage":"https://'), name, F.lit('.apache.org",'),
        F.lit('"bug-database":"https://issues.apache.org/jira/'), name, F.lit('",'),
        F.lit('"programming-language":"Java",'),
        dlpage, lic,
        F.lit('"category":" db , library ,",'),
        F.lit('"repository":["https://svn.apache.org/repos/'), name,
        F.lit('","second"],'),
        F.lit('"maintainer":[{"name":"M1","mbox":"mailto:m1@a.org"},{"name":"M2"}]'),
        releases,
        F.lit("}}"),
    )
    projects = map_apache_projects(b.select(projects_doc.alias("doc"))).select(
        "type",
        "name",
        F.lit(None).cast("string").alias("namespace"),
        "version",
        F.lit(None).cast("string").alias("purl"),
        "description",
        "homepage_url",
        "bug_tracking_url",
        "primary_language",
        "download_url",
        "code_view_url",
        "extracted_license_statement",
        "declared_license_expression",
        "keywords",
        "parties",
        "party_emails",
        "release_date",
        *[
            F.lit(None).cast("string").alias(f"download_{t}")
            for t in ("sha256", "sha512", "md5", "sha", "sha1")
        ],
        "datasource_id",
    )

    pod_doc = F.when(
        k % 2 == 0,
        F.concat(
            F.lit('{"name":"pod-'), name,
            F.lit('","description":"Pod '), name,
            F.lit('","homepage":"https://'), name,
            F.lit('.incubator.apache.org"}'),
        ),
    ).otherwise(F.lit("{}"))
    podlings = map_apache_podlings(b.select(pod_doc.alias("doc"))).select(
        "type",
        "name",
        F.lit(None).cast("string").alias("namespace"),
        F.lit(None).cast("string").alias("version"),
        "purl",
        "description",
        "homepage_url",
        *[
            F.lit(None).cast("string").alias(c)
            for c in (
                "bug_tracking_url",
                "primary_language",
                "download_url",
                "code_view_url",
                "extracted_license_statement",
                "declared_license_expression",
                "keywords",
                "parties",
                "party_emails",
                "release_date",
                "download_sha256",
                "download_sha512",
                "download_md5",
                "download_sha",
                "download_sha1",
                "datasource_id",
            )
        ],
    )

    arc1 = F.concat(
        F.lit("https://archive.apache.org/dist/"), dlname,
        F.lit("/2.4/apache-"), dlname, F.lit("-2.4.6.zip"),
    )
    arc2 = F.concat(
        F.lit("https://apache.org/dist/"), dlname,
        F.lit("/x-"), dlname, F.lit("-0.1-M1.tar.gz"),
    )
    dl_purl = F.concat(F.lit("pkg:apache/"), dlname)
    uris = (
        b.select(arc1.alias("uri"), dl_purl.alias("package_url"), F.lit(None).cast("string").alias("data"))
        .unionByName(
            b.select(
                F.concat(arc1, F.lit(".sha256")).alias("uri"),
                dl_purl.alias("package_url"),
                cs.alias("data"),
            )
        )
        .unionByName(
            b.select(
                F.concat(arc1, F.lit(".md5")).alias("uri"),
                dl_purl.alias("package_url"),
                cs2.alias("data"),
            )
        )
        .unionByName(
            b.select(
                arc2.alias("uri"),
                dl_purl.alias("package_url"),
                F.lit(None).cast("string").alias("data"),
            )
        )
    )
    downloads = map_apache_downloads(uris).select(
        "type",
        "name",
        "namespace",
        "version",
        F.col("purl"),
        *[
            F.lit(None).cast("string").alias(c)
            for c in (
                "description",
                "homepage_url",
                "bug_tracking_url",
                "primary_language",
            )
        ],
        F.col("download_url"),
        *[
            F.lit(None).cast("string").alias(c)
            for c in (
                "code_view_url",
                "extracted_license_statement",
                "declared_license_expression",
                "keywords",
                "parties",
                "party_emails",
                "release_date",
            )
        ],
        "download_sha256",
        "download_sha512",
        "download_md5",
        "download_sha",
        "download_sha1",
        F.lit(None).cast("string").alias("datasource_id"),
    )
    return projects.unionByName(podlings).unionByName(downloads)
