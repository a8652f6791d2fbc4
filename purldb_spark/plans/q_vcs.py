"""purl2vcs inference query: package metadata rows with every messy VCS-URL
shape the reference normalizes (purl2vcs/src/purl2vcs/find_source_repo.py)
are pushed through the real candidate-extraction / normalization / tag-match
pipeline (functions/vcs.py); the oracle derives the expected source purls
directly from the generating index, so the normalization chain itself is
what the hash match verifies.

Shapes by k%10: 0 plain github .git, 1 git@github.com+ prefix (in
code_view_url), 2 https+// gitlab, 3 git+https with @commit suffix,
4 git://host:path, 5 bitbucket homepage, 6 Apache-SVN tags URL (rewritten
to github.com/apache), 7 non-forge homepage (dropped — redirect-following
is driver I/O), 8 URL inside description text, 9 BOTH a github homepage
and a gitlab vcs_url (homepage's earlier priority must win).

Plan-size discipline: the shared derived columns (slug, namespace, github
base URL, effective forge/tag) are computed ONCE into a flat enriched base
that is localCheckpoint'ed; the shape when-chains then reference only plain
columns of that base, so no fixture expression tree gets re-inlined under
the operator chain and every projection compiles inside whole-stage
codegen (previously this fixture's lineage composed into a 3.8 MB plan /
12 MiB task binary and a janino 64 KB method overflow — 91 s of pure
planning overhead at sf0.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.functions.vcs import match_version_tags, source_repo_candidates
from purldb_spark.plans.registry import query


def _enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat fixture base: one row per synthetic package with every derived
    column the shapes below need, materialized (localCheckpoint) so the
    when-chains downstream reference only plain columns."""
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    base = c.select(
        k.alias("k"),
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("-"))).alias("n"),
        F.concat(F.lit("org"), (k % 7).cast("string")).alias("ns"),
        F.concat(F.lit("2."), (k % 5).cast("string")).alias("version"),
        (k % 10).alias("i"),
    )
    i, k2 = F.col("i"), F.col("k")
    enriched = base.select(
        "k",
        "n",
        "ns",
        "version",
        "i",
        F.concat(F.lit("https://github.com/"), F.col("ns"), F.lit("/"), F.col("n")).alias(
            "gh"
        ),
        F.when(i == 2, "gitlab").when(i == 5, "bitbucket").otherwise("github").alias("t"),
        F.when(i == 6, "apache").otherwise(F.col("ns")).alias("nse"),
        F.when(k2 % 2 == 0, F.concat(F.lit("v"), F.col("version")))
        .otherwise(F.replace(F.col("version"), F.lit("."), F.lit("_")))
        .alias("tag"),
    )
    return enriched.localCheckpoint(eager=True)


def _packages(enriched: DataFrame) -> DataFrame:
    n, ns, i, gh = F.col("n"), F.col("ns"), F.col("i"), F.col("gh")
    vcs_url = (
        F.when(i == 0, F.concat(gh, F.lit(".git")))
        .when(i == 2, F.concat(F.lit("https+//gitlab.com/"), ns, F.lit("/"), n))
        .when(i == 3, F.concat(F.lit("git+"), gh, F.lit("@deadbeef")))
        .when(i == 4, F.concat(F.lit("git://github.com:"), ns, F.lit("/"), n))
        .when(
            i == 6,
            F.concat(
                F.lit("svn+https://svn.apache.org/repos/asf/"),
                n,
                F.lit("/tags/v"),
                F.col("version"),
                F.lit("/subdir"),
            ),
        )
        .when(i == 9, F.concat(F.lit("https://gitlab.com/"), ns, F.lit("/"), n))
    )
    code_view_url = F.when(
        i == 1, F.concat(F.lit("git@github.com+"), gh, F.lit(".git"))
    )
    homepage_url = (
        F.when(i == 5, F.concat(F.lit("https://bitbucket.org/"), ns, F.lit("/"), n))
        .when(i == 7, F.concat(F.lit("https://example.org/"), n))
        .when(i == 9, F.concat(gh, F.lit("/issues")))
    )
    description = F.when(
        i == 8, F.concat(F.lit("source at "), gh, F.lit(" really"))
    ).otherwise(F.lit("plain text"))
    return enriched.select(
        F.concat(F.lit("pkg:gen/"), n, F.lit("@"), F.col("version")).alias("purl"),
        F.col("version"),
        code_view_url.alias("code_view_url"),
        homepage_url.alias("homepage_url"),
        vcs_url.alias("vcs_url"),
        description.alias("description"),
    )


def _tags(enriched: DataFrame) -> DataFrame:
    eff = enriched.filter(F.col("i") != 7)
    real = eff.select(
        F.col("t").alias("type"),
        F.col("nse").alias("namespace"),
        F.col("n").alias("name"),
        # alias() mints a fresh exprId — without it the output attribute is
        # the same `tag` that lives inside the shared enriched subtree on
        # the candidates side of the downstream join (ambiguity error)
        F.col("tag").alias("tag"),
        F.md5(F.concat(F.col("n"), F.col("tag"))).alias("commit"),
    )
    decoy = eff.select(
        F.col("t").alias("type"),
        F.col("nse").alias("namespace"),
        F.col("n").alias("name"),
        F.lit("v9.9").alias("tag"),
        F.md5(F.concat(F.col("n"), F.lit("v9.9"))).alias("commit"),
    )
    # the losing gitlab candidate of shape 9 also has a matching tag — the
    # priority rule (earlier metadata column wins), not tag absence, must
    # pick github
    gitlab9 = eff.filter(F.col("i") == 9).select(
        F.lit("gitlab").alias("type"),
        F.col("ns").alias("namespace"),
        F.col("n").alias("name"),
        F.col("tag").alias("tag"),
        F.md5(F.concat(F.col("n"), F.col("tag"), F.lit("gl"))).alias("commit"),
    )
    return real.unionByName(decoy).unionByName(gitlab9)


@query(
    "x_purl2vcs_infer",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS k, lower(replace(c_name, '#', '-')) AS n,
             'org' || CAST(c_custkey % 7 AS VARCHAR) AS ns,
             '2.' || CAST(c_custkey % 5 AS VARCHAR) AS version,
             c_custkey % 10 AS i
      FROM customer
    ),
    eff AS (
      SELECT *,
             CASE WHEN i = 2 THEN 'gitlab' WHEN i = 5 THEN 'bitbucket'
                  ELSE 'github' END AS t,
             CASE WHEN i = 6 THEN 'apache' ELSE ns END AS nse,
             CASE WHEN k % 2 = 0 THEN 'v' || version
                  ELSE replace(version, '.', '_') END AS tag
      FROM base WHERE i <> 7
    )
    SELECT 'pkg:gen/' || n || '@' || version AS purl,
           t AS src_type, nse AS src_namespace, n AS src_name,
           tag AS src_version, md5(n || tag) AS commit,
           'pkg:' || t || '/' || nse || '/' || n || '@' || tag
             || '?commit=' || md5(n || tag) AS source_purl
    FROM eff
    """,
)
def x_purl2vcs_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end source-repo inference (get_source_repo,
    find_source_repo.py:190-206): candidate URLs from metadata + text,
    forge filter + Apache-SVN rewrite, normalization to purl parts,
    broadcast tag join with normalized-tag == version, best candidate by
    metadata priority."""
    enriched = _enriched(spark, sf_dir)
    cands = source_repo_candidates(
        _packages(enriched),
        url_cols=["code_view_url", "homepage_url", "vcs_url"],
        text_cols=["description"],
    )
    return match_version_tags(cands, _tags(enriched))
