"""Edge cases for the maven/debian collector enrichment beyond the
fixture queries: merge precedence, version/folder quirks, vcs exclusion,
and chains deeper than the data."""

from __future__ import annotations

from pyspark.sql import functions as F

from purldb_spark.sources.collectors import (
    debian_archive_version,
    debian_index_folder,
    debian_vcs_cols,
    merge_pom_ancestors,
    parse_pom_cols,
)


def _poms(spark, rows):
    return parse_pom_cols(spark.createDataFrame(rows, ["pom_text"]))


_CHILD = (
    "<project><parent><groupId>pg</groupId><artifactId>pa</artifactId>"
    "<version>1</version></parent><groupId>g</groupId>"
    "<artifactId>a</artifactId><version>1</version></project>",
)
_PARENT_EMPTY = (
    "<project><parent><groupId>gg</groupId><artifactId>ga</artifactId>"
    "<version>2</version></parent><groupId>pg</groupId>"
    "<artifactId>pa</artifactId><version>1</version></project>",
)
_GRAND = (
    "<project><groupId>gg</groupId><artifactId>ga</artifactId>"
    "<version>2</version><url>https://grand</url>"
    "<licenses><license><name>G1</name></license>"
    "<license><name>G2</name></license></licenses></project>",
)


def _packages(spark):
    return spark.createDataFrame(
        [("pkg:maven/g/a@1", "g", "a", "1", None, None, None)],
        "purl string, namespace string, name string, version string, "
        "declared_license_expression string, homepage_url string, "
        "parties string",
    )


def test_pom_merge_skips_empty_parent_for_deeper_value(spark):
    # parent has no license/url; the grandparent fills both — the
    # reference's oldest-first merge (maven.py:243-258)
    poms = _poms(spark, [_CHILD, _PARENT_EMPTY, _GRAND])
    row = merge_pom_ancestors(_packages(spark), poms, max_depth=4).collect()[0]
    assert row["declared_license_expression"] == "G1 AND G2"
    assert row["homepage_url"] == "https://grand"
    assert row["parties"] is None


def test_pom_merge_child_value_never_overwritten(spark):
    pkg = _packages(spark).withColumn(
        "declared_license_expression", F.lit("CHILD")
    )
    poms = _poms(spark, [_CHILD, _PARENT_EMPTY, _GRAND])
    row = merge_pom_ancestors(pkg, poms, max_depth=4).collect()[0]
    assert row["declared_license_expression"] == "CHILD"


def test_pom_merge_no_pom_row_passes_through(spark):
    poms = _poms(spark, [_GRAND])  # no pom for the package itself
    row = merge_pom_ancestors(_packages(spark), poms, max_depth=2).collect()[0]
    assert row["homepage_url"] is None


def test_debian_archive_version_branches(spark):
    df = spark.range(1).select(
        debian_archive_version(F.lit("1:2.0-3")).alias("epoch_rev"),
        debian_archive_version(F.lit("2.0-0")).alias("zero_rev"),
        debian_archive_version(F.lit("2.0")).alias("no_rev"),
        debian_archive_version(F.lit("1.0-2-3")).alias("multi_dash"),
    )
    r = df.collect()[0]
    # epoch dropped, revision kept (debian.py:305-316)
    assert r["epoch_rev"] == "2.0-3"
    # revision "0" (explicit or absent) -> upstream only
    assert r["zero_rev"] == "2.0"
    assert r["no_rev"] == "2.0"
    # only the LAST dash segment is the revision
    assert r["multi_dash"] == "1.0-2-3"


def test_debian_index_folder_lib_strip_quirk(spark):
    df = spark.range(1).select(
        debian_index_folder(F.lit("libssl")).alias("lib"),
        debian_index_folder(F.lit("zlib")).alias("plain"),
        # the reference strips EVERY "lib" occurrence before taking the
        # first letter (debian.py:430-432)
        debian_index_folder(F.lit("liblibx")).alias("double"),
    )
    r = df.collect()[0]
    assert r["lib"] == "libs"
    assert r["plain"] == "z"
    assert r["double"] == "libx"


def test_debian_vcs_browser_excluded(spark):
    doc = "Vcs-Browser: https://b.ex\nVcs-Svn: svn://s.ex/repo\n"
    r = (
        spark.range(1)
        .select(*debian_vcs_cols(F.lit(doc)))
        .collect()[0]
    )
    assert r["vcs_tool"] == "svn"
    assert r["vcs_repo"] == "svn://s.ex/repo"
    r2 = (
        spark.range(1)
        .select(*debian_vcs_cols(F.lit("Vcs-Browser: https://b.ex\n")))
        .collect()[0]
    )
    assert r2["vcs_tool"] is None and r2["vcs_repo"] is None


def test_debian_archive_version_matches_python_reference(spark):
    # python reference of DebianPackage.package_archive_version semantics
    # (debian.py:305-316): epoch dropped; "-revision" kept unless "0"
    def ref(v):
        import re

        no_epoch = re.sub(r"^\d+:", "", v)
        upstream, dash, revision = no_epoch.rpartition("-")
        if not dash:
            return no_epoch
        return no_epoch if revision != "0" else upstream

    cases = []
    for epoch in ("", "1:", "12:"):
        for up in ("2.0", "1.0-2", "3+b1", "0.5~rc1"):
            for rev in ("", "-0", "-1", "-0ubuntu1"):
                cases.append(f"{epoch}{up}{rev}")
    df = spark.createDataFrame([(c,) for c in cases], ["v"])
    got = {
        r["v"]: r["av"]
        for r in df.select(
            "v", debian_archive_version(F.col("v")).alias("av")
        ).collect()
    }
    for c in cases:
        assert got[c] == ref(c), (c, got[c], ref(c))
