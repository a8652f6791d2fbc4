"""Behavioral parity against the reference's OWN test fixtures: real
registry documents (rubygems apiv2, crates.io) paired with the
expected PackageData the reference's miners produce
(minecode/tests/testfiles/{rubygems,cargo}/...). Our mappers must
produce the same field values the reference's expected-*.json records.

The fixtures are read in place from the read-only reference checkout —
nothing is copied into this repo; the tests skip when the checkout is
absent.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from purldb_spark.sources.miners2 import map_cargo_docs, map_gem_docs

_TESTFILES = "/root/reference/minecode/tests/testfiles"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_TESTFILES), reason="reference checkout not available"
)


def _load(path: str):
    with open(os.path.join(_TESTFILES, path)) as fh:
        return fh.read()


def test_gem_v2_mapper_matches_reference_expected(spark):
    doc = _load("rubygems/apiv2/rails-8.0.2.json")
    expected = json.loads(_load("rubygems/apiv2/expected-rails-8.0.2.json"))
    rows = map_gem_docs(
        spark.createDataFrame([(doc,)], "doc string")
    ).collect()
    assert len(rows) == len(expected) == 1
    r, e = rows[0], expected[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.description == e["description"]
    assert r.homepage_url == e["homepage_url"]
    assert r.repository_homepage_url == e["repository_homepage_url"]
    assert r.download_url == e["download_url"]
    assert r.sha256 == e["sha256"]
    assert r.release_date_raw == e["release_date"]
    # the reference renders the license list as a YAML-ish block
    # ("- MIT\n"); ours joins with '; ' — same license set
    assert [r.declared_license] == [
        s.lstrip("- ").strip() for s in e["extracted_license_statement"].splitlines()
    ]
    assert r.author == e["parties"][0]["name"]


def test_cargo_mapper_matches_reference_expected(spark):
    doc = _load("cargo/sam.json")
    expected = json.loads(_load("cargo/expected-sam.json"))
    rows = {
        r.version: r
        for r in map_cargo_docs(
            spark.createDataFrame([(doc,)], "doc string")
        ).collect()
    }
    assert len(rows) == len(expected)
    for e in expected:
        r = rows[e["version"]]
        assert r.type == e["type"]
        assert r.name == e["name"]
        assert r.description == e["description"]
        assert r.homepage_url == e["homepage_url"]
        assert r.repository_homepage_url == e["repository_homepage_url"]
        assert r.download_url == e["download_url"]
        assert r.sha256 == e["sha256"]
        lic = e["extracted_license_statement"]
        if lic:
            assert r.declared_license == "; ".join(
                s.lstrip("- ").strip() for s in lic.splitlines()
            )
        else:
            assert r.declared_license is None


def test_pypi_mapper_matches_reference_expected(spark):
    from purldb_spark.sources.miners import map_pypi_docs, parse_pypi_docs

    doc = _load("pypi/lxml-3.2.0.json")
    expected = json.loads(_load("pypi/expected-lxml-3.2.0.json"))
    rows = map_pypi_docs(
        parse_pypi_docs(spark.createDataFrame([(doc,)], "doc string"))
    ).collect()
    # one row per urls entry, same count as the reference's expected list
    assert len(rows) == len(expected)
    by_url = {r.download_url: r for r in rows}
    for e in expected:
        r = by_url[e["download_url"]]
        assert r.type == e["type"]
        assert r.name == e["name"]
        assert r.version == e["version"]
        assert r.description == e["description"]
        assert r.homepage_url == e["homepage_url"]
        assert r.md5 == e["md5"]
        assert r.size == e["size"]
        assert r.datasource_id == e["datasource_id"]


def test_alpine_mapper_matches_reference_expected(spark):
    from purldb_spark.sources.miners3 import map_alpine_blocks

    apkindex = _load(
        "alpine/postgresql16-contrib_v3.14-community-armhf/APKINDEX"
    )
    expected = json.loads(_load("alpine/mapper_postgresql16_contrib_expected.json"))
    e = expected[0] if isinstance(expected, list) else expected
    rows = map_alpine_blocks(
        spark.createDataFrame(
            [(apkindex, e["download_url"])], "apkindex string, download_url string"
        )
    ).filter(F.col("name") == e["name"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.version == e["version"]
    assert r.description == e["description"]
    assert r.extracted_license_statement == e["extracted_license_statement"]
    assert r.size == e["size"]
    assert r.sha1 == e["sha1"]
    assert r.download_url == e["download_url"]
    assert r.repository_homepage_url == e["repository_homepage_url"]
    assert r.datasource_id == e["datasource_id"]


def test_npm_registry_mapper_matches_reference_expected(spark):
    from purldb_spark.sources.registry_json import (
        REGISTRY_SCHEMA,
        packages_from_registry,
    )

    doc = _load("npm/0flux.json")
    expected = json.loads(_load("npm/0flux_npm_expected.json"))
    parsed = (
        spark.createDataFrame([(doc,)], "doc string")
        .select(F.from_json("doc", REGISTRY_SCHEMA).alias("r"))
        .select("r.*")
    )
    rows = {r.version: r for r in packages_from_registry(parsed, "npm").collect()}
    exp = {e["version"]: e for e in expected}
    assert set(rows) == set(exp)
    for v, e in exp.items():
        r = rows[v]
        assert r.name == e["name"]
        assert r.download_url == e["download_url"]
        assert r.sha1 == e["sha1"]
        assert r.purl == e["purl"]
        assert (r.declared_license_expression or "").lower() == (
            e["declared_license_expression"] or ""
        ).lower()
        assert r.homepage_url == e["homepage_url"]


def test_packagist_mapper_matches_reference_expected(spark):
    from purldb_spark.sources.miners2 import map_packagist_docs

    doc = _load("packagist/00f100_cakephp-opauth.json")
    expected = json.loads(_load("packagist/packaglist_00f100_cakephp-opauth_expected.json"))
    rows = map_packagist_docs(
        spark.createDataFrame([(doc,)], "doc string")
    ).collect()
    assert len(rows) == len(expected) == 1
    r, e = rows[0], expected[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.description == e["description"]
    assert r.homepage_url == e["homepage_url"]
    assert r.download_url == e["download_url"]
    assert r.vcs_url == e["vcs_url"]
    assert sorted(r.keywords) == sorted(e["keywords"])


def test_gitlab_mapper_matches_reference_expected(spark):
    from purldb_spark.sources.miners4 import map_gitlab_docs

    doc = _load("gitlab/microservice-express-mongo.json")
    expected = json.loads(_load("gitlab/microservice-express-mongo_expected.json"))
    e = expected[0] if isinstance(expected, list) else expected
    rows = map_gitlab_docs(
        spark.createDataFrame([(doc,)], "doc string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.purl == e["purl"]
    assert r.homepage_url == e["homepage_url"]
    assert r.vcs_url == e["vcs_url"]
    assert r.code_view_url == e["code_view_url"]
    assert str(r.release_date) == e["release_date"]
    assert r.description == e.get("description")


def test_github_mapper_matches_reference_expected(spark):
    from purldb_spark.sources.miners4 import map_github_docs

    doc = _load("github/mojombo_grit_from_visitor_4mapper_input.json")
    expected = json.loads(_load("github/mojombo_grit_result_mapper_expected.json"))
    rows = map_github_docs(
        spark.createDataFrame([(doc,)], "doc string")
    ).collect()
    # 1 download row + 15 tags x (tarball + zipball) = 31, as the reference
    assert len(rows) == len(expected) == 31
    by_url = {r.download_url: r for r in rows}
    for e in expected:
        r = by_url[e["download_url"]]
        assert r.type == e["type"]
        assert r.namespace == e["namespace"]
        assert r.name == e["name"]
        assert r.version == e["version"]
        assert r.homepage_url == e["homepage_url"]
        assert r.size == e["size"]
        assert r.sha1 == e["sha1"]
        # vcs_url: the reference fixture carries a stringified TUPLE
        # ("git+('git://...',)") — an artifact of its own join bug; ours is
        # the clean git+<git_url> form. Compare the embedded URL only.
        if e["vcs_url"]:
            assert r.vcs_url.replace("git+", "") in e["vcs_url"]


def test_bower_mapper_matches_reference_expected(spark):
    from purldb_spark.sources.miners6 import map_bower_docs

    doc = _load("bower/example1_bower.json")
    expected = json.loads(_load("bower/expected_mapper_example1_bower.json"))
    e = expected[0] if isinstance(expected, list) else expected
    rows = map_bower_docs(spark.createDataFrame([(doc,)], "doc string")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.description == e["description"]
    assert r.homepage_url == e["homepage_url"]
    assert r.keywords.split("; ") == e["keywords"]
    # the reference renders the license list as a YAML-ish block
    assert [r.extracted_license_statement] == [
        s.lstrip("- ").strip()
        for s in e["extracted_license_statement"].splitlines()
    ]
    assert r.parties.split("; ") == [p["name"] for p in e["parties"]]


def test_fdroid_mapper_matches_reference_expected(spark):
    from purldb_spark.sources.miners3 import map_fdroid_docs

    index = json.loads(_load("fdroid/index-v2.json"))
    expected = json.loads(_load("fdroid/index-v2-visited-expected-mapped.json"))
    docs = [
        (app_id, json.dumps(entry))
        for app_id, entry in index["packages"].items()
    ]
    rows = map_fdroid_docs(
        spark.createDataFrame(docs, "name string, doc string")
    ).collect()
    assert len(rows) == len(expected)
    by_key = {(r.download_url): r for r in rows}
    for e in expected:
        r = by_key[e["download_url"]]
        assert r.name == e["name"]
        assert r.version == e["version"]
        assert r.size == e["size"]
        assert r.sha256 == e["sha256"]
        assert r.description == e["description"]
        assert (r.keywords or []) == (e["keywords"] or [])
        assert r.vcs_url == e["vcs_url"]
        assert r.homepage_url == e["homepage_url"]
        assert (r.source_packages or []) == (e.get("source_packages") or [])


def test_debian_packages_mapper_matches_reference_expected(spark):
    from purldb_spark.sources.miners import map_debian_packages, split_paragraphs

    text = _load("debian/packages/debian_Packages")
    expected = json.loads(_load("debian/packages/debian_Packages-expected.json"))
    rows = map_debian_packages(
        split_paragraphs(
            spark.createDataFrame([(text,)], "text string"), "text"
        )
    ).collect()
    assert len(rows) == len(expected)
    by_name = {r.name: r for r in rows}
    for e in expected:
        r = by_name[e["name"]]
        assert r.purl == e["purl"]
        assert r.type == e["type"]
        assert r.namespace == e["namespace"]
        assert r.version == e["version"]
        assert r.description == e["description"]
        assert r.homepage_url == e["homepage_url"]
        assert r.md5 == e["md5"]
        assert r.sha1 == e["sha1"]
        assert r.sha256 == e["sha256"]
        assert r.download_url == e["download_url"]
        assert (r.keywords.split(",") if r.keywords else []) == e["keywords"]
        assert r.primary_language == e["primary_language"]
        if e["parties"]:
            assert r.maintainer_name == e["parties"][0]["name"]
            assert r.maintainer_email == e["parties"][0]["email"]


def test_sourceforge_mapper_matches_reference_expected(spark):
    from purldb_spark.sources.miners3 import map_sourceforge_docs

    for proj in ("niftyphp", "monoql", "openstunts", "odanur"):
        doc = _load(f"sourceforge/{proj}.json")
        fname = "mapper_omonoql_expected.json" if proj == "monoql" else f"mapper_{proj}_expected.json"
        expected = json.loads(_load(f"sourceforge/{fname}"))
        e = expected[0] if isinstance(expected, list) else expected
        rows = map_sourceforge_docs(
            spark.createDataFrame([(doc,)], "doc string")
        ).collect()
        assert len(rows) == 1, proj
        r = rows[0]
        assert r.purl == e["purl"], proj
        assert r.name == e["name"], proj
        assert r.description == e["description"], proj
        assert r.homepage_url == e["homepage_url"], proj
        if e.get("extracted_license_statement"):
            assert sorted(
                s.lstrip("- ").strip()
                for s in e["extracted_license_statement"].splitlines()
            ) == sorted(r.extracted_license_statement), proj
        assert sorted(r.contributors or []) == sorted(
            p["name"] for p in (e.get("parties") or [])
        ), proj


def test_eclipse_mapper_matches_reference_expected(spark):
    from purldb_spark.sources.miners4 import map_eclipse_docs

    doc = _load("eclipse/birt.json")
    expected = json.loads(_load("eclipse/eclipse_birt_expected.json"))
    e = expected[0] if isinstance(expected, list) else expected
    rows = map_eclipse_docs(spark.createDataFrame([(doc,)], "doc string")).collect()
    assert len(rows) >= 1
    r = rows[0]
    assert r.purl == e["purl"]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.description == e["description"]
    assert r.homepage_url == e["homepage_url"]
    assert r.bug_tracking_url == e["bug_tracking_url"]


def test_freebsd_manifest_matches_reference_expected(spark):
    from purldb_spark.sources.miners8 import map_freebsd_docs

    doc = _load("freebsd/pkg-devel_index")
    expected = json.loads(_load("freebsd/pkg-devel_index_mapper.json"))
    e = expected[0] if isinstance(expected, list) else expected
    rows = map_freebsd_docs(
        spark.createDataFrame([(doc,)], "packagesite string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.description == e["description"]
    assert r.homepage_url == e["homepage_url"]
    assert r.download_url == e["download_url"]
    assert r.code_view_url == e["code_view_url"]
    assert r.keywords == e["keywords"][0]
    assert r.maintainer == e["parties"][0]["email"]
    lic = e.get("extracted_license_statement")
    if lic:
        assert r.extracted_license_statement == "\n".join(
            s.lstrip("- ").strip() for s in lic.splitlines()
        )


def test_openwrt_control_matches_reference_expected(spark):
    """The .ipk fixture is a gzipped tar holding control.tar.gz/control —
    extracted in-memory here (the Spark-side codec boundary stays a
    binaryFile + mapPartitions pipeline; the mapper itself is columnar)."""
    import gzip
    import io
    import tarfile

    from purldb_spark.sources.miners9 import map_openwrt_docs

    raw = open(
        os.path.join(_TESTFILES, "openwrt/6to4_12-2_all.ipk"), "rb"
    ).read()
    with tarfile.open(fileobj=io.BytesIO(raw), mode="r:*") as outer:
        inner_raw = outer.extractfile("./control.tar.gz").read()
    with tarfile.open(fileobj=io.BytesIO(inner_raw), mode="r:*") as inner:
        control = inner.extractfile("./control").read().decode()

    expected = json.loads(_load("openwrt/6to4_12-2_all_ipk_expected_mapper.json"))
    e = expected[0] if isinstance(expected, list) else expected
    rows = map_openwrt_docs(
        spark.createDataFrame([(control,)], "control string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.description == e["description"]
    assert r.maintainer_name == e["parties"][0]["name"]
    assert r.maintainer_email == e["parties"][0]["email"]
    assert r.keywords.split("; ") == e["keywords"]
    assert r.size == e["size"]


def test_googlecode_v2_matches_reference_expected(spark):
    # the v2 archive route maps with build_packages_from_projectsjson_v1
    # (googlecode.py:229-243): description only, domain namespace
    from purldb_spark.sources.miners9 import map_googlecode_v1_docs

    doc = _load("googlecode/v2_apache-extras.org_124799961-qian_project.json")
    expected = json.loads(
        _load("googlecode/mapper_expected_v2_apache-extras.org_124799961-qian_project.json")
    )
    e = expected[0] if isinstance(expected, list) else expected
    rows = map_googlecode_v1_docs(
        spark.createDataFrame([(doc,)], "doc string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.namespace == e["namespace"]
    assert r.purl == e["purl"]
    assert r.description == e["description"]
    assert r.extracted_license_statement == e["extracted_license_statement"]
    assert (r.keywords or None) == ("; ".join(e["keywords"]) or None)


def test_freedesktop_pages_match_reference_expected(spark):
    from purldb_spark.sources.miners9 import map_freedesktop_pages

    for page, exp_name, uri in (
        (
            "hal.html",
            "hal_project_expected.json",
            "https://www.freedesktop.org/wiki/Software/hal",
        ),
        (
            "libinput.html",
            "libinput_project_expected.json",
            "https://www.freedesktop.org/wiki/Software/libinput/",
        ),
    ):
        html = _load(f"freedesktop/{page}")
        expected = json.loads(_load(f"freedesktop/{exp_name}"))
        e = expected[0] if isinstance(expected, list) else expected
        rows = map_freedesktop_pages(
            spark.createDataFrame(
                [(html, uri, e["purl"])],
                "html string, uri string, package_url string",
            )
        ).collect()
        assert len(rows) == 1, page
        r = rows[0]
        assert r.purl == e["purl"], page
        assert r.name == e["name"], page
        assert r.description == e["description"], page
        assert r.homepage_url == e["homepage_url"], page
        assert r.download_url == e["download_url"], page
        assert r.bug_tracking_url == e["bug_tracking_url"], page
        assert r.code_view_url == e["code_view_url"], page
        assert r.vcs_url == e["vcs_url"], page


def test_conan_recipe_matches_reference_docs(spark):
    """Run the conan collect flow over the REAL zlib conan-center recipe
    (config.yml version->folder, conandata.yml url-list + sha256,
    conanfile.py class attributes incl. the parenthesized multi-line
    description form)."""
    from purldb_spark.sources.collectors3 import map_conan_requests

    base = "conan/zlib/manifest"
    config = _load(f"{base}/config.yml")
    conandata = _load(f"{base}/conandata.yml")
    conanfile = _load(f"{base}/conanfile.py")
    requests = spark.createDataFrame(
        [("pkg:conan/zlib@1.3.1", "zlib", "1.3.1")],
        "purl string, name string, version string",
    )
    configs = spark.createDataFrame([("zlib", config)], "name string, doc string")
    conandatas = spark.createDataFrame(
        [("zlib", "all", conandata)], "name string, folder string, doc string"
    )
    conanfiles = spark.createDataFrame(
        [("zlib", "all", conanfile)], "name string, folder string, doc string"
    )
    rows = map_conan_requests(requests, configs, conandatas, conanfiles).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.status == "collected"
    # url LIST takes its first element (conan.py:79-91)
    assert r.download_url == "https://zlib.net/fossils/zlib-1.3.1.tar.gz"
    assert r.sha256 == "9a93b2b7dfdac77ceba5a558a580e74667dd6fede4585b91eefb60f03b72df23"
    assert r.extracted_license_statement == "Zlib"
    assert r.homepage_url == "https://zlib.net"
    assert r.keywords == "zlib; compression"
    assert r.description and r.description.startswith(
        "A Massively Spiffy Yet Delicately Unobtrusive Compression Library"
    )


def test_apache_podling_matches_reference_expected(spark):
    from purldb_spark.sources.miners7 import map_apache_podlings

    doc = _load("apache/podling_amaterasu.json")
    expected = json.loads(_load("apache/podling_amaterasu_expected.json"))
    e = expected[0] if isinstance(expected, list) else expected
    rows = map_apache_podlings(
        spark.createDataFrame([(doc,)], "doc string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.description == e["description"]
    assert r.homepage_url == e["homepage_url"]


def test_apache_download_matches_reference_expected(spark):
    from purldb_spark.sources.miners7 import map_apache_downloads

    expected = json.loads(_load("apache/map-groovy_expected.json"))
    e = expected[0] if isinstance(expected, list) else expected
    docs = spark.createDataFrame(
        [(e["download_url"], "pkg:apache/groovy@2.4.6", None)],
        "uri string, package_url string, data string",
    )
    rows = map_apache_downloads(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.download_url == e["download_url"]


def test_rpm_repodata_matches_reference_expected(spark):
    """Full repomd pipeline over the REAL pgpool repodata (gzipped
    primary/filelists/other + repomd.xml) vs the reference's
    expected.json package list."""
    import gzip

    from purldb_spark.sources.rpm_repodata import map_repomd_packages

    base_dir = os.path.join(_TESTFILES, "repodata_rpms/repomd_parser/pgpool")

    def _gz(name):
        return gzip.open(os.path.join(base_dir, name)).read().decode()

    repomd = open(os.path.join(base_dir, "repomd.xml")).read()
    expected = json.loads(open(os.path.join(base_dir, "expected.json")).read())
    base_url = "http://pgpool.net/yum/rpms/3.4/redhat/rhel-6-x86_64"
    repos = spark.createDataFrame(
        [
            (
                "pgpool",
                base_url,
                repomd,
                _gz("primary.xml.gz"),
                _gz("filelists.xml.gz"),
                _gz("other.xml.gz"),
            )
        ],
        "repo_id string, base_url string, repomd_xml string,"
        " primary_xml string, filelists_xml string, other_xml string",
    )
    rows = {r.name: r for r in map_repomd_packages(repos).collect()}
    assert len(rows) == len(expected) == 3
    for e in expected:
        r = rows[e["name"]]
        assert r.version == e["version"]
        assert r.description == e["description"]
        assert r.homepage_url == e["homepage_url"]
        assert r.download_url == e["download_url"]
        assert r.extracted_license_statement == e["extracted_license_statement"]


def test_maven_pom_ancestry_matches_reference_expected(spark):
    """Ancestry merge over the REAL ant-antlr POM chain (ant-antlr ->
    ant-parent, reference before/after fixtures): the merge fills
    parties from the ancestor's <organization> and the license from the
    ancestor's <licenses> block, child fields never overwritten.
    (The reference's after-file shows the scancode-DETECTED expression
    'apache-2.0'; this engine carries the raw extracted statement — the
    detection step is scancode-toolkit territory, documented.)"""
    from purldb_spark.sources.collectors import (
        merge_pom_ancestors,
        parse_pom_cols,
    )

    before = json.loads(_load("maven/pom/ant-antlr-1.10.1-package_before.json"))
    after = json.loads(_load("maven/pom/ant-antlr-1.10.1-package_after.json"))
    poms_df = spark.createDataFrame(
        [
            (_load("maven/pom/ant-antlr-1.10.1.pom"),),
            (_load("maven/pom/ant-parent-1.10.1.pom"),),
            (_load("maven/pom/apache-18.pom"),),
        ],
        "pom_text string",
    )
    packages = spark.createDataFrame(
        [
            (
                before["purl"],
                before["namespace"],
                before["name"],
                before["version"],
                before["declared_license_expression"],
                before["homepage_url"],
                None,  # parties: empty before the merge
            )
        ],
        "purl string, namespace string, name string, version string,"
        " declared_license_expression string, homepage_url string,"
        " parties string",
    )
    rows = merge_pom_ancestors(packages, parse_pom_cols(poms_df), max_depth=3).collect()
    assert len(rows) == 1
    r = rows[0]
    # the filled party is the ancestor organization, exactly the name the
    # reference's after-file records
    assert r.parties == after["parties"][0]["name"]
    # license filled from the ancestor chain: the raw POM license name of
    # the same <licenses> block scancode detects 'apache-2.0' from
    assert r.declared_license_expression == "The Apache Software License, Version 2.0"
    # child fields that had values keep them
    assert r.purl == before["purl"]


def test_debian_sources_mapper_matches_reference_expected(spark):
    from purldb_spark.sources.miners import map_debian_sources, split_paragraphs

    text = _load("debian/sources/debian_Sources")
    expected = json.loads(
        _load("debian/sources/debian_Sources_mapped-expected-packages.json")
    )
    rows = map_debian_sources(
        split_paragraphs(spark.createDataFrame([(text,)], "text string"), "text")
    ).collect()
    assert len(rows) == len(expected)
    by_url = {r.download_url: r for r in rows}
    for e in expected:
        r = by_url[e["download_url"]]
        assert r.type == e["type"]
        assert r.name == e["name"]
        assert r.version == e["version"]
        assert r.purl == e["purl"]
        assert r.md5 == e["md5"]
        # sha1/sha256: the reference's loop keeps only the LAST checksum
        # entry for every row — replicated
        assert r.sha1 == e["sha1"]
        assert r.sha256 == e["sha256"]
        assert r.homepage_url == e["homepage_url"]
        assert r.code_view_url == e["code_view_url"]
        assert r.vcs_url == e["vcs_url"]
        assert sorted(r.keywords.split(",")) == sorted(e["keywords"])
        parties = e["parties"]
        maints = [p["name"] for p in parties if p["role"] == "maintainer"]
        contribs = [p["name"] for p in parties if p["role"] == "contributor"]
        assert [r.maintainer_name] == maints
        assert (r.uploaders.split("; ") if r.uploaders else []) == contribs


def test_openssl_listing_matches_reference_expected(spark):
    from purldb_spark.sources.miners9 import map_openssl_listing

    expected = json.loads(_load("openssl/openssl_mapper_expected.json"))
    e = expected[0] if isinstance(expected, list) else expected
    docs = spark.createDataFrame(
        [(e["download_url"], e["size"], e["release_date"])],
        "uri string, size long, last_modified_date string",
    )
    rows = map_openssl_listing(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    for field in (
        "type", "name", "version", "description", "homepage_url",
        "download_url", "copyright", "vcs_url", "code_view_url",
        "bug_tracking_url", "extracted_license_statement", "size",
    ):
        assert getattr(r, field) == e[field], field
    assert r.release_date == e["release_date"]


def test_dockerhub_summary_matches_reference_expected(spark):
    """A repo doc with NO tags maps to the single summary row the
    library-JSON mapper yields (miners/dockerhub.py:174-198), using the
    real elixir summary fixture."""
    from purldb_spark.sources.miners6 import map_dockerhub_docs

    summary = json.loads(_load("dockerhub/elixir.json"))
    expected = json.loads(_load("dockerhub/expected_dockerhubmapper.json"))
    e = expected[0] if isinstance(expected, list) else expected
    doc = json.dumps({"summary": summary, "tags": []})
    rows = map_dockerhub_docs(
        spark.createDataFrame(
            [(e["name"], None, doc)], "name string, namespace string, doc string"
        )
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"] is None
    assert r.description == e["description"]
    assert r.homepage_url == e["homepage_url"]
    assert r.download_url is None


def test_gstreamer_url_matches_reference_expected(spark):
    from purldb_spark.sources.miners9 import map_gstreamer_urls

    expected = json.loads(_load("gstreamer/mapper_build_from_url-expected"))
    e = expected[0] if isinstance(expected, list) else expected
    rows = map_gstreamer_urls(
        spark.createDataFrame([(e["download_url"],)], "uri string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.purl == e["purl"]
    assert r.download_url == e["download_url"]
    assert r.homepage_url == e["homepage_url"]


def test_nuget_catalog_entry_matches_reference_expected(spark):
    from purldb_spark.sources.miners2 import map_nuget_docs

    doc = _load("nuget/entityframework2.json")
    expected = json.loads(_load("nuget/nuget_mapper_expected.json"))
    e = expected[0] if isinstance(expected, list) else expected
    rows = map_nuget_docs(spark.createDataFrame([(doc,)], "doc string")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    # summary == description here -> the identical long part is dropped
    assert r.description == e["description"]
    assert r.homepage_url == e["homepage_url"]
    assert r.declared_license == e["extracted_license_statement"]
    assert r.authors == [p["name"] for p in e["parties"]]
    assert r.keywords == e["keywords"]


def test_pypi_version_api_matches_reference_expected(spark):
    """VersionAPI parse over the REAL django pypi.json fixture
    (packagedb/tests/testfiles/package_manager_data/pypi.json): spot
    values from the reference's own expected list
    (test_package_managers.py:78-102)."""
    from purldb_spark.sources.version_apis import parse_pypi

    doc = open(
        "/root/reference/packagedb/tests/testfiles/package_manager_data/pypi.json"
    ).read()
    rows = parse_pypi(
        spark.createDataFrame([("django", doc)], "pkg string, doc string")
    ).collect()
    by_ver = {r.version: r for r in rows}
    # the reference's expected list has exactly 14 versions
    assert len(rows) == 14
    spot = {
        "1.1.3": "2010-12-23",
        "1.1.4": "2011-02-09",
        "1.10rc1": "2016-07-18",
        "1.10.8": "2017-09-05",
    }
    for v, day in spot.items():
        assert v in by_ver, v
        assert str(by_ver[v].release_date)[:10] == day, v


def test_nuget_gem_version_apis_match_reference_expected(spark):
    """NuGet + RubyGems VersionAPI parses over the real fixtures vs the
    reference's expected lists (test_package_managers.py:46-121)."""
    from purldb_spark.sources.version_apis import parse_nuget, parse_rubygems

    base = "/root/reference/packagedb/tests/testfiles/package_manager_data"
    ndoc = open(f"{base}/nuget-data.json").read()
    nrows = parse_nuget(
        spark.createDataFrame([("pkg", ndoc)], "pkg string, doc string")
    ).collect()
    nspot = {
        "2.1.0": "2011-01-22",
        "3.5.0-beta2": "2015-01-01",
        "3.5.1": "2015-01-23",
    }
    assert len(nrows) == 12
    by_ver = {r.version: r for r in nrows}
    for v, day in nspot.items():
        assert str(by_ver[v].release_date)[:10] == day, v

    gdoc = open(f"{base}/gem.json").read()
    grows = parse_rubygems(
        spark.createDataFrame([("rails", gdoc)], "pkg string, doc string")
    ).collect()
    assert {(r.version, str(r.release_date)[:10]) for r in grows} == {
        ("7.0.2.3", "2022-03-08"),
        ("7.0.2.2", "2022-02-11"),
    }


@pytest.mark.parametrize(
    "doc_file,expected_file",
    [
        ("pypi/cage_1.1.2.json", "pypi/expected-CAGE-1.1.2.json"),
        ("pypi/cage_1.1.3.json", "pypi/expected-CAGE-1.1.3.json"),
        (
            "pypi/boolean.py-2.0.dev3.json",
            "pypi/expected-boolean.py-2.0.dev3.json",
        ),
    ],
)
def test_pypi_mapper_more_reference_expected(spark, doc_file, expected_file):
    """Widen the pypi parity net beyond lxml: CAGE (no urls entries -> the
    metadata-only row) and boolean.py (3 url rows with md5/size)."""
    from purldb_spark.sources.miners import map_pypi_docs, parse_pypi_docs

    doc = _load(doc_file)
    expected = json.loads(_load(expected_file))
    rows = map_pypi_docs(
        parse_pypi_docs(spark.createDataFrame([(doc,)], "doc string"))
    ).collect()
    assert len(rows) == len(expected)
    by_url = {r.download_url: r for r in rows}
    for e in expected:
        r = by_url[e["download_url"]]
        assert r.type == e["type"]
        assert r.name == e["name"]
        assert r.version == e["version"]
        assert r.description == e["description"]
        assert r.homepage_url == e["homepage_url"]
        assert r.md5 == e.get("md5")
        assert r.size == e.get("size")
        assert r.datasource_id == e["datasource_id"]
        stmt = e.get("extracted_license_statement")
        if stmt is None:
            assert r.declared_license is None
        else:
            # the reference renders the statement as a YAML list block
            # ("- GPL\n"); ours keeps the raw value(s) joined with '; '
            assert r.declared_license == "; ".join(
                l.lstrip("- ").strip() for l in stmt.splitlines()
            )


@pytest.mark.parametrize(
    "listing,expected_file,source_uri",
    [
        (
            "debian/lslr/ls-lR_debian",
            "debian/lslr/ls-lR_debian.gz-expected.json",
            "http://ftp.debian.org/debian/ls-lR.gz",
        ),
        (
            "debian/lslr/ls-lR_ubuntu",
            "debian/lslr/ls-lR_ubuntu.gz-expected.json",
            "http://archive.ubuntu.com/ubuntu/ls-lR.gz",
        ),
    ],
)
def test_debian_lslr_visitor_matches_reference_expected(
    spark, listing, expected_file, source_uri
):
    """Replay the reference's own ls-lR fixtures (debian + ubuntu mirrors)
    through parse_lslr + debian_lslr_uris and compare the URI records with
    the reference's expected JSON."""
    from purldb_spark.sources.listings import parse_lslr
    from purldb_spark.sources.lslr_debian import debian_lslr_uris

    lines = spark.read.text(os.path.join(_TESTFILES, listing))
    entries = parse_lslr(lines)
    rows = debian_lslr_uris(entries, source_uri).collect()
    expected = json.loads(_load(expected_file))

    got = {
        r.uri: (r.package_url, r.file_name, r.size, r.date) for r in rows
    }
    want = {
        e["uri"]: (e["package_url"], e["file_name"], e["size"], e["date"])
        for e in expected
    }
    assert got == want


def test_cpan_meta_mapper_matches_reference_expected(spark):
    """Replay Regexp-Common-2016010701.meta through the cpan meta mapper
    against expected_json_cpanmapper.json (the reference's own pairing;
    its test harness passes a 'metadata...data' test URI, hence the
    'tar.gzdata' suffix in the expected download_url)."""
    from purldb_spark.sources.miners7 import map_cpan_meta_docs

    doc = _load("cpan/Regexp-Common-2016010701.meta")
    expected = json.loads(_load("cpan/expected_json_cpanmapper.json"))[0]
    uri = (
        "http://www.cpan.org/authors/id/A/AB/ABIGAIL/"
        "Regexp-Common-2016010701.metadata"
    )
    rows = map_cpan_meta_docs(
        spark.createDataFrame([(doc, uri)], "doc string, uri string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == expected["type"]
    assert r.name == expected["name"]
    assert r.version == expected["version"]
    assert r.purl == expected["purl"]
    assert r.description == expected["description"]
    assert r.download_url == expected["download_url"]
    assert r.extracted_license_statement == expected["declared_license_expression"]
    assert r.vcs_url == expected["vcs_url"]
    assert r.parties == expected["parties"][0]["name"]
    assert r.party_emails == expected["parties"][0]["email"]
    assert sorted(r.keywords.split("; ")) == sorted(expected["keywords"])


def test_apache_dist_findls_matches_reference_expected(spark, tmp_path):
    """Replay the reference's find-ls.gz fixture through parse_find_ls +
    apache_dist_uris and compare uri/size/visited with the expected URI
    records. The expected 'package_url' is the purl COMPONENT tuple
    (type, ns, name, version, q, sub) — compare name/version from it."""
    import gzip as _gz

    from purldb_spark.sources.apache_dist import apache_dist_uris
    from purldb_spark.sources.listings import parse_find_ls

    src = os.path.join(_TESTFILES, "apache/find-ls.gz")
    txt = _gz.open(src, "rt").read()
    plain = tmp_path / "find-ls.txt"
    plain.write_text(txt)

    entries = parse_find_ls(spark.read.text(str(plain)))
    rows = apache_dist_uris(
        entries, "http://apache.org/dist/zzz/find-ls.gz"
    ).collect()
    expected = json.loads(_load("apache/find-ls.gz_uris-expected.json"))

    got = {r.uri: r for r in rows}
    assert set(got) == {e["uri"] for e in expected}
    for e in expected:
        r = got[e["uri"]]
        assert r.size == e["size"]
        assert r.visited == e["visited"]
        ptype, _ns, pname, pversion, _q, _sub = e["package_url"]
        want = f"pkg:{ptype}/{pname}" + (f"@{pversion}" if pversion else "")
        assert r.package_url == want


@pytest.mark.parametrize(
    "page,expected_file,base_uri",
    [
        (
            "openssl/Index.html",
            "openssl/expected_uri_openssl_index.json",
            "https://ftp.openssl.org/",
        ),
        (
            "openssl/Indexof_source.html",
            "openssl/expected_uri_openssl_sourceindex.json",
            "https://ftp.openssl.org/source/",
        ),
    ],
)
def test_openssl_html_index_matches_reference_expected(
    spark, page, expected_file, base_uri
):
    """Replay the reference's HTML directory-index fixtures through the
    Spark html_index visitor; expected dates are 'YYYY-MM-DD HH:MM:SS'
    strings serialized from the parsed naive datetimes."""
    from purldb_spark.sources.html_index import html_index_uris

    html = _load(page)
    expected = json.loads(_load(expected_file))
    rows = html_index_uris(
        spark.createDataFrame([(html, base_uri)], "html string, base_uri string")
    ).collect()
    got = {r.uri: r for r in rows}
    want = {e["uri"]: e for e in expected}
    assert set(got) == set(want)
    for uri, e in want.items():
        r = got[uri]
        # the reference yields size as a string (openssl.py:66-83)
        want_size = e["size"] if e["size"] is None else int(e["size"])
        assert r.size == want_size, uri
        assert r.package_url == e["package_url"], uri
        assert r.file_name == e["file_name"], uri
        if e["date"] is None:
            assert r.date is None, uri
        else:
            assert r.date + ":00" == e["date"], uri


@pytest.mark.parametrize(
    "pom_file,expected_file",
    [
        ("maven/mapper/axis-1.4.pom", "maven/mapper/axis-1.4.pom.package.json"),
        (
            "maven/mapper/commons-pool-1.5.7.pom",
            "maven/mapper/commons-pool-1.5.7.pom.package.json",
        ),
        (
            "maven/mapper/mysql-connector-java-5.1.27.pom",
            "maven/mapper/mysql-connector-java-5.1.27.pom.package.json",
        ),
        (
            "maven/mapper/commons-jaxrs-1.21.pom",
            "maven/mapper/commons-jaxrs-1.21.pom.package.json",
        ),
    ],
)
def test_maven_pom_full_mapper_matches_reference_expected(
    spark, pom_file, expected_file
):
    """Replay the reference's POM mapper fixtures through
    pom_packages_full: coordinates, urls, scm-derived vcs, and the full
    dependency array with scope/flag semantics."""
    from purldb_spark.sources.collectors import pom_packages_full

    pom = _load(pom_file)
    e = json.loads(_load(expected_file))
    e = e[0] if isinstance(e, list) else e
    rows = pom_packages_full(
        spark.createDataFrame([(pom,)], "pom_text string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.namespace == e["namespace"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.purl == e["purl"]
    assert r.description == e["description"]
    assert r.homepage_url == e["homepage_url"]
    assert r.vcs_url == e["vcs_url"]
    assert r.code_view_url == e["code_view_url"]
    assert r.repository_download_url == e["repository_download_url"]
    assert r.api_data_url == e["api_data_url"]
    assert r.repository_homepage_url == e["repository_homepage_url"]
    assert [r.source_package] == e["source_packages"]
    assert r.primary_language == e["primary_language"]
    assert r.datasource_id == e["datasource_id"]
    want_deps = [
        (
            d["purl"],
            d["extracted_requirement"],
            d["scope"],
            d["is_runtime"],
            d["is_optional"],
            d["is_pinned"],
        )
        for d in e["dependencies"]
    ]
    got_deps = [
        (
            d["purl"],
            d["extracted_requirement"],
            d["scope"],
            d["is_runtime"],
            d["is_optional"],
            d["is_pinned"],
        )
        for d in r.dependencies
    ]
    assert sorted(got_deps) == sorted(want_deps)


@pytest.mark.parametrize(
    "doc_file,expected_file",
    [
        ("sourceforge/monoql.json", "sourceforge/mapper_omonoql_expected.json"),
        ("sourceforge/niftyphp.json", "sourceforge/mapper_niftyphp_expected.json"),
        ("sourceforge/odanur.json", "sourceforge/mapper_odanur_expected.json"),
        (
            "sourceforge/openstunts.json",
            "sourceforge/mapper_openstunts_expected.json",
        ),
    ],
)
def test_sourceforge_mapper_matches_reference_expected(
    spark, doc_file, expected_file
):
    """Replay the reference's four sourceforge project fixtures through
    map_sourceforge_docs; license statements compare against the YAML list
    block the reference renders ('- short\\n- Full Name\\n')."""
    from purldb_spark.sources.miners3 import map_sourceforge_docs

    doc = _load(doc_file)
    e = json.loads(_load(expected_file))
    e = e[0] if isinstance(e, list) else e
    rows = map_sourceforge_docs(
        spark.createDataFrame([(doc,)], "doc string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.purl == e["purl"]
    assert r.description == e["description"]
    assert r.homepage_url == e["homepage_url"]
    assert (r.primary_language or None) == e.get("primary_language")
    assert sorted(r.keywords or []) == sorted(e.get("keywords") or [])
    stmt = e.get("extracted_license_statement")
    want_lics = (
        [l.lstrip("- ").strip() for l in stmt.splitlines()] if stmt else []
    )
    assert list(r.extracted_license_statement or []) == want_lics
    want_parties = [p["name"] for p in e.get("parties") or []]
    assert sorted(r.contributors or []) == sorted(want_parties)


def test_dockerhub_library_mapper_matches_reference_expected(spark):
    """Replay the elixir library JSON through the dockerhub mapper
    (summary-only row: no tags -> no version) vs
    expected_dockerhubmapper.json."""
    from purldb_spark.sources.miners6 import map_dockerhub_docs

    raw = json.loads(_load("dockerhub/elixir.json"))
    e = json.loads(_load("dockerhub/expected_dockerhubmapper.json"))
    e = e[0] if isinstance(e, list) else e
    doc = json.dumps({"summary": raw})
    rows = map_dockerhub_docs(
        spark.createDataFrame(
            [(doc, "elixir", None)], "doc string, name string, namespace string"
        )
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.purl == e["purl"]
    assert r.version is None
    assert r.homepage_url == e["homepage_url"]
    assert r.description == e["description"]


def test_eclipse_mapper_matches_reference_expected(spark):
    """Replay birt.json through the eclipse mapper vs
    eclipse_birt_expected.json."""
    from purldb_spark.sources.miners4 import map_eclipse_docs

    doc = _load("eclipse/birt.json")
    e = json.loads(_load("eclipse/eclipse_birt_expected.json"))
    e = e[0] if isinstance(e, list) else e
    rows = map_eclipse_docs(
        spark.createDataFrame([(doc,)], "doc string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.purl == e["purl"]
    assert r.description == e["description"]
    assert r.homepage_url == e["homepage_url"]
    assert r.bug_tracking_url == e["bug_tracking_url"]
    assert r.download_url == e["download_url"]
    stmt = e["extracted_license_statement"]
    assert [r.extracted_license_statement] == [
        l.lstrip("- ").strip() for l in stmt.splitlines()
    ]


@pytest.mark.parametrize(
    "doc_file,purl,expected_file",
    [
        (
            "golang/glog.json",
            "pkg:golang/github.com/golang/glog"
            "?vcs_repository=https://github.com/golang/glog",
            "golang/glog_expected.json",
        ),
        (
            "golang/math3.json",
            "pkg:bitbucket/bitbucket.org/zombiezen/yaml"
            "?vcs_repository=https://bitbucket.org/zombiezen/yaml",
            "golang/math3_expected.json",
        ),
        (
            "golang/winter.json",
            "pkg:golang/winterdrache.de/bindings/sdl",
            "golang/winter_expected.json",
        ),
    ],
)
def test_godoc_api_mapper_matches_reference_expected(
    spark, doc_file, purl, expected_file
):
    """Replay the reference's three build_golang_package fixtures (github,
    bitbucket, non-well-known host) through map_godoc_api_docs."""
    from purldb_spark.sources.miners2 import map_godoc_api_docs

    doc = _load(doc_file)
    e = json.loads(_load(expected_file))
    e = e[0] if isinstance(e, list) else e
    rows = map_godoc_api_docs(
        spark.createDataFrame([(doc, purl)], "doc string, purl string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.namespace == e["namespace"]
    assert r.name == e["name"]
    assert r.purl == e["purl"]
    assert r.description == e["description"]
    assert r.homepage_url == e["homepage_url"]
    assert r.vcs_url == e.get("vcs_url")
    assert r.primary_language == e["primary_language"]


@pytest.mark.parametrize(
    "doc_file,expected_file",
    [
        ("bitbucket/map/repository.json", "bitbucket/map/repository_expected.json"),
        ("bitbucket/map/tweakmsg.json", "bitbucket/map/tweakmsg_expected.json"),
    ],
)
def test_bitbucket_repo_mapper_matches_reference_expected(
    spark, doc_file, expected_file
):
    """Replay the reference's bitbucket repo fixtures (hg-scm repos, with
    and without issue tracker) through map_bitbucket_repo_docs."""
    from purldb_spark.sources.miners4 import map_bitbucket_repo_docs

    doc = _load(doc_file)
    e = json.loads(_load(expected_file))
    e = e[0] if isinstance(e, list) else e
    rows = map_bitbucket_repo_docs(
        spark.createDataFrame([(doc,)], "doc string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.namespace == e["namespace"]
    assert r.name == e["name"]
    assert r.purl == e["purl"]
    assert (r.description or None) == e.get("description")
    assert r.homepage_url == e["homepage_url"]
    assert r.code_view_url == e["code_view_url"]
    assert r.vcs_url == e["vcs_url"]
    assert r.bug_tracking_url == e.get("bug_tracking_url")
    assert (r.primary_language or "") == e.get("primary_language", "")
    assert r.owner == e["parties"][0]["name"]


@pytest.mark.parametrize(
    "doc_file,expected_file",
    [
        (
            "bower/example1_bower.json",
            "bower/expected_mapper_example1_bower.json",
        ),
    ],
)
def test_bower_mapper_matches_reference_expected(spark, doc_file, expected_file):
    """Replay the reference's bower.json mapper fixture: versioned purl,
    'label: Name' author prefix stripping, licenses string."""
    from purldb_spark.sources.miners6 import map_bower_docs

    doc = _load(doc_file)
    e = json.loads(_load(expected_file))
    e = e[0] if isinstance(e, list) else e
    rows = map_bower_docs(
        spark.createDataFrame([(doc,)], "doc string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.purl == e["purl"]
    assert r.homepage_url == e["homepage_url"]
    assert sorted(r.keywords.split("; ")) == sorted(e["keywords"])
    stmt = e["extracted_license_statement"]
    assert [r.extracted_license_statement] == [
        l.lstrip("- ").strip() for l in stmt.splitlines()
    ]
    assert r.parties == "; ".join(p["name"] for p in e["parties"])


@pytest.mark.parametrize(
    "page,expected_file,uri,purl",
    [
        (
            "cran/CRAN_Package_ANN2.html",
            "cran/mapper_ANN2_expected.json",
            "https://cloud.r-project.org/web/packages/ANN2/index.html",
            "pkg:cran/ANN2@1.1",
        ),
        (
            "cran/CRAN_Package_abe.html",
            "cran/mapper_abe_expected.json",
            "https://cloud.r-project.org/web/packages/abe/index.html",
            "pkg:cran/abe@3.0.1",
        ),
    ],
)
def test_cran_html_mapper_matches_reference_expected(
    spark, page, expected_file, uri, purl
):
    """Replay the reference's CRAN package-page fixtures through
    map_cran_html_docs: one row per download URL, entity-decoded
    maintainer email, href-based license statements."""
    from purldb_spark.sources.miners3 import map_cran_html_docs

    html = _load(page)
    expected = json.loads(_load(expected_file))
    rows = map_cran_html_docs(
        spark.createDataFrame(
            [(html, uri, purl)], "html string, uri string, purl string"
        )
    ).collect()
    assert len(rows) == len(expected)
    got = {r.download_url: r for r in rows}
    for e in expected:
        r = got[e.get("download_url")]
        assert r.type == e["type"]
        assert r.name == e["name"]
        assert r.purl == e["purl"]
        assert r.version == e["version"]
        assert r.description == e["description"]
        assert r.homepage_url == e["homepage_url"]
        assert r.release_date == e["release_date"]
        stmt = e.get("extracted_license_statement")
        want_lics = (
            [l.lstrip("- ").strip() for l in stmt.splitlines()] if stmt else []
        )
        assert list(r.extracted_license_statement or []) == want_lics
        parties = {p["role"]: p for p in e.get("parties") or []}
        if "author" in parties:
            assert r.author == parties["author"]["name"]
        if "maintainer" in parties:
            assert r.maintainer == parties["maintainer"]["name"]
            assert r.maintainer_email == parties["maintainer"]["email"]


@pytest.mark.parametrize(
    "meta_file,expected_file,dl",
    [
        (
            "rubygems/0mq-0.4.1.gem.metadata",
            "rubygems/0mq-0.4.1.gem.package.json",
            "https://rubygems.org/downloads/0mq-0.4.1.gem",
        ),
        (
            "rubygems/a_okay-0.1.0.gem.metadata",
            "rubygems/a_okay-0.1.0.gem.package.json",
            "https://rubygems.org/downloads/a_okay-0.1.0.gem",
        ),
    ],
)
def test_gemspec_yaml_mapper_matches_reference_expected(
    spark, meta_file, expected_file, dl
):
    """Replay the gemspec YAML (the metadata file inside .gem archives)
    through map_gemspec_yaml_docs vs the reference's package.json."""
    from purldb_spark.sources.miners2 import map_gemspec_yaml_docs

    meta = _load(meta_file)
    e = json.loads(_load(expected_file))
    e = e[0] if isinstance(e, list) else e
    rows = map_gemspec_yaml_docs(
        spark.createDataFrame(
            [(meta, dl)], "metadata string, download_url string"
        )
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.purl == e["purl"]
    assert r.description == e.get("description")
    assert r.homepage_url == e.get("homepage_url")
    assert r.download_url == e["download_url"]
    assert r.release_date == e.get("release_date")
    stmt = e.get("extracted_license_statement")
    want_lics = (
        [l.lstrip("- ").strip() for l in stmt.splitlines()] if stmt else []
    )
    assert list(r.extracted_license_statement or []) == want_lics
    assert list(r.authors or []) == [
        p["name"] for p in e.get("parties") or []
    ]
    want_deps = [
        (d["purl"], d["extracted_requirement"], d["scope"])
        for d in e.get("dependencies") or []
    ]
    got_deps = [
        (d["purl"], d["extracted_requirement"], d["scope"])
        for d in r.dependencies
    ]
    assert got_deps == want_deps


def test_googlecode_projectjson_mapper_matches_reference_expected(spark):
    """Replay the archive project.json fixture through the googlecode
    project-json mapper (description raw, ancestorRepo as vcs_url,
    domain as namespace) vs the reference's expected mapping."""
    from purldb_spark.sources.miners9 import map_googlecode_v1_docs

    doc = _load("googlecode/v2_apache-extras.org_124799961-qian_project.json")
    e = json.loads(
        _load(
            "googlecode/mapper_expected_v2_apache-extras.org_"
            "124799961-qian_project.json"
        )
    )
    e = e[0] if isinstance(e, list) else e
    rows = map_googlecode_v1_docs(
        spark.createDataFrame([(doc,)], "doc string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.namespace == e["namespace"]
    assert r.purl == e["purl"]
    assert r.description == e["description"]
    assert r.extracted_license_statement == e["extracted_license_statement"]
    assert r.vcs_url == e["vcs_url"]
    assert [r.datasource_id] == e["datasource_ids"]
    assert list(r.keywords or []) == (e.get("keywords") or [])


def test_haxe_mapper_matches_reference_expected(spark):
    """Replay openfl's haxelib.json through the haxe mapper vs the
    reference's expected package (percent-encoded dependency purls)."""
    from purldb_spark.sources.miners6 import map_haxe_docs

    doc = _load("haxe/project_package.json")
    e = json.loads(_load("haxe/project_package.json-expected"))
    e = e[0] if isinstance(e, list) else e
    rows = map_haxe_docs(
        spark.createDataFrame([(doc,)], "doc string")
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.purl == e["purl"]
    assert r.description == e["description"]
    assert r.download_url == e["download_url"]
    assert r.extracted_license_statement == e["extracted_license_statement"]
    assert sorted(r.parties.split("; ")) == sorted(
        p["name"] for p in e["parties"]
    )
    assert sorted(r.dependencies.split("; ")) == sorted(
        d["purl"] for d in e["dependencies"]
    )


def test_maven_metadata_visitor_matches_reference_expected(spark):
    """Replay maven-metadata.xml through maven_metadata_uris vs the
    reference's expected URI records (jar+sources scan-only, pom visited)."""
    from purldb_spark.sources.collectors import maven_metadata_uris

    xml = _load("maven/maven-metadata/maven-metadata.xml")
    expected = json.loads(_load("maven/maven-metadata/expected_maven_xml.json"))
    src = "https://repo1.maven.org/maven2/st/digitru/identity-core/maven-metadata.xml"
    rows = maven_metadata_uris(
        spark.createDataFrame([(xml, src)], "xml string, source_uri string")
    ).collect()
    got = {(r.uri, r.package_url, r.visited) for r in rows}
    want = {(e["uri"], e["package_url"], e["visited"]) for e in expected}
    assert got == want


def test_sourceforge_sitemap_visitors_match_reference_expected(spark):
    """Replay sitemap.xml (index -> 148 sub-sitemaps) and sitemap-1.xml
    (page -> 37 project API URIs with purls) through the sitemap
    visitors."""
    from purldb_spark.sources.sitemaps import (
        sitemap_locs,
        sourceforge_sitemap_page_uris,
    )

    idx = _load("sourceforge/sitemap.xml")
    exp_idx = json.loads(_load("sourceforge/expected_sf_sitemap_new.json"))
    rows = sitemap_locs(
        spark.createDataFrame(
            [(idx, "https://sourceforge.net/sitemap.xml")],
            "xml string, source_uri string",
        )
    ).collect()
    assert [r.uri for r in rows] == [e["uri"] for e in exp_idx]

    page = _load("sourceforge/sitemap-1.xml")
    exp_page = json.loads(_load("sourceforge/expected_sf_sitemap_page_new.json"))
    rows = sourceforge_sitemap_page_uris(
        spark.createDataFrame(
            [(page, "http://sourceforge.net/sitemap-1.xml")],
            "xml string, source_uri string",
        )
    ).collect()
    got = {(r.uri, r.package_url) for r in rows}
    want = {(e["uri"], e["package_url"]) for e in exp_page}
    assert got == want


def test_eclipse_release_visitor_matches_reference_expected(spark):
    """Replay Neon_R.html through the eclipse release visitor; the
    reference's nested-div iteration duplicates every URI ~13x, so parity
    is asserted on the DISTINCT (uri, file_name, package_url) set."""
    from purldb_spark.sources.html_index import eclipse_release_uris

    html = _load("eclipse/Neon_R.html")
    expected = json.loads(_load("eclipse/Neon_R-expected.json"))
    rows = eclipse_release_uris(
        spark.createDataFrame(
            [(html, "http://www.eclipse.org/downloads/packages/release/Neon/R")],
            "html string, source_uri string",
        )
    ).collect()
    got = {(r.uri, r.file_name, r.package_url) for r in rows}
    want = {(e["uri"], e["file_name"], e["package_url"]) for e in expected}
    assert got == want


def test_dockerhub_explore_visitor_matches_reference_expected(spark):
    """Replay the explore page through dockerhub_explore_uris: html + v2
    API URI per official image, plus the next-page URI."""
    from purldb_spark.sources.html_index import dockerhub_explore_uris

    html = _load("dockerhub/Explore_DockerHub_Page1.html")
    expected = json.loads(_load("dockerhub/visitor_explore_page1_expected"))
    rows = dockerhub_explore_uris(
        spark.createDataFrame(
            [(html, "https://hub.docker.com/explore/?page=1")],
            "html string, source_uri string",
        )
    ).collect()
    got = {(r.uri, r.package_url) for r in rows}
    want = {(e["uri"], e["package_url"]) for e in expected}
    assert got == want
    assert len(rows) == len(expected)


def test_eclipse_packages_visitor_matches_reference_expected(spark):
    from purldb_spark.sources.html_index import eclipse_packages_uris

    html = _load("eclipse/All_Releases_Packages.html")
    expected = json.loads(_load("eclipse/eclipse_packages_expected"))
    rows = eclipse_packages_uris(
        spark.createDataFrame(
            [(html, "http://www.eclipse.org/downloads/packages/all")],
            "html string, source_uri string",
        )
    ).collect()
    got = {(r.uri, r.package_url) for r in rows}
    want = {(e["uri"], e["package_url"]) for e in expected}
    assert got == want


def test_cpan_author_dir_visitor_matches_reference_expected(spark):
    """Replay the LDS author directory page (1338 file anchors) through
    cpan_author_dir_uris, including the reference's version-dot quirk."""
    from purldb_spark.sources.html_index import cpan_author_dir_uris

    html = _load("cpan/Index_of_authors_id_L_LD_LDS.html")
    expected = json.loads(_load("cpan/expected_html_files.json"))
    rows = cpan_author_dir_uris(
        spark.createDataFrame(
            [(html, "http://www.cpan.org/authors/id/L/LD/LDS/")],
            "html string, source_uri string",
        )
    ).collect()
    got = {(r.uri, r.package_url) for r in rows}
    want = {(e["uri"], e["package_url"]) for e in expected}
    assert got == want


def test_cpan_modules_visitor_matches_reference_expected(spark):
    from purldb_spark.sources.html_index import cpan_modules_uris

    html = _load("cpan/Modules on CPAN alphabetically.html")
    expected = json.loads(_load("cpan/expected_html_modules.json"))
    rows = cpan_modules_uris(
        spark.createDataFrame(
            [(html, "http://www.cpan.org/modules/01modules.index.html")],
            "html string, source_uri string",
        )
    ).collect()
    assert {r.uri for r in rows} == {e["uri"] for e in expected}


@pytest.mark.parametrize(
    "page,expected_file,src",
    [
        (
            "googlecode/v2_api/GoogleCodeProjectHosting.htm",
            "googlecode/v2_api/expected_googleprojects.json",
            "https://code.google.com/archive/search?q=domain:code.google.com",
        ),
        (
            "googlecode/v2_api/GoogleCodeProjectHosting_page2.htm",
            "googlecode/v2_api/expected_googleproject_page2.json",
            "https://code.google.com/archive/search?q=domain:code.google.com&page=2",
        ),
    ],
)
def test_googlecode_search_visitor_matches_reference_expected(
    spark, page, expected_file, src
):
    from purldb_spark.sources.html_index import googlecode_search_uris

    html = _load(page)
    expected = json.loads(_load(expected_file))
    rows = googlecode_search_uris(
        spark.createDataFrame([(html, src)], "html string, source_uri string")
    ).collect()
    got = {(r.uri, r.package_url) for r in rows}
    want = {(e["uri"], e["package_url"]) for e in expected}
    assert got == want


def test_googlecode_downloads_visitor_matches_reference_expected(spark):
    from purldb_spark.sources.miners9 import googlecode_downloads_uris

    doc = _load("googlecode/v2_api/downloads-page-1.json")
    expected = json.loads(_load("googlecode/v2_api/hg4j_download_expected.json"))
    src = (
        "https://storage.googleapis.com/google-code-archive/v2/"
        "code.google.com/hg4j/downloads-page-1.json"
    )
    rows = googlecode_downloads_uris(
        spark.createDataFrame([(doc, src)], "doc string, uri string")
    ).collect()
    got = {
        (r.uri, r.package_url, r.file_name, r.size, r.date, r.sha1)
        for r in rows
    }
    want = {
        (
            e["uri"],
            e["package_url"],
            e["file_name"],
            e["size"],
            e["date"],
            e["sha1"],
        )
        for e in expected
    }
    assert got == want


def test_gc_archive_zip_visitor_matches_reference_expected(spark):
    """Replay the google-code-archive.txt.zip fixture through the zip
    line extractor + URI transform."""
    from purldb_spark.sources.gc_archive_zip import (
        gc_archive_uris,
        zip_text_lines,
    )

    src = "https://storage.googleapis.com/google-code-archive/google-code-archive.txt.zip"
    with open(
        os.path.join(_TESTFILES, "googlecode/google-code-archive.txt.zip"),
        "rb",
    ) as fh:
        blob = fh.read()
    blobs = spark.createDataFrame(
        [(src, bytearray(blob))], "source_uri string, content binary"
    )
    rows = gc_archive_uris(zip_text_lines(blobs)).collect()
    expected = json.loads(
        _load("googlecode/expected_google-code-archive.txt.zip.json")
    )
    got = {(r.uri, r.package_url) for r in rows}
    want = {(e["uri"], e["package_url"]) for e in expected}
    assert got == want


def test_npm_changes_visitor_matches_reference_expected(spark):
    """Replay the replicate _changes page through npm_changes_uris:
    next-index URI + 98 pre-visited package records with compacted doc
    passthrough."""
    from purldb_spark.sources.npm_changes import npm_changes_uris

    raw = _load("npm/replicate_doc1.json")
    src = (
        "https://replicate.npmjs.com/registry/_changes"
        "?include_docs=true&limit=1000&since=2300000"
    )
    rows = npm_changes_uris(
        spark.createDataFrame([(raw, src)], "doc string, source_uri string")
    ).collect()
    expected = json.loads(_load("npm/expected_doclimit_visitor.json"))
    assert len(rows) == len(expected)
    got = {r.uri: r for r in rows}
    for e in expected:
        r = got[e["uri"]]
        assert r.package_url == e["package_url"], e["uri"]
        assert r.visited == e["visited"], e["uri"]
        if e["data"] is None:
            assert r.data is None
        else:
            assert json.loads(r.data) == json.loads(e["data"]), e["uri"]


def test_dockerhub_search_visitor_matches_reference_expected(spark):
    from purldb_spark.sources.miners6 import dockerhub_search_uris

    doc = _load("dockerhub/search.json")
    src = "https://index.docker.io/v1/search?q=1a&n=100&page=2"
    rows = dockerhub_search_uris(
        spark.createDataFrame([(doc, src)], "doc string, uri string")
    ).collect()
    expected = json.loads(_load("dockerhub/visitor_search_expected"))
    got = {(r.uri, r.package_url) for r in rows}
    want = {(e["uri"], e["package_url"]) for e in expected}
    assert got == want


def test_dockerhub_tags_mapper_matches_reference_expected(spark):
    """Replay the nginx summary+tags fixture through the per-tag path of
    the dockerhub mapper vs expected-nginx1.json."""
    from purldb_spark.sources.miners6 import map_dockerhub_docs

    meta = json.loads(_load("dockerhub/nginx.json"))
    doc = json.dumps(
        {"summary": meta["summary"], "tags": meta["tags_metadata"]}
    )
    e = json.loads(_load("dockerhub/expected-nginx1.json"))
    e = e[0] if isinstance(e, list) else e
    rows = map_dockerhub_docs(
        spark.createDataFrame(
            [(doc, "nginx", None)],
            "doc string, name string, namespace string",
        )
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.purl == e["purl"]
    assert r.sha256 == e["sha256"]
    assert r.size == e["size"]
    assert r.parties == e["parties"][0]["name"]
    assert r.homepage_url == e["homepage_url"]
    assert r.download_url == e["download_url"]
    assert r.datasource_id == e["datasource_id"]


def test_fdroid_mapper_matches_reference_expected_full_index(spark):
    """Replay every visited F-Droid package doc (36 packages from
    index-v2) through map_fdroid_docs and compare the full 166-row mapped
    output with the reference's expected (keyed by download_url)."""
    from purldb_spark.sources.miners3 import map_fdroid_docs

    visited = json.loads(_load("fdroid/index-v2-visited.json"))
    expected = json.loads(_load("fdroid/index-v2-visited-expected-mapped.json"))
    inputs = [
        (v["data"], v["package_url"].replace("pkg:fdroid/", ""))
        for v in visited
        if v.get("data")
    ]
    rows = map_fdroid_docs(
        spark.createDataFrame(inputs, "doc string, name string")
    ).collect()
    assert len(rows) == len(expected)
    got = {r.download_url: r for r in rows}
    for e in expected:
        r = got[e["download_url"]]
        assert r.type == e["type"]
        assert r.name == e["name"]
        assert r.version == e["version"]
        assert r.purl == e["purl"]
        assert r.sha256 == e.get("sha256")
        assert (str(r.size) if r.size is not None else None) == (
            str(e["size"]) if e.get("size") is not None else None
        )
        assert r.vcs_url == e.get("vcs_url")
        assert r.bug_tracking_url == e.get("bug_tracking_url")
        assert r.extracted_license_statement == e.get(
            "extracted_license_statement"
        )
        assert r.repository_homepage_url == e.get("repository_homepage_url")


def test_freebsd_mapper_matches_reference_expected(spark):
    """Replay the FreeBSD compact-manifest index fixture (18 packages)
    through map_freebsd_docs vs the reference's mapped expected."""
    from purldb_spark.sources.miners8 import map_freebsd_docs

    text = _load("freebsd/mapper_input1")
    expected = json.loads(_load("freebsd/indexfile_expected_mapper.json"))
    rows = map_freebsd_docs(
        spark.createDataFrame([(text,)], "packagesite string")
    ).collect()
    assert len(rows) == len(expected)
    got = {r.purl: r for r in rows}
    for e in expected:
        r = got[e["purl"]]
        assert r.type == e["type"]
        assert r.name == e["name"]
        assert r.version == e["version"]
        assert r.download_url == e["download_url"]
        assert r.homepage_url == e.get("homepage_url")
        assert r.code_view_url == e.get("code_view_url")
        assert r.datasource_id == e["datasource_id"]


@pytest.mark.parametrize(
    "replace,expected_file",
    [
        (False, "run_map/test_merge_packages_no_replace-expected.json"),
        (True, "run_map/test_merge_packages_with_replace-expected.json"),
    ],
)
def test_merge_packages_matches_reference_expected(spark, replace, expected_file):
    """Replay the reference's merge_packages scenarios through
    merge_upsert: fill-empty always wins, value-on-both-sides replaced
    only under the replace policy (mining level), checksum conflicts
    dead-lettered — compare the merged row with the reference's expected
    package dict."""
    from purldb_spark.operators.merge import MergeSpec, Policy, merge_upsert

    base = "/root/reference/minecode/tests/testfiles/"
    with open(os.path.join(base, expected_file)) as fh:
        e = json.load(fh)

    existing = spark.createDataFrame(
        [("http://testdomap3.com", "generic", "pack", "0.1", "", "beef", 1)],
        "download_url string, type string, name string, version string,"
        " description string, sha1 string, level int",
    )
    incoming = spark.createDataFrame(
        [
            (
                "http://testdomap3.com",
                "generic",
                "pack",
                "0.2",
                "Description Updated",
                None,
                2 if replace else 0,
            )
        ],
        "download_url string, type string, name string, version string,"
        " description string, sha1 string, level int",
    )
    spec = MergeSpec(
        key="download_url",
        fields={
            "type": Policy.REPLACE,
            "name": Policy.REPLACE,
            "version": Policy.REPLACE,
            "description": Policy.REPLACE,
            "sha1": Policy.CHECKSUM,
        },
        level_col="level",
    )
    merged, conflicts = merge_upsert(existing, incoming, spec)
    assert conflicts.count() == 0  # new sha1 is empty: no checksum clash
    r = merged.collect()[0]
    assert r.type == e["type"]
    assert r.name == e["name"]
    assert r.version == e["version"]
    assert r.description == e["description"]
    assert r.sha1 == e["sha1"]
    assert r.download_url == e["download_url"]
