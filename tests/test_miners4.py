"""Edge cases for the batch-4 miner mappers that the fixture queries can't
reach: absent optional fields, empty arrays, and the reference quirks
(gitlab slug-derived purl, hex multi-owner parties)."""

from __future__ import annotations

from purldb_spark.sources.miners4 import (
    map_bitbucket_download_docs,
    map_bitbucket_repo_docs,
    map_eclipse_docs,
    map_github_docs,
    map_gitlab_docs,
    map_hex_docs,
    map_pub_docs,
)


def test_bitbucket_repo_defaults_and_dropped(spark):
    docs = spark.createDataFrame(
        [
            ('{"full_name":"ns/proj","has_issues":false}',),
            ('{"scm":"hg"}',),  # no full_name -> dropped
        ],
        ["doc"],
    )
    rows = map_bitbucket_repo_docs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    # scm defaults to git (bitbucket.py:263-301); website falls back to the
    # bb_url; bug tracker only when has_issues
    assert r["vcs_url"] == "git+https://bitbucket.org/ns/proj"
    assert r["homepage_url"] == r["vcs_url"]
    assert r["code_view_url"] == r["vcs_url"] + "/src"
    assert r["bug_tracking_url"] is None
    assert r["purl"] == "pkg:bitbucket/ns/proj"


def test_bitbucket_downloads_empty_values(spark):
    docs = spark.createDataFrame(
        [('{"values":[]}', "pkg:bitbucket/a/b")], ["doc", "package_url"]
    )
    assert map_bitbucket_download_docs(docs).count() == 0


def test_gitlab_purl_from_slug_not_display_name(spark):
    docs = spark.createDataFrame(
        [
            (
                '{"name":"My Project","web_url":"https://gitlab.com/grp/my-project",'
                '"created_at":"2021-01-02T00:00:00Z"}',
            ),
            ('{"web_url":"https://gitlab.com/x/y"}',),  # nameless -> dropped
        ],
        ["doc"],
    )
    rows = map_gitlab_docs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    # purl name = web_url slug (gitlab.py:88-91), display name kept in `name`
    assert r["purl"] == "pkg:gitlab/my-project"
    assert r["name"] == "My Project"
    # no http_url_to_repo -> vcs/code_view stay null
    assert r["vcs_url"] is None and r["code_view_url"] is None


def test_github_tag_without_tarball_and_empty_repo(spark):
    docs = spark.createDataFrame(
        [
            (
                '{"full_name":"o/r","size":7,'
                '"tags":[{"name":"v1","zipball_url":"z"}]}',
            ),
            ('{"full_name":"o/empty"}',),  # nothing to yield
        ],
        ["doc"],
    )
    rows = map_github_docs(docs).collect()
    # only the zipball row exists (null tarball filtered, github.py:221-294)
    assert [(r["name"], r["download_url"]) for r in rows] == [("r", "z")]
    assert rows[0]["purl"] == "pkg:github/o/r@v1"
    assert rows[0]["size"] == 7


def test_eclipse_description_fallback_and_no_downloads(spark):
    docs = spark.createDataFrame(
        [
            (
                '{"projects":{"p1":{"title":"T1","description":[],'
                '"download_url":[{"url":"u1"}]},'
                '"p2":{"title":"T2","download_url":[]}}}',
            )
        ],
        ["doc"],
    )
    rows = map_eclipse_docs(docs).collect()
    # p2 has no download rows; p1 falls back to title (eclipse.py:187-232)
    assert [(r["name"], r["description"], r["download_url"]) for r in rows] == [
        ("p1", "T1", "u1")
    ]


def test_hex_all_owners_become_parties(spark):
    docs = spark.createDataFrame(
        [
            (
                '{"name":"pkg","owners":[{"username":"a","email":"a@x"},'
                '{"username":"b"},{"username":"c","email":"c@x"}],'
                '"version_info":{"version":"1.0","checksum":"ff"}}',
            )
        ],
        ["doc"],
    )
    r = map_hex_docs(docs).collect()[0]
    # every owner is a party (hex.py:29-33); missing emails are skipped
    assert r["owners"] == "a; b; c"
    assert r["owner_emails"] == "a@x; c@x"
    assert r["download_url"] == "https://repo.hex.pm/tarballs/pkg-1.0.tar"
    assert r["sha256"] == "ff"


def test_pub_unknown_license_dropped_any_case(spark):
    docs = spark.createDataFrame(
        [
            (
                '{"name":"n","versions":['
                '{"version":"1","pubspec":{"license":"Unknown"}},'
                '{"version":"2","pubspec":{"license":"MIT"}}]}',
            )
        ],
        ["doc"],
    )
    rows = {r["version"]: r for r in map_pub_docs(docs).collect()}
    assert rows["1"]["extracted_license_statement"] is None
    assert rows["2"]["extracted_license_statement"] == "MIT"
    assert rows["2"]["download_url"] == (
        "https://pub.dev/packages/n/versions/2.tar.gz"
    )
