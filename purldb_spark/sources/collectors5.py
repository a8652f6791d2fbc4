"""Collector enrichment, batch 5: the VCS-tag and URL-builder collect
families — github / gitlab / bitbucket tag enumeration, swift,
the fetchcode route gates (openssl / gnu / the generic supported
list), hackage, luarocks, conda, alpine, alpm, nix, dockerhub.
Reference: minecode/collectors/{github,gitlab,bitbucket,swift,generic,
openssl,gnu,hackage,luarocks,conda,alpine,alpm,nix,dockerhub}.py.

The doc→catalog-row mapping for these ecosystems already lives in the
miner modules (miners4 github/gitlab/bitbucket, miners6 dockerhub/nix);
what is collect-specific — and implemented here — is:

- tag/version enumeration: gitlab repository tags carry (version,
  author_name, author_email) per tag (gitlab.py:21-41); bitbucket tag
  pages carry values[].name with the target author's display_name when
  the author entry is typed "author" (bitbucket.py:18-45; the reference
  leaks the previous display_name across non-author entries — here a
  non-author entry yields NULL, documented deviation); github tag pages
  carry bare tag names, empty names dropped (github.py:16-42).
- swift: the owner is the LAST path segment of the purl namespace, the
  github repo doc is fetched for (owner, name), its tags filtered to
  the purl version, and the mapped rows re-typed "swift" keeping the
  original namespace (swift.py:20-55).
- fetchcode route gates: openssl routes only `pkg:openssl/openssl@...`
  (openssl.py:14), gnu routes any `pkg:gnu/...` but silently skips a
  versionless purl (gnu.py:14-33), generic routes exactly the
  GENERIC_FETCHCODE_SUPPORTED_PURLS name list (generic.py:150-186).
- hackage: the package's version list gates the request
  (version-not-found error, hackage.py:33-45); a hit builds the row
  from URL templates alone (download/homepage, primary_language
  haskell, hackage.py:46-60).
- luarocks / conda: the download URL comes from packageurl-python's
  purl2url builders (luarocks.py:29, conda.py:33) — luarocks:
  `https://luarocks.org/manifests/{namespace}/{name}-{version}.src.rock`
  lowercased, requiring namespace+name+version; conda:
  `https://repo.anaconda.com/pkgs/{channel}/{subdir}/{name}-{version}-
  {build}.{type}` requiring all four qualifiers. luarocks gates on a
  HEAD-existence check (modeled as a pre-fetched url set).
- alpine / alpm: the archive URLs are pure templates over purl fields —
  alpine requires arch+repo+alpine_version qualifiers (alpine.py:20-45,
  silent skip otherwise), alpm defaults arch to "any" and shards by
  the name's first letter (alpm.py:20-35).
- nix: only namespace "nixpkgs" (case-insensitive) routes
  (nix.py:24-27); the license object resolves spdxId > fullName >
  shortName (nix.py:58-66); package_content is BINARY.
- dockerhub: namespace defaults to "library" (dockerhub.py:105); a
  pinned version matches tags by digest when it starts with "sha256",
  by tag name otherwise, and fans out over every tag when absent
  (dockerhub.py:33-60).

Everything is equi-join + column expressions — at 100 TB each family
shuffles once on its natural key (subset_path / name / lowercased
name) and the URL/gate logic stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------- vcs tags --

_GITLAB_TAGS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField(
                "commit",
                T.StructType(
                    [
                        T.StructField("author_name", T.StringType()),
                        T.StructField("author_email", T.StringType()),
                    ]
                ),
            ),
        ]
    )
)


def parse_gitlab_tags(docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """GitLab repository-tags responses -> (subset_path, version,
    author, author_email) rows (gitlab.py:21-41): missing commit/author
    fields coalesce to ''.

    selectExpr strings, not Column chains (r15 §5-driver): one py4j
    round trip per select instead of one per F.* node."""
    return docs.selectExpr(
        "subset_path",
        f"explode(from_json({json_col},"
        f" '{_GITLAB_TAGS_SCHEMA.simpleString()}')) AS t",
    ).selectExpr(
        "subset_path",
        "t.name AS version",
        "coalesce(t.commit.author_name, '') AS author",
        "coalesce(t.commit.author_email, '') AS author_email",
    )


_BITBUCKET_TAGS_SCHEMA = T.StructType(
    [
        T.StructField("size", T.LongType()),
        T.StructField(
            "values",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField(
                            "target",
                            T.StructType(
                                [
                                    T.StructField(
                                        "author",
                                        T.StructType(
                                            [
                                                T.StructField("type", T.StringType()),
                                                T.StructField(
                                                    "user",
                                                    T.StructType(
                                                        [
                                                            T.StructField(
                                                                "display_name",
                                                                T.StringType(),
                                                            )
                                                        ]
                                                    ),
                                                ),
                                            ]
                                        ),
                                    )
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField("next", T.StringType()),
    ]
)


def parse_bitbucket_tags(pages: DataFrame, json_col: str = "doc") -> DataFrame:
    """Bitbucket refs/tags pages -> (subset_path, version, author)
    rows (bitbucket.py:18-45): pages with size 0 yield nothing; the
    author display_name is taken only from entries whose author is
    typed "author" (the reference carries the previous value across
    untyped entries — a NULL here instead, deviation documented)."""
    j = f"from_json({json_col}, '{_BITBUCKET_TAGS_SCHEMA.simpleString()}')"
    return pages.selectExpr(
        "subset_path",
        f"explode(CASE WHEN {j}.size > 0 THEN {j}.values END) AS v",
    ).selectExpr(
        "subset_path",
        "v.name AS version",
        "CASE WHEN v.target.author.type = 'author'"
        " THEN v.target.author.user.display_name END AS author",
    )


_GITHUB_TAGS_SCHEMA = T.ArrayType(
    T.StructType([T.StructField("name", T.StringType())])
)


def parse_github_tag_pages(pages: DataFrame, json_col: str = "doc") -> DataFrame:
    """GitHub tags pages -> (subset_path, version) rows
    (github.py:16-42): empty/missing names are dropped."""
    return (
        pages.selectExpr(
            "subset_path",
            f"explode(from_json({json_col},"
            f" '{_GITHUB_TAGS_SCHEMA.simpleString()}')) AS t",
        )
        .selectExpr("subset_path", "t.name AS version")
        .where("version IS NOT NULL AND version != ''")
    )


def map_swift_requests(requests: DataFrame, repo_docs: DataFrame) -> DataFrame:
    """Swift collect (swift.py:20-55): owner = last segment of the purl
    namespace, the (owner, name) github repo doc's tags filter to the
    purl version, and the mapped github rows re-type as swift keeping
    the full original namespace; a missing repo doc or no matching tag
    yields a ``no_tag`` status row."""
    from purldb_spark.sources.miners4 import map_github_docs

    reqs = requests.selectExpr(
        "purl",
        "namespace AS _ns",
        "name AS _n",
        "version AS _v",
        "substring_index(namespace, '/', -1) AS _owner",
    )
    d = repo_docs.selectExpr("owner AS _do", "name AS _dn", "doc")
    joined = reqs.join(d, F.expr("_owner = _do AND _n = _dn"), "left")
    mapped = map_github_docs(
        joined.filter("doc IS NOT NULL").select("doc").distinct()
    )
    # tag rows only, re-keyed by (owner, name, version) == the purl pin
    tags = mapped.filter("version IS NOT NULL").selectExpr(
        "namespace AS _mo",
        "name AS _mn",
        "version AS _mv",
        "description",
        "homepage_url",
        "vcs_url",
        "download_url",
        "sha1",
    )
    hit = joined.select("purl", "_ns", "_n", "_v", "_owner").join(
        tags, F.expr("_owner = _mo AND _n = _mn AND _v = _mv")
    )
    rows = hit.selectExpr(
        "purl",
        "'collected' AS status",
        "'swift' AS type",
        "_ns AS namespace",
        "_n AS name",
        "_v AS version",
        "description",
        "homepage_url",
        "vcs_url",
        "download_url",
        "sha1",
        "'source_archive' AS package_content",
    )
    missed = joined.select("purl").exceptAll(hit.select("purl"))
    null_cols = [
        f"CAST(NULL AS {rows.schema[c].dataType.simpleString()}) AS {c}"
        for c in rows.columns
        if c not in ("purl", "status")
    ]
    return rows.unionByName(
        missed.selectExpr("purl", "'no_tag' AS status", *null_cols)
    )


# ------------------------------------------------------ fetchcode gates --

# generic.py:150-186 GENERIC_FETCHCODE_SUPPORTED_PURLS, names only
GENERIC_FETCHCODE_NAMES = (
    "busybox", "bzip2", "dnsmasq", "dropbear", "ebtables", "hostapd",
    "iproute2", "iptables", "libnl", "lighttpd", "nftables", "openssh",
    "samba", "syslinux", "toybox", "uclibc", "uclibc-ng", "util-linux",
    "wpa_supplicant", "ipkg", "linux", "mtd-utils", "barebox",
    "e2fsprogs", "udhcp", "miniupnpc", "miniupnpd", "minissdpd",
    "erofs-utils",
)


def fetchcode_route_col(purl: Column) -> Column:
    """Route decision for the fetchcode-backed collectors:
    'fetchcode' when the purl matches openssl.py:14's
    ``pkg:openssl/openssl@.*``, gnu.py:14's ``pkg:gnu/.*`` WITH a
    version (versionless gnu purls are silently skipped,
    gnu.py:26-28 -> 'skipped_no_version'), or a generic purl whose
    name is in GENERIC_FETCHCODE_SUPPORTED_PURLS (each pattern requires
    the ``@``); NULL otherwise (no route)."""
    ptype = F.regexp_extract(purl, r"^pkg:([^/@]+)/", 1)
    body = F.regexp_extract(purl, r"^pkg:[^/@]+/([^@?]+)", 1)
    has_version = purl.rlike(r"@.+")
    generic_ok = F.lit(False)
    for n in GENERIC_FETCHCODE_NAMES:
        generic_ok = generic_ok | (body == F.lit(n))
    return (
        F.when(
            (ptype == "openssl"),
            F.when(
                (body == "openssl") & has_version, F.lit("fetchcode")
            ),
        )
        .when(
            ptype == "gnu",
            F.when(has_version, F.lit("fetchcode")).otherwise(
                F.lit("skipped_no_version")
            ),
        )
        .when(ptype == "generic", F.when(generic_ok & has_version, F.lit("fetchcode")))
    )


# ------------------------------------------------------------- hackage --


def map_hackage_requests(requests: DataFrame, versions: DataFrame) -> DataFrame:
    """Hackage collect (hackage.py:20-60): the package's version list
    gates the request; a hit builds the row from URL templates
    (download tarball + homepage), primary_language haskell; a miss is
    the reference's "Version ... not found" error string — a
    ``version_not_found`` status row."""
    reqs = requests.select("purl", "name", "version")
    v = versions.select(
        F.col("name").alias("_vn"), F.col("version").alias("_vv")
    )
    joined = reqs.join(
        v, (F.col("name") == F.col("_vn")) & (F.col("version") == F.col("_vv")),
        "left",
    )
    nv = F.concat(F.col("name"), F.lit("-"), F.col("version"))
    rows = joined.filter(F.col("_vv").isNotNull()).select(
        "purl",
        F.lit("collected").alias("status"),
        F.lit("hackage").alias("type"),
        "name",
        "version",
        F.concat(
            F.lit("https://hackage.haskell.org/package/"), nv, F.lit("/"), nv,
            F.lit(".tar.gz"),
        ).alias("download_url"),
        F.concat(F.lit("https://hackage.haskell.org/package/"), nv).alias(
            "homepage_url"
        ),
        F.lit("haskell").alias("primary_language"),
        F.lit("source_archive").alias("package_content"),
    )
    missed = joined.filter(F.col("_vv").isNull()).select("purl")
    null_cols = [
        F.lit(None).cast(rows.schema[c].dataType).alias(c)
        for c in rows.columns
        if c not in ("purl", "status")
    ]
    return rows.unionByName(
        missed.select("purl", F.lit("version_not_found").alias("status"), *null_cols)
    )


# -------------------------------------------------- purl2url download --


def luarocks_download_url(
    namespace: Column, name: Column, version: Column
) -> Column:
    """packageurl-python purl2url build_luarocks_download_url (used at
    luarocks.py:29): manifests/{namespace}/{name}-{version}.src.rock,
    all lowercased, NULL unless namespace+name+version are present."""
    return F.when(
        namespace.isNotNull() & name.isNotNull() & version.isNotNull(),
        F.lower(
            F.concat(
                F.lit("https://luarocks.org/manifests/"), namespace, F.lit("/"),
                name, F.lit("-"), version, F.lit(".src.rock"),
            )
        ),
    )


def map_luarocks_requests(requests: DataFrame, existing: DataFrame) -> DataFrame:
    """luarocks collect (luarocks.py:20-55): build the purl2url download
    URL, gate on its HEAD-existence (``existing``: url rows that
    resolve 200), and emit the template package row; a missing URL is
    the reference's "does not exist" error."""
    reqs = requests.select("purl", "namespace", "name", "version").withColumn(
        "download_url",
        luarocks_download_url(F.col("namespace"), F.col("name"), F.col("version")),
    )
    e = existing.select(F.col("url").alias("_eu"))
    joined = reqs.join(e, F.col("download_url") == F.col("_eu"), "left")
    homepage = F.when(
        F.col("namespace").isNotNull(),
        F.concat(
            F.lit("https://luarocks.org/modules/"), F.col("namespace"),
            F.lit("/"), F.col("name"),
        ),
    ).otherwise(F.concat(F.lit("https://luarocks.org/modules/"), F.col("name")))
    rows = joined.filter(F.col("_eu").isNotNull()).select(
        "purl",
        F.lit("collected").alias("status"),
        F.lit("luarocks").alias("type"),
        "namespace",
        "name",
        "version",
        "download_url",
        homepage.alias("homepage_url"),
        F.lit("lua").alias("primary_language"),
        F.lit("source_archive").alias("package_content"),
    )
    missed = joined.filter(F.col("_eu").isNull()).select("purl")
    null_cols = [
        F.lit(None).cast(rows.schema[c].dataType).alias(c)
        for c in rows.columns
        if c not in ("purl", "status")
    ]
    return rows.unionByName(
        missed.select("purl", F.lit("does_not_exist").alias("status"), *null_cols)
    )


def conda_download_url(
    name: Column, version: Column, build: Column, channel: Column,
    subdir: Column, pkg_type: Column,
) -> Column:
    """packageurl-python purl2url build_conda_download_url (used at
    conda.py:33): repo.anaconda.com/pkgs/{channel}/{subdir}/{name}-
    {version}-{build}.{type}, NULL unless every field is present."""
    return F.when(
        name.isNotNull()
        & version.isNotNull()
        & build.isNotNull()
        & channel.isNotNull()
        & subdir.isNotNull()
        & pkg_type.isNotNull(),
        F.concat(
            F.lit("https://repo.anaconda.com/pkgs/"), channel, F.lit("/"),
            subdir, F.lit("/"), name, F.lit("-"), version, F.lit("-"), build,
            F.lit("."), pkg_type,
        ),
    )


# ----------------------------------------------------- distro archives --


def alpine_archive_urls(
    name: Column, version: Column, arch: Column, repo: Column,
    alpine_version: Column,
) -> list[Column]:
    """Alpine collect URL templates (alpine.py:20-45): the APKINDEX
    archive and the .apk download, both NULL unless name + version +
    the arch/repo/alpine_version qualifiers are all present (the
    reference silently skips such purls)."""
    ok = (
        name.isNotNull()
        & version.isNotNull()
        & arch.isNotNull()
        & repo.isNotNull()
        & alpine_version.isNotNull()
    )
    base = F.concat(
        F.lit("https://dl-cdn.alpinelinux.org/alpine/"), alpine_version,
        F.lit("/"), repo, F.lit("/"), arch, F.lit("/"),
    )
    return [
        F.when(ok, F.concat(base, F.lit("APKINDEX.tar.gz"))).alias("index_url"),
        F.when(
            ok, F.concat(base, name, F.lit("-"), version, F.lit(".apk"))
        ).alias("download_url"),
    ]


def alpm_archive_url(name: Column, version: Column, arch: Column) -> Column:
    """Arch Linux archive URL (alpm.py:20-35): arch defaults to "any",
    the path shards on the name's first letter; NULL unless
    name + version are present (silent skip)."""
    a = F.coalesce(arch, F.lit("any"))
    return F.when(
        name.isNotNull() & version.isNotNull(),
        F.concat(
            F.lit("https://archive.archlinux.org/packages/"),
            F.substring(name, 1, 1), F.lit("/"), name, F.lit("/"),
            name, F.lit("-"), version, F.lit("-"), a, F.lit(".pkg.tar.zst"),
        ),
    )


# ------------------------------------------------------- nix/dockerhub --


def nix_route_col(namespace: Column) -> Column:
    """nix collect gate (nix.py:24-27): only namespace "nixpkgs"
    (case-insensitive) routes; anything else silently skips."""
    return F.when(
        F.lower(F.coalesce(namespace, F.lit(""))) == "nixpkgs",
        F.lit("devbox"),
    ).otherwise(F.lit("skipped_namespace"))


def nix_license_col(spdx: Column, full_name: Column, short_name: Column) -> Column:
    """nix license resolution (nix.py:58-66): spdxId > fullName >
    shortName."""
    return F.coalesce(spdx, full_name, short_name)


def match_dockerhub_tags(requests: DataFrame, tags: DataFrame) -> DataFrame:
    """Dockerhub tag matching (dockerhub.py:17-60 + 93-125): namespace
    defaults to "library"; a version starting with "sha256" matches the
    tag digest, any other version matches the tag name, and a
    versionless purl keeps every tag; a nameless purl is the
    reference's missing-name error.

    ``tags``: (namespace, name, tag_name, digest) rows — the paged
    tags responses, already flattened (the pagination is frontier I/O).
    """
    ns = F.coalesce(F.col("namespace"), F.lit("library"))
    reqs = requests.select(
        "purl", ns.alias("_ns"), F.col("name").alias("_n"),
        F.col("version").alias("_v"),
    )
    no_name = reqs.filter(F.col("_n").isNull()).select(
        "purl", F.lit("missing_name").alias("status")
    )
    ok = reqs.filter(F.col("_n").isNotNull())
    t = tags.select(
        F.col("namespace").alias("_tns"), F.col("name").alias("_tn"),
        "tag_name", "digest",
    )
    joined = ok.join(
        t, (F.col("_ns") == F.col("_tns")) & (F.col("_n") == F.col("_tn")), "left"
    )
    want = F.col("_v")
    matched = joined.filter(
        F.col("tag_name").isNotNull()
        & (
            want.isNull()
            | F.when(want.startswith("sha256"), F.col("digest") == want).otherwise(
                F.col("tag_name") == want
            )
        )
    )
    rows = matched.select(
        "purl",
        F.lit("collected").alias("status"),
        F.lit("docker").alias("type"),
        F.col("_ns").alias("namespace"),
        F.col("_n").alias("name"),
        F.col("tag_name").alias("version"),
        F.col("digest"),
        F.lit("source_archive").alias("package_content"),
    )
    # requests with a repo but no matching tag (or no tags at all)
    missed = ok.select("purl").exceptAll(rows.select("purl").distinct())
    null_cols = [
        F.lit(None).cast(rows.schema[c].dataType).alias(c)
        for c in rows.columns
        if c not in ("purl", "status")
    ]
    return rows.unionByName(
        missed.select("purl", F.lit("tag_not_found").alias("status"), *null_cols)
    ).unionByName(no_name.select("purl", "status", *null_cols))
