"""Collector enrichment, maven + debian — the per-ecosystem metadata
enrichment the reference runs on a collect miss. Reference:
minecode/collectors/maven.py and minecode/collectors/debian.py. Fetching
(POM / .dsc / copyright documents) stays on the frontier as pre-fetched
document tables; the enrichment itself is pure column expressions and
bounded equi-join iteration — no per-package loop, no Python UDFs:

- maven POM parse (collectors/maven.py:162-178 via packagedcode
  get_maven_pom): project gav, name/description/url, license names,
  developer parties, and the <parent> gav.
- maven ancestry merge (collectors/maven.py:181-258 get_ancestry +
  merge_ancestors + merge_parent): walk the parent chain, then fill each
  field that is empty on the child. The reference iterates ancestor POMs
  oldest->newest and merge_parent assigns whenever the field is still
  falsy — so for a missing child field the DEEPEST ancestor with a value
  wins (an assignment of an empty parent value leaves the field falsy and
  a later, newer ancestor refills it). Mirrored exactly: per field,
  ``max_by(value, depth)`` over non-null ancestor values, then coalesce
  under the child's own value.
- debian .dsc / control parse (collectors/debian.py:147-172 via
  packagedcode DebianDscFileHandler): RFC822 fields — Source, Homepage,
  Build-Depends, Vcs-*.
- debian copyright parse (collectors/debian.py:175-200): the
  machine-readable copyright file's License short names and Copyright
  statements; the reference runs full scancode license detection on the
  text — here the declared names are extracted directly (detection is the
  X5 external boundary, ingested via scan JSON).
- license/copyright overlay (collectors/debian.py:203-219
  update_license_copyright_fields, replace=True): copyright-file values
  replace metadata values when present.
- debian archive URLs (collectors/debian.py:285-464 DebianPackage):
  pool index folder (lib + first letter after stripping "lib", else first
  letter), EVR-less archive version (epoch dropped; "-revision" kept only
  when the revision isn't "0"), binary .deb name with the optional arch
  qualifier, source tarball / .dsc / copyright candidate names. The
  reference probes candidate URLs with requests and keeps the first that
  answers; a batch engine emits the primary candidate deterministically
  (documented per URL below).
- debian dependencies (collectors/debian.py:470-496 get_dependencies):
  Build-Depends/Depends/Pre-Depends comma lists -> pkg:deb/debian purls.
  NOTE: the reference body is dead (its comma_separated call is commented
  out so dependencies is always None) — the evident intent, comma split +
  name extraction, is what runs here.
- debian vcs (collectors/debian.py:499-517 get_vcs_repo): the single
  Vcs-<tool> control field, Vcs-Browser excluded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------------ maven --

#: fields merge_parent fills from ancestors (collectors/maven.py:221-225)
POM_MERGEABLE = ("declared_license_expression", "homepage_url", "parties")


def _pom_field(body: Column, tag: str) -> Column:
    return F.nullif(F.regexp_extract(body, f"<{tag}>([^<]*)</{tag}>", 1), F.lit(""))


def parse_pom_cols(
    docs: DataFrame, text_col: str = "pom_text", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """POM text -> one row of project fields + the parent gav.

    Project-level coordinates are read with the parent/licenses/developers
    blocks masked out first, so a parent's groupId or a license url never
    shadows the project's own (get_maven_pom resolves the same way
    structurally).
    """
    pom = F.col(text_col)
    parent = F.regexp_extract(pom, r"(?s)<parent>(.*?)</parent>", 1)
    body = F.regexp_replace(pom, r"(?s)<parent>.*?</parent>", "")
    licenses = F.regexp_extract(body, r"(?s)<licenses>(.*?)</licenses>", 1)
    developers = F.regexp_extract(body, r"(?s)<developers>(.*?)</developers>", 1)
    organization = F.regexp_extract(
        body, r"(?s)<organization>(.*?)</organization>", 1
    )
    body_plain = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(body, r"(?s)<licenses>.*?</licenses>", ""),
            r"(?s)<developers>.*?</developers>",
            "",
        ),
        r"(?s)<organization>.*?</organization>",
        "",
    )
    lic_names = F.regexp_extract_all(licenses, F.lit(r"<name>([^<]*)</name>"), 1)
    dev_names = F.regexp_extract_all(developers, F.lit(r"<name>([^<]*)</name>"), 1)
    # the <organization> is a party too (packagedcode maven: Party type
    # organization, role owner) — appended after the developers
    org_name = F.nullif(
        F.trim(F.regexp_extract(organization, r"<name>([^<]*)</name>", 1)),
        F.lit(""),
    )
    all_parties = F.concat_ws(
        "; ",
        F.nullif(F.array_join(dev_names, "; "), F.lit("")),
        org_name,
    )
    return docs.select(
        *keep_cols,
        _pom_field(body_plain, "groupId").alias("g"),
        _pom_field(body_plain, "artifactId").alias("a"),
        _pom_field(body_plain, "version").alias("v"),
        _pom_field(body_plain, "name").alias("pom_name"),
        _pom_field(body_plain, "description").alias("description"),
        _pom_field(body_plain, "url").alias("homepage_url"),
        F.nullif(F.array_join(lic_names, " AND "), F.lit("")).alias(
            "declared_license_expression"
        ),
        F.nullif(all_parties, F.lit("")).alias("parties"),
        _pom_field(parent, "groupId").alias("parent_g"),
        _pom_field(parent, "artifactId").alias("parent_a"),
        _pom_field(parent, "version").alias("parent_v"),
    )


def merge_pom_ancestors(
    packages: DataFrame,
    poms: DataFrame,
    key_cols: tuple[str, str, str] = ("namespace", "name", "version"),
    max_depth: int = 8,
) -> DataFrame:
    """Fill empty POM_MERGEABLE fields of ``packages`` from the parent-POM
    chain in ``poms`` (parsed by parse_pom_cols), reference merge order
    (deepest non-null ancestor wins — see module docstring).

    Distributed shape: one equi-join per ancestry level (bounded by
    ``max_depth``, real chains are 2-4 POMs deep), each on the uniform
    (g, a, v) key; then one aggregation. No driver-side data movement —
    the loop only builds the plan. At 100 TB the poms side is the small
    dimension: broadcast per level.
    """
    kn, ka, kv = key_cols
    # one unambiguous namespace for the ancestor side: _a* coordinate key,
    # _p* parent pointer, _f_* mergeable fields — the same frame joins once
    # per level with no column-name collisions
    anc = poms.select(
        F.col("g").alias("_ag"),
        F.col("a").alias("_aa"),
        F.col("v").alias("_av"),
        F.col("parent_g").alias("_pg"),
        F.col("parent_a").alias("_pa"),
        F.col("parent_v").alias("_pv"),
        *[F.col(f).alias(f"_f_{f}") for f in POM_MERGEABLE],
    ).localCheckpoint(eager=False)  # parse the POM XML once, not per level
    # level 0: the package's own pom -> its parent pointer (fields of the
    # package itself come from `packages`, not its pom)
    frontier = packages.join(
        anc,
        (packages[kn] == anc["_ag"])
        & (packages[ka] == anc["_aa"])
        & (packages[kv] == anc["_av"]),
        "inner",
    ).select(
        packages["purl"].alias("__pkg"),
        F.col("_pg").alias("_jg"),
        F.col("_pa").alias("_ja"),
        F.col("_pv").alias("_jv"),
    )
    levels: list[DataFrame] = []
    for depth in range(1, max_depth + 1):
        step = frontier.filter(F.col("_jg").isNotNull()).join(
            anc,
            (frontier["_jg"] == anc["_ag"])
            & (frontier["_ja"] == anc["_aa"])
            & (frontier["_jv"] == anc["_av"]),
            "inner",
        )
        level = step.select(
            F.col("__pkg"),
            F.lit(depth).alias("__depth"),
            F.col("_pg"),
            F.col("_pa"),
            F.col("_pv"),
            *[F.col(f"_f_{f}").alias(f) for f in POM_MERGEABLE],
        )
        if max_depth > 4:
            # deep walks truncate lineage per level; shallow ones (the
            # real-world 2-4 POM case) keep a single plan — each lazy
            # checkpoint is its own serial job, pure overhead at depth 3
            level = level.localCheckpoint(eager=False)
        levels.append(level)
        frontier = level.select(
            "__pkg",
            F.col("_pg").alias("_jg"),
            F.col("_pa").alias("_ja"),
            F.col("_pv").alias("_jv"),
        )
    levels = [lv.drop("_pg", "_pa", "_pv") for lv in levels]
    ancestors = levels[0]
    for lv in levels[1:]:
        ancestors = ancestors.unionByName(lv)
    deepest = ancestors.groupBy("__pkg").agg(
        *[
            F.expr(
                f"max_by({f}, CASE WHEN {f} IS NOT NULL THEN __depth END)"
            ).alias(f"__anc_{f}")
            for f in POM_MERGEABLE
        ]
    )
    out = packages.join(
        deepest, packages["purl"] == deepest["__pkg"], "left"
    )
    return out.select(
        *[
            F.coalesce(packages[c], F.col(f"__anc_{c}")).alias(c)
            if c in POM_MERGEABLE
            else packages[c]
            for c in packages.columns
        ]
    )


# ----------------------------------------------------------------- debian --


def control_field(doc: Column, field: str) -> Column:
    """One RFC822 control/dsc field value (single-line form)."""
    return F.nullif(
        F.regexp_extract(doc, f"(?m)^{field}: ?(.*)$", 1), F.lit("")
    )


def debian_archive_version(version: Column) -> Column:
    """DebianPackage.package_archive_version (debian.py:305-316): epoch
    dropped, "-revision" kept only when the revision isn't "0" (no
    revision parses as "0" there)."""
    no_epoch = F.regexp_replace(version, r"^\d+:", "")
    upstream = F.regexp_extract(no_epoch, r"^(.*?)(?:-([^-]*))?$", 1)
    revision = F.nullif(F.regexp_extract(no_epoch, r"-([^-]*)$", 1), F.lit(""))
    return F.when(
        revision.isNotNull() & (revision != "0"), no_epoch
    ).otherwise(upstream)


def debian_index_folder(name: Column) -> Column:
    """Pool index folder (debian.py:429-434): names starting with "lib"
    use "lib" + the first letter AFTER stripping every "lib" occurrence
    (the reference's str.replace removes all of them), else the first
    letter."""
    stripped = F.replace(name, F.lit("lib"), F.lit(""))
    return F.when(
        name.startswith("lib"), F.concat(F.lit("lib"), F.substring(stripped, 1, 1))
    ).otherwise(F.substring(name, 1, 1))


def debian_urls(
    name: Column,
    version: Column,
    arch: Column,
    source_name: Column,
    source_version: Column,
    archive_base_url: Column,
    metadata_base_url: Column,
) -> list[Column]:
    """The four DebianPackage URLs (debian.py:318-417), primary candidate
    per URL (the reference probes fallbacks over HTTP):

    - binary: <archive_dir><name>_<archive_version>[_<arch>].deb
    - source: <archive_dir><meta_name>_<meta_version>.tar.xz — the first
      candidate format tried there (debian.py:333-358)
    - dsc: <archive_dir><meta_name>_<meta_version up to '+'>.dsc — the
      first candidate (debian.py:373-376)
    - copyright: <metadata_dir><meta_name>_<meta_version>_copyright — the
      first candidate, non-ubuntu naming (debian.py:391-408)

    Directory resolution (set_debian_directories, debian.py:419-464) uses
    the BINARY package's index folder and name for the primary candidate.
    When a source purl exists, its name/version take over the metadata
    names (debian.py:341-347, 366-371).
    """
    av = debian_archive_version(version)
    folder = debian_index_folder(name)
    archive_dir = F.concat(archive_base_url, folder, F.lit("/"), name, F.lit("/"))
    metadata_dir = F.concat(metadata_base_url, folder, F.lit("/"), name, F.lit("/"))
    meta_name = F.coalesce(source_name, name)
    meta_version = F.when(
        source_name.isNotNull() & source_version.isNotNull(), source_version
    ).otherwise(av)
    binary = F.concat(
        archive_dir,
        name,
        F.lit("_"),
        av,
        F.when(arch.isNotNull(), F.concat(F.lit("_"), arch)).otherwise(F.lit("")),
        F.lit(".deb"),
    )
    source = F.concat(archive_dir, meta_name, F.lit("_"), meta_version, F.lit(".tar.xz"))
    dsc = F.concat(
        archive_dir,
        meta_name,
        F.lit("_"),
        F.substring_index(meta_version, "+", 1),
        F.lit(".dsc"),
    )
    copyright_url = F.concat(
        metadata_dir, meta_name, F.lit("_"), meta_version, F.lit("_copyright")
    )
    return [
        binary.alias("binary_archive_url"),
        source.alias("source_archive_url"),
        dsc.alias("package_metadata_url"),
        copyright_url.alias("package_copyright_url"),
    ]


def parse_copyright_cols(doc: Column) -> list[Column]:
    """Machine-readable debian/copyright -> declared license expression
    (distinct License short names, " AND "-joined, first-seen order) and
    the first Copyright statement (debian.py:175-200; detection itself is
    external — see module docstring)."""
    lic_names = F.array_distinct(
        F.regexp_extract_all(doc, F.lit(r"(?m)^License: ?(\S+)"), 1)
    )
    return [
        F.nullif(F.array_join(lic_names, " AND "), F.lit("")).alias(
            "copyright_license_expression"
        ),
        F.nullif(
            F.regexp_extract(doc, r"(?m)^Copyright: ?(.*)$", 1), F.lit("")
        ).alias("copyright_statement"),
    ]


def debian_dependencies(doc: Column) -> Column:
    """Build-Depends/Depends/Pre-Depends names -> pkg:deb/debian purls,
    "; "-joined in scope order (get_dependencies, debian.py:470-496 —
    the evident intent of its dead body)."""
    deps = []
    for scope in ("Build-Depends", "Depends", "Pre-Depends"):
        field = control_field(doc, scope)
        names = F.transform(
            F.split(field, ","),
            lambda d: F.regexp_extract(F.trim(d), r"^([^\s(|]+)", 1),
        )
        deps.append(
            F.when(field.isNotNull(), F.filter(names, lambda n: n != "")).otherwise(
                F.array().cast("array<string>")
            )
        )
    all_purls = F.transform(
        F.flatten(F.array(*deps)),
        lambda n: F.concat(F.lit("pkg:deb/debian/"), n),
    )
    return F.nullif(F.array_join(all_purls, "; "), F.lit(""))


def debian_vcs_cols(doc: Column) -> list[Column]:
    """(vcs_tool, vcs_repo) from the single Vcs-<tool> field, Vcs-Browser
    excluded (get_vcs_repo, debian.py:499-517)."""
    tool = F.nullif(
        F.lower(
            F.regexp_extract(doc, r"(?m)^Vcs-(?!Browser)(\w+): ?.*$", 1)
        ),
        F.lit(""),
    )
    repo = F.nullif(
        F.regexp_extract(doc, r"(?m)^Vcs-(?!Browser)\w+: ?(.*)$", 1), F.lit("")
    )
    return [tool.alias("vcs_tool"), repo.alias("vcs_repo")]


def enrich_debian_packages(
    requests: DataFrame,
    dsc_col: str = "dsc_text",
    copyright_col: str = "copyright_text",
) -> DataFrame:
    """Full debian collect enrichment for a batch of requests carrying
    purl identity (name/version/arch/source_name/source_version +
    archive/metadata base urls) and the fetched .dsc + copyright texts
    (map_debian_package, debian.py:74-144): metadata fields from the
    .dsc, license/copyright overlay replace=True, dependency purls, vcs,
    and the four archive URLs."""
    dsc = F.col(dsc_col)
    cr = F.col(copyright_col)
    cr_lic, cr_stmt = parse_copyright_cols(cr)
    meta_lic = control_field(dsc, "License")
    return requests.select(
        *requests.columns,
        control_field(dsc, "Source").alias("source_field"),
        control_field(dsc, "Homepage").alias("homepage_url"),
        # replace=True overlay (debian.py:203-219): the copyright file's
        # values win whenever present
        F.coalesce(cr_lic, meta_lic).alias("declared_license_expression"),
        cr_stmt.alias("copyright"),
        debian_dependencies(dsc).alias("dependencies"),
        *debian_vcs_cols(dsc),
        *debian_urls(
            F.col("name"),
            F.col("version"),
            F.col("arch"),
            F.col("source_name"),
            F.col("source_version"),
            F.col("archive_base_url"),
            F.col("metadata_base_url"),
        ),
    )


# ------------------------------------------------------- full POM mapper --

_SCM_GH_SHORTHAND = r"^git@([^:]+):(.+)$"


def _vcs_from_connection(conn: Column) -> Column:
    """scm `<connection>scm:TOOL:REST</connection>` -> vcs_url:
    TOOL+REST when REST carries a scheme; the `git@host:path` ssh
    shorthand normalizes to TOOL+https://host/path (observed across the
    reference's maven mapper fixtures: svn+http://..., git+ssh://...,
    git+https://github.com/... from git@github.com:...)."""
    tool = F.regexp_extract(conn, r"^scm:([^:]+):", 1)
    rest = F.regexp_replace(conn, r"^scm:[^:]+:", "")
    normalized = F.when(
        rest.rlike(_SCM_GH_SHORTHAND),
        F.concat(
            F.lit("https://"),
            F.regexp_extract(rest, _SCM_GH_SHORTHAND, 1),
            F.lit("/"),
            F.regexp_extract(rest, _SCM_GH_SHORTHAND, 2),
        ),
    ).otherwise(rest)
    return F.when(
        (tool != "") & (rest != ""), F.concat(tool, F.lit("+"), normalized)
    )


_REPO1 = "https://repo1.maven.org/maven2/"


def pom_packages_full(docs: DataFrame, text_col: str = "pom_text") -> DataFrame:
    """POM text -> the full package row the reference's maven mapper
    emits (minecode maven mapping via packagedcode maven, verified against
    the reference's own *.pom.package.json fixtures): coordinates with
    parent fallback, name+description join, scm-derived vcs/code-view
    urls, repo1 download/api/homepage url derivation, sources classifier
    purl, and the dependency array (scope default compile; observed flag
    rule: is_runtime only for scope=runtime, everything else optional;
    is_pinned when a literal version is present)."""
    pom = F.col(text_col)
    scm = F.regexp_extract(pom, r"(?s)<scm>(.*?)</scm>", 1)
    scm_conn = F.regexp_extract(scm, r"<connection>([^<]*)</connection>", 1)
    scm_url = F.nullif(
        F.regexp_extract(scm, r"<url>([^<]*)</url>", 1), F.lit("")
    )
    props_block = F.regexp_extract(pom, r"(?s)<properties>(.*?)</properties>", 1)
    prop_frags = F.regexp_extract_all(
        props_block,
        F.lit(r"<([A-Za-z0-9_.\-]+)>[^<]*</[A-Za-z0-9_.\-]+>"),
        0,
    )
    props = F.map_from_arrays(
        F.transform(prop_frags, lambda f: F.regexp_extract(f, r"^<([^>]+)>", 1)),
        F.transform(prop_frags, lambda f: F.regexp_extract(f, r">([^<]*)<", 1)),
    )
    nodm = F.regexp_replace(
        pom, r"(?s)<dependencyManagement>.*?</dependencyManagement>", ""
    )
    deps_block = F.regexp_extract(nodm, r"(?s)<dependencies>(.*?)</dependencies>", 1)
    dep_frags = F.regexp_extract_all(
        deps_block, F.lit(r"(?s)<dependency>(.*?)</dependency>"), 1
    )
    dep = F.transform(
        dep_frags,
        lambda frag: F.struct(
            F.regexp_extract(frag, r"<groupId>([^<]*)</groupId>", 1).alias("g"),
            F.regexp_extract(frag, r"<artifactId>([^<]*)</artifactId>", 1).alias(
                "a"
            ),
            F.nullif(
                F.regexp_extract(frag, r"<version>([^<]*)</version>", 1),
                F.lit(""),
            ).alias("v"),
            F.coalesce(
                F.nullif(
                    F.regexp_extract(frag, r"<scope>([^<]*)</scope>", 1),
                    F.lit(""),
                ),
                F.lit("compile"),
            ).alias("scope"),
        ),
    )
    extracted = docs.select(
        pom.alias("_pom"),
        scm_conn.alias("_scm_conn"),
        scm_url.alias("_scm_url"),
        dep.alias("_deps"),
        props.alias("_props"),
    )
    cols = parse_pom_cols(
        extracted.withColumnRenamed("_pom", text_col),
        text_col,
        keep_cols=("_scm_conn", "_scm_url", "_deps", "_props"),
    )
    g = F.coalesce(F.col("g"), F.col("parent_g"))
    v = F.coalesce(F.col("v"), F.col("parent_v"))
    a = F.col("a")
    gpath = F.replace(g, F.lit("."), F.lit("/"))
    dirurl = F.concat(
        F.lit(_REPO1), gpath, F.lit("/"), a, F.lit("/"), v, F.lit("/")
    )
    stem = F.concat(a, F.lit("-"), v)
    purl = F.concat(F.lit("pkg:maven/"), g, F.lit("/"), a, F.lit("@"), v)
    strip = lambda c: F.regexp_replace(c, r"^\s+|\s+$", "")  # noqa: E731
    description = F.concat_ws(
        "\n", strip(F.col("pom_name")), strip(F.col("description"))
    )
    # maven `${property}` interpolation for dependency versions — the
    # reference resolves these from the <properties> block
    def _resolve(v):
        key = F.regexp_extract(v, r"^\$\{(.+)\}$", 1)
        return F.when(
            v.rlike(r"^\$\{.+\}$"), F.element_at(F.col("_props"), key)
        ).otherwise(v)

    mkdep = F.transform(
        F.col("_deps"),
        lambda d: F.struct(
            F.concat(
                F.lit("pkg:maven/"),
                d["g"],
                F.lit("/"),
                d["a"],
                F.when(
                    _resolve(d["v"]).isNotNull(),
                    F.concat(F.lit("@"), _resolve(d["v"])),
                ).otherwise(F.lit("")),
            ).alias("purl"),
            _resolve(d["v"]).alias("extracted_requirement"),
            d["scope"].alias("scope"),
            # observed across the reference's .pom.package.json fixtures:
            # runtime AND provided scopes count as runtime deps; compile
            # and test are optional
            d["scope"].isin("runtime", "provided").alias("is_runtime"),
            (~d["scope"].isin("runtime", "provided")).alias("is_optional"),
            _resolve(d["v"]).isNotNull().alias("is_pinned"),
        ),
    )
    return cols.select(
        F.lit("maven").alias("type"),
        g.alias("namespace"),
        a.alias("name"),
        v.alias("version"),
        purl.alias("purl"),
        F.nullif(description, F.lit("")).alias("description"),
        F.col("homepage_url"),
        F.col("declared_license_expression"),
        F.col("parties"),
        # no <connection> -> the scm <url> is the vcs url (axis fixture)
        F.coalesce(
            _vcs_from_connection(F.col("_scm_conn")), F.col("_scm_url")
        ).alias("vcs_url"),
        F.col("_scm_url").alias("code_view_url"),
        F.concat(dirurl, stem, F.lit(".jar")).alias("repository_download_url"),
        F.concat(dirurl, stem, F.lit(".pom")).alias("api_data_url"),
        dirurl.alias("repository_homepage_url"),
        F.concat(purl, F.lit("?classifier=sources")).alias("source_package"),
        F.lit("Java").alias("primary_language"),
        F.lit("maven_pom").alias("datasource_id"),
        # the reference dedupes repeated <dependency> coordinates
        F.array_distinct(mkdep).alias("dependencies"),
    )


def maven_metadata_uris(
    docs: DataFrame, xml_col: str = "xml", source_col: str = "source_uri"
) -> DataFrame:
    """maven-metadata.xml -> per-version artifact URIs (the reference's
    MavenMetaDataVisitor: for each <version> under <versioning><versions>,
    yield the .jar and -sources.jar as scan-only (visited) and the .pom as
    to-visit, all under pkg:maven/{groupId}/{artifactId}@{version}).

    One explode over the version list; the artifact URL root derives from
    the metadata URL itself (…/maven-metadata.xml -> …/{version}/)."""
    xml = F.col(xml_col)
    g = F.regexp_extract(xml, r"<groupId>([^<]*)</groupId>", 1)
    a = F.regexp_extract(xml, r"<artifactId>([^<]*)</artifactId>", 1)
    versions = F.regexp_extract_all(
        xml, F.lit(r"<version>([^<]*)</version>"), 1
    )
    root = F.regexp_replace(F.col(source_col), r"maven-metadata\.xml$", "")
    base = docs.select(
        F.col(source_col).alias("source_uri"),
        root.alias("_root"),
        g.alias("_g"),
        a.alias("_a"),
        F.explode(versions).alias("version"),
    )
    stem = F.concat(
        F.col("_root"), F.col("version"), F.lit("/"), F.col("_a"),
        F.lit("-"), F.col("version"),
    )
    purl = F.concat(
        F.lit("pkg:maven/"), F.col("_g"), F.lit("/"), F.col("_a"),
        F.lit("@"), F.col("version"),
    )
    suffixes = F.array(
        F.struct(F.lit(".jar").alias("suf"), F.lit(True).alias("visited")),
        F.struct(
            F.lit("-sources.jar").alias("suf"), F.lit(True).alias("visited")
        ),
        F.struct(F.lit(".pom").alias("suf"), F.lit(False).alias("visited")),
    )
    return base.select(
        "source_uri",
        purl.alias("package_url"),
        F.explode(suffixes).alias("s"),
        stem.alias("_stem"),
    ).select(
        F.concat(F.col("_stem"), F.col("s.suf")).alias("uri"),
        "package_url",
        F.col("s.visited").alias("visited"),
        "source_uri",
    )
