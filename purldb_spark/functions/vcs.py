"""purl2vcs source-repo inference — the data-parallel core of
``purl2vcs/src/purl2vcs/find_source_repo.py``.

What runs here (pure column expressions, per-row, no I/O):

- candidate URL collection from package metadata columns plus URLs
  lifted out of free text (find_source_repo.py:330-349 ``found_urls`` +
  ``get_urls_from_text``),
- git-forge filtering with the github/gitlab/bitbucket hints and the
  Apache-SVN -> GitHub rewrite (``get_git_repo_urls``,
  ``convert_apache_svn_to_github_url``, find_source_repo.py:89-114,352-381),
- repo-URL -> purl normalization: ``git@github.com+`` and ``https+//``
  prefixes, ``@commit`` suffix strip on git+https/git schemes, ``.git``
  strip, ``git://host:path`` -> ``https://host/path``, then
  netloc/path parsing (``convert_repo_url_to_purls``,
  find_source_repo.py:252-310),
- tag normalization and version matching: lowercase, ``_`` -> ``.``,
  leading ``v`` strip (``get_tag_and_commit``, find_source_repo.py:449-464)
  producing the source purl with the ORIGINAL tag as version and the
  commit qualifier (``find_package_version_tag_and_commit``).

What stays driver-side by design: fetching homepages and ``git ls-remote``
(the reference shells out per repo) — the tag/commit list arrives as a
table, exactly like T7's fetch boundary.

Plan-size discipline: every normalization step here is a SINGLE-REFERENCE
expression (``regexp_replace`` passes unmatched input through unchanged),
never ``when(f(u)).otherwise(u)`` — the latter embeds its input tree ~3x
per step, and Catalyst inlines chained projections, so six such steps
composed under a 10-reference consumer grow the plan ~3^6-fold (observed:
a 3.8 MB executed-plan string, 12 MiB task binaries, janino 64 KB
method-limit codegen failures). The single-reference chain keeps the whole
expression LINEAR, inside one whole-stage-codegen projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

FORGE_HINTS = ("github", "gitlab", "bitbucket")

URL_RE = r"(https?://[^\s\"'<>()\[\]]+)"

# convert_apache_svn_to_github_url (find_source_repo.py:89-114): strip any
# leading "...svn+", then rewrite the /repos/asf/{name}/tags/{tag}/ shape.
# Anchored full-match replace: non-matching URLs pass through UNCHANGED and
# are dropped downstream because their netloc carries no forge hint —
# observably equivalent to the reference's "return None" for this pipeline.
_APACHE_SVN_RX = (
    r"^(?:.*?svn\+)?https?://svn\.apache\.org/repos/asf/([^/]+)/tags/([^/]+)/.*$"
)
_APACHE_SVN_SUB = r"https://github.com/apache/$1/tree/$2"


def extract_urls(text: Column) -> Column:
    """URLs found in free text (the scancode ``get_urls`` boundary reduced
    to its URL regex — the reference runs it over homepage/description
    text, find_source_repo.py:29-38)."""
    return F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(URL_RE), 1)


def apache_svn_to_github(url: Column) -> Column:
    """convert_apache_svn_to_github_url (find_source_repo.py:89-114):
    ``svn+https://svn.apache.org/repos/asf/{name}/tags/{tag}/...`` ->
    ``https://github.com/apache/{name}/tree/{tag}``; null when the shape
    does not match."""
    rewritten = F.regexp_replace(url, _APACHE_SVN_RX, _APACHE_SVN_SUB)
    return F.when(rewritten.startswith("https://github.com/apache/"), rewritten)


def filter_git_repo_url(url: Column) -> Column:
    """get_git_repo_urls per-URL step (find_source_repo.py:352-381): the
    Apache-SVN rewrite, then keep only URLs naming a known forge (the
    redirect-following branch is driver I/O and out of scope)."""
    candidate = F.regexp_replace(url, _APACHE_SVN_RX, _APACHE_SVN_SUB)
    hinted = None
    for h in FORGE_HINTS:
        cond = candidate.contains(h)
        hinted = cond if hinted is None else (hinted | cond)
    return F.when(hinted, candidate)


def normalize_repo_url(u: Column) -> Column:
    """convert_repo_url_to_purls normalization chain
    (find_source_repo.py:258-287), faithfully ordered; each step is one
    pass-through ``regexp_replace`` so the composed tree stays linear."""
    # git@github.com+https://github.com/... -> keep the part after '+'
    u = F.regexp_replace(u, r"^git@github\.com\+", "")
    # https+// -> https://
    u = F.regexp_replace(u, r"^https\+//", "https://")
    # git+https://repo@commit / git://repo@commit -> strip the first '@'
    # and everything after it (reference: url.split('@')[0] on these schemes)
    u = F.regexp_replace(u, r"^(git\+https://|git://)([^@]*)@.*$", "$1$2")
    # a plain git+ prefix (survives when no @ was present)
    u = F.regexp_replace(u, r"^git\+", "")
    # trailing .git
    u = F.regexp_replace(u, r"\.git$", "")
    # git://host:path -> https://host/path (the host:path colon; a second
    # colon deeper in the path is not a shape the reference produces)
    u = F.regexp_replace(u, r"^git://([^:/]+):", "https://$1/")
    u = F.regexp_replace(u, r"^git://", "https://")
    return u


def repo_url_to_purl_parts(url: Column) -> Column:
    """convert_repo_url_to_purls tail (find_source_repo.py:288-310):
    netloc picks the forge type via the hints, path segments 1 and 2 are
    namespace and name; null struct when the path is too shallow."""
    netloc = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1)
    namespace = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]+/([^/]+)/", 1)
    name = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]+/[^/]+/([^/]+)", 1
    )
    ptype = F.lit(None).cast("string")
    for h in reversed(FORGE_HINTS):
        ptype = F.when(netloc.contains(h), F.lit(h)).otherwise(ptype)
    ok = ptype.isNotNull() & (namespace != "") & (name != "")
    return F.when(
        ok,
        F.struct(
            ptype.alias("type"), namespace.alias("namespace"), name.alias("name")
        ),
    )


def normalize_tag(tag: Column) -> Column:
    """get_tag_and_commit's tag canonicalization (find_source_repo.py:449-462):
    lowercase, ``_`` -> ``.``, strip ALL leading ``v``s (str.lstrip)."""
    return F.regexp_replace(
        F.replace(F.lower(tag), F.lit("_"), F.lit(".")), r"^v+", ""
    )


def source_repo_candidates(
    packages: DataFrame,
    url_cols: list[str],
    text_cols: list[str] | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per package: ordered candidate source-repo purl parts.

    Explodes the metadata URL columns (in reference priority order:
    find_source_repo.py:330-337) followed by URLs extracted from the text
    columns, filters/normalizes them, and returns one row per viable
    candidate with its priority index — narrow maps only, no shuffle.
    The whole filter/normalize/parse chain is one linear expression per
    row (see module docstring), so it compiles into a single
    whole-stage-codegen projection."""
    keys = key_cols or ["purl"]
    urls = F.concat(
        F.array(*[F.col(c) for c in url_cols]),
        *[extract_urls(F.col(c)) for c in (text_cols or [])],
    )
    exploded = packages.select(
        *[F.col(c) for c in keys],
        F.col("version"),
        F.posexplode(urls).alias("cand_idx", "cand_url"),
    ).filter(F.col("cand_url").isNotNull())
    # Two separate projections on purpose: `__u` (the full normalize chain)
    # is a non-cheap alias referenced ~10x downstream, so CollapseProject
    # keeps the boundary and each whole-stage-codegen consume method stays
    # far below janino's 64 KB limit (a single fused projection here cannot
    # be method-split because its inputs are generator-output locals).
    with_u = exploded.select(
        *keys,
        "version",
        "cand_idx",
        normalize_repo_url(filter_git_repo_url(F.col("cand_url"))).alias("__u"),
    ).filter(F.col("__u").isNotNull())
    u = F.col("__u")
    netloc = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1)
    namespace = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]+/([^/]+)/", 1)
    name = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]+/[^/]+/([^/]+)", 1)
    ptype = F.lit(None).cast("string")
    for h in reversed(FORGE_HINTS):
        ptype = F.when(netloc.contains(h), F.lit(h)).otherwise(ptype)
    return (
        with_u.select(
            *keys,
            "version",
            "cand_idx",
            ptype.alias("type"),
            namespace.alias("namespace"),
            name.alias("name"),
        )
        .filter(
            F.col("type").isNotNull()
            & (F.col("namespace") != "")
            & (F.col("name") != "")
        )
    )


def match_version_tags(
    candidates: DataFrame, tags: DataFrame, key_cols: list[str] | None = None
) -> DataFrame:
    """find_package_version_tag_and_commit (find_source_repo.py:467-485):
    join candidates to the (type, namespace, name, tag, commit) table on
    normalized tag == lowercased version, keep the best candidate per
    package (lowest candidate index, then lexically first tag for a total
    order), and render the source purl with the original tag and the
    commit qualifier.

    The tags side is tiny relative to packages (one row per repo tag) —
    broadcast it; the package side never shuffles."""
    keys = key_cols or ["purl"]
    joined = candidates.join(
        F.broadcast(tags),
        on=[
            candidates["type"] == tags["type"],
            candidates["namespace"] == tags["namespace"],
            candidates["name"] == tags["name"],
            normalize_tag(tags["tag"]) == F.lower(candidates["version"]),
        ],
        how="inner",
    ).select(
        *[candidates[c] for c in keys],
        candidates["cand_idx"],
        candidates["type"].alias("src_type"),
        candidates["namespace"].alias("src_namespace"),
        candidates["name"].alias("src_name"),
        tags["tag"].alias("src_version"),
        tags["commit"].alias("commit"),
    )
    w = Window.partitionBy(*keys).orderBy("cand_idx", "src_version", "commit")
    best = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "cand_idx")
    )
    return best.withColumn(
        "source_purl",
        F.concat(
            F.lit("pkg:"),
            F.col("src_type"),
            F.lit("/"),
            F.col("src_namespace"),
            F.lit("/"),
            F.col("src_name"),
            F.lit("@"),
            F.col("src_version"),
            F.lit("?commit="),
            F.col("commit"),
        ),
    )
