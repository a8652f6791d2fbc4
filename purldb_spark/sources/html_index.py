"""Apache-httpd-style HTML directory index -> URI rows (reference:
OpenSSLVisitor, minecode/miners/openssl.py:38-105 — BeautifulSoup over
`<a href>` anchors plus the two following `<td align="right">` cells).

Spark shape: split the page on `<tr` and explode — one row fragment per
table row — then a regexp triple-extract (href, date cell, size cell) and
the reference's size arithmetic (bare int means KILObytes on these pages;
M/G suffixes decimal-scale). Pure column expressions, one explode, no
shuffle; a crawl of thousands of index pages parses in parallel with one
row per page on the input side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_RX = (
    r'<a href="([^"]+)">.*?align="right">\s*'
    r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2})\s*<.*?"
    r'align="right">\s*([^<]*?)\s*<'
)


def _size_bytes(size_s) -> F.Column:
    """openssl.py:66-83: bare int means kB; float+M means MB; G means GB;
    '-' (directory) means NULL."""
    num = F.regexp_extract(size_s, r"^([\d.]+)", 1)
    return (
        F.when(size_s.rlike(r"^\d+$"), size_s.cast("long") * 1024)
        .when(
            size_s.rlike(r"^[\d.]+[Mm]$"),
            (num.cast("double") * 1024 * 1024).cast("long"),
        )
        .when(
            size_s.rlike(r"^[\d.]+[Gg]$"),
            (num.cast("double") * 1024 * 1024 * 1024).cast("long"),
        )
        .otherwise(F.lit(None).cast("long"))
    )


def html_index_uris(pages: DataFrame, html_col: str = "html", base_col: str = "base_uri") -> DataFrame:
    """(html, base_uri) pages -> one row per index entry:
    (uri, source_uri, file_name, date, size, package_url).

    Anchors starting with '?' (sort links) or '/' (parent navigation) are
    dropped like the reference's guard; directory entries (href ending
    '/') carry no file_name/purl; `openssl-*.tar.gz*` files get the
    reference's generic openssl purl with the version cut at '.tar.gz'."""
    frag = F.explode(F.split(F.col(html_col), "<tr")).alias("frag")
    rows = pages.select(F.col(base_col).alias("source_uri"), frag)
    href = F.regexp_extract("frag", _ROW_RX, 1)
    date_s = F.regexp_extract("frag", _ROW_RX, 2)
    size_s = F.regexp_extract("frag", _ROW_RX, 3)
    keep = (
        (href != "")
        & ~href.startswith("?")
        & ~href.startswith("/")
    )
    is_file = ~href.endswith("/")
    fname = F.when(is_file, F.substring_index(href, "/", -1))
    version = F.when(
        fname.contains("tar.gz"),
        F.substring_index(
            F.regexp_replace(fname, r"^openssl-", ""), ".tar.gz", 1
        ),
    )
    purl = F.when(
        is_file,
        F.concat(
            F.lit("pkg:generic/openssl"),
            F.when(version.isNotNull(), F.concat(F.lit("@"), version)).otherwise(
                F.lit("")
            ),
        ),
    )
    return rows.filter(keep).select(
        F.concat(F.col("source_uri"), href).alias("uri"),
        F.col("source_uri"),
        fname.alias("file_name"),
        F.nullif(date_s, F.lit("")).alias("date"),
        _size_bytes(size_s).alias("size"),
        purl.alias("package_url"),
    )


_ECLIPSE_SUFFIXES = (
    "-win32.zip",
    "-win64.exe",
    "-win32-x86_64.zip",
    "-linux-gtk-x86_64.tar.gz",
    "-macosx-cocoa-x86_64.tar.gz",
    "-linux-gtk.tar.gz",
    "-x86_64.tar.gz",
)


def eclipse_release_uris(
    pages: DataFrame, html_col: str = "html", source_col: str = "source_uri"
) -> DataFrame:
    """Eclipse release-page download anchors -> (uri, file_name,
    package_url, source_uri) (EclipseReleaseVisitor,
    minecode/miners/eclipse.py:107-137): every href containing
    `download.php?file=`, the purl name = file name with the
    platform-suffix list stripped.

    Intentional divergence: the reference iterates anchors once per
    ANCESTOR div (BeautifulSoup find_all nesting), emitting each URI ~13
    times; this visitor emits the DISTINCT set — the duplicates carry no
    information and the crawler's frontier dedupes them anyway."""
    hrefs = F.regexp_extract_all(
        F.col(html_col), F.lit(r'href="([^"]*download\.php\?file=[^"]*)"'), 1
    )
    rows = pages.select(
        F.col(source_col).alias("source_uri"),
        F.explode(F.array_distinct(hrefs)).alias("uri"),
    )
    fname = F.substring_index(F.col("uri"), "/", -1)
    name = fname
    for suf in _ECLIPSE_SUFFIXES:
        name = F.replace(name, F.lit(suf), F.lit(""))
    return rows.select(
        "uri",
        fname.alias("file_name"),
        F.concat(F.lit("pkg:eclipse/"), name).alias("package_url"),
        "source_uri",
    )


def dockerhub_explore_uris(
    pages: DataFrame, html_col: str = "html", source_col: str = "source_uri"
) -> DataFrame:
    """DockerHub explore-page anchors -> per official image the HTML page
    URI and the v2 registry API URI (both under pkg:docker/library/<name>),
    plus the next explore page when the page had any images
    (DockHubExplorePageVisitor, minecode/miners/dockerhub.py:58-97)."""
    hrefs = F.regexp_extract_all(
        F.col(html_col), F.lit(r'href="(/_/[^"]*)"'), 1
    )
    base = pages.select(
        F.col(source_col).alias("source_uri"), hrefs.alias("_hrefs")
    )
    per_image = base.select(
        "source_uri", F.explode("_hrefs").alias("href")
    )
    short = F.regexp_replace(
        F.regexp_extract(F.col("href"), r"^/_/(.*)$", 1), r"/$", ""
    )
    purl = F.concat(F.lit("pkg:docker/library/"), short)
    pair = F.array(
        F.concat(F.lit("https://hub.docker.com"), F.col("href")),
        F.concat(
            F.lit("https://registry.hub.docker.com/v2/repositories/library/"),
            F.regexp_extract(F.col("href"), r"^/_/(.*)$", 1),
        ),
    )
    image_rows = per_image.select(
        F.explode(pair).alias("uri"), purl.alias("package_url"), "source_uri"
    )
    next_rows = base.filter(F.size("_hrefs") > 0).select(
        F.concat(
            F.lit("https://hub.docker.com/explore/?page="),
            (
                F.regexp_extract(F.col("source_uri"), r"page=(\d+)", 1).cast(
                    "int"
                )
                + 1
            ).cast("string"),
        ).alias("uri"),
        F.lit(None).cast("string").alias("package_url"),
        "source_uri",
    )
    return image_rows.unionByName(next_rows)


def eclipse_packages_uris(
    pages: DataFrame, html_col: str = "html", source_col: str = "source_uri"
) -> DataFrame:
    """Eclipse packages-page `field-content` spans -> (uri, package_url,
    source_uri) (EclipsePackagesVisitor, minecode/miners/eclipse.py:82-104):
    anchor href is the release page URI, anchor TEXT is the purl name
    (spaces percent-encoded, e.g. pkg:eclipse/Neon%20RC3); spans whose
    anchor wraps markup instead of a text node are skipped like the
    reference's isinstance(str) guard."""
    frags = F.regexp_extract_all(
        F.col(html_col),
        F.lit(
            r'<span class="field-content">\s*<a href="([^"]*)">([^<]+)</a>'
        ),
        0,
    )
    rows = pages.select(
        F.col(source_col).alias("source_uri"), F.explode(frags).alias("frag")
    )
    href = F.regexp_extract("frag", r'href="([^"]*)"', 1)
    name = F.regexp_extract("frag", r'">([^<]+)</a>', 1)
    return rows.select(
        href.alias("uri"),
        F.concat(
            F.lit("pkg:eclipse/"), F.replace(name, F.lit(" "), F.lit("%20"))
        ).alias("package_url"),
        "source_uri",
    )


def cpan_author_dir_uris(
    pages: DataFrame, html_col: str = "html", base_col: str = "source_uri"
) -> DataFrame:
    """CPAN author-directory page anchors -> file URIs with purls
    (CpanProjectHTMLVisitors, minecode/miners/cpan.py:128-165). The purl
    derives from the reference's REPLACE-then-rpartition quirk verbatim:
    "tar.gz" is substring-replaced (leaving the preceding dot in the
    version, e.g. pkg:cpan/AWS-Signature4@1.00.), .readme/.meta are
    dropped, and the last '-' splits name from version; hrefs starting
    with '/' or '?' (navigation) are skipped."""
    hrefs = F.regexp_extract_all(
        F.col(html_col), F.lit(r'href="([^"]+)"'), 1
    )
    rows = pages.select(
        F.col(base_col).alias("source_uri"), F.explode(hrefs).alias("href")
    ).filter(
        ~F.col("href").startswith("/") & ~F.col("href").startswith("?")
    )
    stem = F.replace(
        F.replace(
            F.replace(F.col("href"), F.lit("tar.gz"), F.lit("")),
            F.lit(".readme"),
            F.lit(""),
        ),
        F.lit(".meta"),
        F.lit(""),
    )
    name = F.regexp_extract(stem, r"^(.*)-[^-]*$", 1)
    version = F.regexp_extract(stem, r"-([^-]*)$", 1)
    purl = F.when(
        (name != "") & (version != ""),
        F.concat(F.lit("pkg:cpan/"), name, F.lit("@"), version),
    )
    return rows.select(
        F.concat(
            F.col("source_uri"),
            F.when(
                F.col("source_uri").endswith("/"), F.col("href")
            ).otherwise(F.concat(F.lit("/"), F.col("href"))),
        ).alias("uri"),
        purl.alias("package_url"),
        "source_uri",
    )


def cpan_modules_uris(
    pages: DataFrame, html_col: str = "html", base_col: str = "source_uri"
) -> DataFrame:
    """CPAN modules-index anchors -> author-page URIs
    (CpanModulesVisitors, minecode/miners/cpan.py:100-124): keep hrefs
    under ../authors, drop .zip/.tar.gz (the author-dir visitor captures
    archives), rewrite ../X to http://www.cpan.org/X."""
    hrefs = F.regexp_extract_all(
        F.col(html_col), F.lit(r'href="([^"]+)"'), 1
    )
    rows = pages.select(
        F.col(base_col).alias("source_uri"), F.explode(hrefs).alias("href")
    )
    keep = (
        F.col("href").startswith("../authors")
        & ~F.col("href").endswith(".zip")
        & ~F.col("href").endswith(".tar.gz")
    )
    return rows.filter(keep).select(
        F.concat(
            F.lit("http://www.cpan.org/"),
            F.expr("substring(href, 4)"),
        ).alias("uri"),
        "source_uri",
    )


def googlecode_search_uris(
    pages: DataFrame, html_col: str = "html", base_col: str = "source_uri"
) -> DataFrame:
    """Google Code archive search pages -> per-project archive
    project.json URIs with purls, plus the "Next page" pagination link
    (GoogleProjectPagesVisitor, minecode/miners/googlecode.py:85-109)."""
    proj_hrefs = F.regexp_extract_all(
        F.col(html_col),
        F.lit(r'href="https://code\.google\.com/archive/p/([^"]+)"'),
        1,
    )
    base = pages.select(
        F.col(base_col).alias("source_uri"),
        proj_hrefs.alias("_projects"),
        # the Next anchor carries other attributes before href and HTML-
        # escapes & in the url — unescape &amp; like BeautifulSoup does
        F.replace(
            F.regexp_extract(
                F.col(html_col), r'<a [^>]*href="([^"]*)"[^>]*>\s*Next', 1
            ),
            F.lit("&amp;"),
            F.lit("&"),
        ).alias("_next"),
    )
    projects = base.select(
        "source_uri", F.explode("_projects").alias("p")
    ).select(
        F.concat(
            F.lit(
                "https://storage.googleapis.com/google-code-archive/"
                "v2/code.google.com/"
            ),
            F.col("p"),
            F.lit("/project.json"),
        ).alias("uri"),
        F.concat(
            F.lit("pkg:googlecode/"),
            F.regexp_replace(F.col("p"), r"/$", ""),
        ).alias("package_url"),
        "source_uri",
    )
    nxt = base.filter(F.col("_next") != "").select(
        F.col("_next").alias("uri"),
        F.lit(None).cast("string").alias("package_url"),
        "source_uri",
    )
    return projects.unionByName(nxt)
