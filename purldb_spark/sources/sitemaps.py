"""Sitemap visitors (reference: SourceforgeSitemapIndexVisitor /
SourceforgeSitemapPageVisitor, minecode/miners/sourceforge.py:38-75):
the index yields one URI per <loc>; the page visitor keeps only project
URLs and rewrites each to its JSON API endpoint with a pkg:sourceforge
purl.

Spark shape: one regexp_extract_all + explode per page — the reference
notes the index XML alone is >100 MB, which is exactly why the parse is a
streamable per-page map with no state and no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PROJECT_RX = r"^https?://sourceforge.net/projects/[a-z0-9.-]+/?$"


def sitemap_locs(
    pages: DataFrame, xml_col: str = "xml", source_col: str = "source_uri"
) -> DataFrame:
    """Every <loc> of a sitemap(-index) page -> (uri, source_uri)."""
    locs = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"<loc>\s*([^<]*?)\s*</loc>"), 1
    )
    return pages.select(
        F.explode(locs).alias("uri"), F.col(source_col).alias("source_uri")
    )


def sourceforge_sitemap_page_uris(
    pages: DataFrame, xml_col: str = "xml", source_col: str = "source_uri"
) -> DataFrame:
    """Project <loc>s of a sub-sitemap -> the JSON API URI + purl rows the
    crawler enqueues (non-project locs dropped)."""
    locs = sitemap_locs(pages, xml_col, source_col)
    name = F.regexp_replace(
        F.regexp_extract(F.col("uri"), r"sourceforge.net/projects/([a-z0-9.-]+)/?$", 1),
        r"/$",
        "",
    )
    return locs.filter(F.col("uri").rlike(_PROJECT_RX)).select(
        F.concat(
            F.lit("https://sourceforge.net/api/project/name/"),
            name,
            F.lit("/json"),
        ).alias("uri"),
        F.concat(F.lit("pkg:sourceforge/"), name).alias("package_url"),
        "source_uri",
    )
