"""Google Code archive ZIP index: a zip containing one text file listing
every gs:// project.json path -> storage API URIs with purls
(GooglecodeArchiveVisitor, minecode/miners/googlecode.py:35-74).

Spark shape: `spark.read.format("binaryFile")` + mapInPandas for the zip
member extraction (the one genuinely non-columnar step — same boundary as
the gzip Nexus index in sources/gzip_index.py), then the line transform is
pure column expressions over the exploded lines. A multi-GB index fans out
per zip member batch; nothing is collected to the driver."""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LINES_SCHEMA = T.StructType(
    [
        T.StructField("source_uri", T.StringType()),
        T.StructField("line", T.StringType()),
    ]
)


def zip_text_lines(
    blobs: DataFrame, content_col: str = "content", uri_col: str = "source_uri"
) -> DataFrame:
    """(source_uri, zip bytes) -> one row per text line of every member."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, lines = [], []
            for src, blob in zip(pdf[uri_col], pdf[content_col]):
                with zipfile.ZipFile(io.BytesIO(bytes(blob))) as zf:
                    for member in zf.namelist():
                        text = zf.read(member).decode("utf-8", "replace")
                        for ln in text.splitlines():
                            srcs.append(src)
                            lines.append(ln)
            yield pd.DataFrame({"source_uri": srcs, "line": lines})

    return blobs.mapInPandas(run, schema=_LINES_SCHEMA)


def gc_archive_uris(lines: DataFrame) -> DataFrame:
    """gs://google-code-archive/v2/.../project.json lines -> the
    percent-encoded storage API URI + pkg:googlecode purl; other lines
    dropped (googlecode.py:59-74)."""
    ln = F.trim("line")
    keep = ln.startswith("gs://google-code-archive/v2") & ln.endswith(
        "/project.json"
    )
    rel = F.replace(ln, F.lit("gs://google-code-archive/v2"), F.lit(""))
    name = F.regexp_replace(
        F.replace(rel, F.lit("/project.json"), F.lit("")), r"^/|/$", ""
    )
    encoded = F.replace(rel, F.lit("/"), F.lit("%2F"))
    return lines.filter(keep).select(
        F.concat(
            F.lit(
                "https://www.googleapis.com/storage/v1/b/"
                "google-code-archive/o/v2"
            ),
            encoded,
            F.lit("?alt=media"),
        ).alias("uri"),
        F.concat(F.lit("pkg:googlecode/"), name).alias("package_url"),
        "source_uri",
    )
