"""S5: rsync/FTP `ls -lR`-style directory-listing source
(minecode/ls.py:148-252, minecode/rsync.py).

The reference parses listing text line-by-line in Python; here the listing
is a spark.read.text DataFrame and the parse is a regexp_extract cascade —
fully JVM-side, so a multi-TB mirror listing parses in parallel.

Recognized shape (rsync --list-only / `ls -l` common core):

    -rw-r--r--  4096 2024/01/31 10:22:01 path/to/file.tar.gz
    drwxr-xr-x  4096 2024/01/31 10:22:01 path/to

Directory-context lines ("path:") and totals are dropped like the
reference's ls parser does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Column-API regex: the pattern goes verbatim to the JVM (no SQL-literal
# escape pass), so single backslashes here
_LINE_RX = (
    r"^([-dlbcps][rwxsStT-]{9})\s+(\d+)\s+"
    r"(\d{4}/\d{2}/\d{2}\s\d{2}:\d{2}:\d{2})\s+(.+)$"
)


def parse_listing(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """listing text -> (path, type, size, last_modified) rows."""
    c = F.col(text_col)
    parsed = lines.select(
        F.regexp_extract(c, _LINE_RX, 1).alias("mode"),
        F.regexp_extract(c, _LINE_RX, 2).alias("size_s"),
        F.regexp_extract(c, _LINE_RX, 3).alias("ts_s"),
        F.regexp_extract(c, _LINE_RX, 4).alias("path"),
    ).filter(F.col("mode") != "")
    return parsed.select(
        "path",
        F.when(F.col("mode").startswith("d"), "directory")
        .when(F.col("mode").startswith("l"), "link")
        .otherwise("file")
        .alias("type"),
        F.col("size_s").cast("long").alias("size"),
        F.to_timestamp("ts_s", "yyyy/MM/dd HH:mm:ss").alias("last_modified"),
    )


def read_listing(spark: SparkSession, path: str) -> DataFrame:
    return parse_listing(spark.read.text(path))
