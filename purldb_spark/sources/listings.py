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


# ---------------------------------------------------------------- ls -lR --

# classic `ls -alR` block format (minecode/ls.py:148-195 parses it with a
# posix ls parser; the debian/ubuntu mirror indexes ship this shape):
#
#     ./pool/main/a/asterisk-addons:
#     total 2024
#     -rw-rw-r-- 2 dak debadmin 1494 May 25  2010 asterisk-addons_1.6.2.1-1.dsc
#
# directory-context lines end with ':' and scope every following file line
# until the next header.
_LSLR_FILE_RX = (
    r"^([-dlbcps])[rwxsStT-]{9}\s+\d+\s+\S+\s+\S+\s+(\d+)\s+"
    r"([A-Z][a-z]{2})\s+(\d{1,2})\s+(\d{4}|\d{1,2}:\d{2})\s+(.+)$"
)


def parse_lslr(
    lines: DataFrame, text_col: str = "value", key_col: str | None = None
) -> DataFrame:
    """`ls -alR` block listing -> (path, type, size, date) rows.

    The directory context is inherently sequential state, so it propagates
    through a last-non-null window ordered by line position, PARTITIONED BY
    INPUT FILE (`input_file_name`): each listing file parses independently
    and in parallel with every other file; within one file the window is
    the same sequential scan the reference does in Python, minus the
    Python. Dates: explicit-year lines become ISO dates; recent-file
    `HH:MM` lines have NO year on the wire — the reference guesses one
    from the crawl clock (minecode/ls.py:104-107, non-reproducible), we
    emit NULL instead and let the caller decide.

    Matches reference Entry semantics (minecode/ls.py:85-127): only
    regular files carry size/date; `.`/`..` rows are dropped; paths are
    cleaned of leading `./`."""
    c = F.col(text_col)
    # key_col: for listings that are ROWS (one document per row exploded
    # into lines) rather than files, the caller supplies the per-document
    # key; input_file_name() is empty for in-memory data
    raw = lines.select(
        c.alias("line"),
        F.monotonically_increasing_id().alias("_pos"),
        (F.col(key_col) if key_col else F.input_file_name()).alias("_file"),
    )
    is_file_row = F.regexp_extract("line", _LSLR_FILE_RX, 1) != ""
    header = F.when(
        (~is_file_row)
        & F.col("line").endswith(":")
        & (F.trim("line") != "")
        & (~F.col("line").startswith("total ")),
        F.regexp_replace(
            F.regexp_replace(F.col("line"), ":$", ""), r"^\./", ""
        ),
    )
    staged = raw.select(
        "line",
        "_pos",
        "_file",
        header.alias("_hdr"),
        is_file_row.alias("_isfile"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_file")
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scoped = staged.withColumn(
        "dir", F.coalesce(F.last("_hdr", ignorenulls=True).over(w), F.lit(""))
    ).filter("_isfile")
    mode = F.regexp_extract("line", _LSLR_FILE_RX, 1)
    size_s = F.regexp_extract("line", _LSLR_FILE_RX, 2)
    mon = F.regexp_extract("line", _LSLR_FILE_RX, 3)
    day = F.regexp_extract("line", _LSLR_FILE_RX, 4)
    ytime = F.regexp_extract("line", _LSLR_FILE_RX, 5)
    name = F.regexp_extract("line", _LSLR_FILE_RX, 6)
    is_link = mode == "l"
    fname = F.when(
        is_link, F.regexp_replace(name, r" -> .*$", "")
    ).otherwise(name)
    target = F.when(is_link, F.regexp_extract(name, r" -> (.*)$", 1))
    ftype = (
        F.when(mode == "d", "directory")
        .when(is_link, "link")
        .when(mode == "-", "file")
        .otherwise("special")
    )
    date = F.when(
        (ftype == "file") & ytime.rlike(r"^\d{4}$"),
        F.date_format(
            F.to_date(F.concat_ws(" ", mon, day, ytime), "MMM d yyyy"),
            "yyyy-MM-dd",
        ),
    )
    path = F.regexp_replace(
        F.when(F.col("dir").isin("", "."), fname).otherwise(
            F.concat(F.col("dir"), F.lit("/"), fname)
        ),
        r"^(\./|/)+",
        "",
    )
    return (
        scoped.select(
            path.alias("path"),
            ftype.alias("type"),
            F.when(ftype == "file", size_s.cast("long"))
            .otherwise(F.lit(0))
            .alias("size"),
            date.alias("date"),
            target.alias("target"),
        )
        .filter(~F.col("path").rlike(r"(^|/)\.\.?$"))
    )


# `find -ls` form (minecode/ls.py:148-170 with from_find=True): two leading
# numeric columns (inode, size-in-blocks) prefix an ls line whose path is
# the FULL relative path — no directory-context state at all, so the parse
# is a pure map (perfectly parallel at any listing size)
_FINDLS_FILE_RX = (
    r"^\s*\d+\s+\d+\s+([-dlbcps])[rwxsStT-]{9}\s+\d+\s+\S+\s+\S+\s+(\d+)\s+"
    r"([A-Z][a-z]{2})\s+(\d{1,2})\s+(\d{4}|\d{1,2}:\d{2})\s+(.+)$"
)


def parse_find_ls(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """`find -ls` listing -> (path, type, size, date) rows; same Entry
    semantics as parse_lslr but stateless (paths arrive fully qualified)."""
    c = F.col(text_col)
    mode = F.regexp_extract(c, _FINDLS_FILE_RX, 1)
    size_s = F.regexp_extract(c, _FINDLS_FILE_RX, 2)
    mon = F.regexp_extract(c, _FINDLS_FILE_RX, 3)
    day = F.regexp_extract(c, _FINDLS_FILE_RX, 4)
    ytime = F.regexp_extract(c, _FINDLS_FILE_RX, 5)
    rawpath = F.regexp_extract(c, _FINDLS_FILE_RX, 6)
    is_link = mode == "l"
    path = F.regexp_replace(
        F.when(is_link, F.regexp_replace(rawpath, r" -> .*$", "")).otherwise(
            rawpath
        ),
        r"^(\./|/)+",
        "",
    )
    ftype = (
        F.when(mode == "d", "directory")
        .when(is_link, "link")
        .when(mode == "-", "file")
        .otherwise("special")
    )
    date = F.when(
        (ftype == "file") & ytime.rlike(r"^\d{4}$"),
        F.date_format(
            F.to_date(F.concat_ws(" ", mon, day, ytime), "MMM d yyyy"),
            "yyyy-MM-dd",
        ),
    )
    return (
        lines.filter(mode != "")
        .select(
            path.alias("path"),
            ftype.alias("type"),
            F.when(ftype == "file", size_s.cast("long"))
            .otherwise(F.lit(0))
            .alias("size"),
            date.alias("date"),
        )
        .filter(~F.col("path").rlike(r"(^|/)\.\.?$") & (F.col("path") != ""))
    )


def parse_lslr_with_key(
    lines: DataFrame, text_col: str = "value", key_col: str = "_doc"
) -> DataFrame:
    """parse_lslr over exploded in-memory rows: directory context scoped
    by the caller's per-document key instead of input_file_name()."""
    return parse_lslr(lines, text_col, key_col)
