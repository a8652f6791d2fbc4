"""S9: CSV transform sink (minecode/filter.py:18-77 — SourceForge CSV
enrichment) + C4 version-hint extraction (minecode/version.py:13-89).

The reference walks CSV rows in Python applying ~25 version regexes to the
filename; here the cascade is a single coalesce of regexp_extract columns —
one JVM pass, trivially parallel over any CSV size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ordered cascade (first hit wins), condensed from minecode/version.py:
# explicit markers, then v-prefixed, then plain dotted versions
_VERSION_PATTERNS = [
    r"[_-](\d+\.\d+(?:\.\d+)*(?:[-_.]?(?:alpha|beta|rc|dev|pre)\d*)?)\.(?:tar|zip|tgz|jar|gem|whl)",
    r"[_-]v(\d+\.\d+(?:\.\d+)*)",
    r"[_-](\d+\.\d+(?:\.\d+)*)",
    r"(\d+\.\d+(?:\.\d+)*)",
]


def version_hint(col: str | Column) -> Column:
    """C4: first matching version pattern in a filename, else null."""
    c = F.col(col) if isinstance(col, str) else col
    candidates = [F.regexp_extract(c, p, 1) for p in _VERSION_PATTERNS]
    out = None
    for cand in candidates:
        cleaned = F.when(cand != "", cand)
        out = cleaned if out is None else F.coalesce(out, cleaned)
    return out


def enrich_csv(df: DataFrame, filename_col: str = "filename") -> DataFrame:
    """S9: add extracted version + package-name stem columns."""
    return df.withColumn("version_hint", version_hint(filename_col)).withColumn(
        "name_stem",
        F.regexp_extract(F.col(filename_col), r"^([A-Za-z][A-Za-z0-9_.+-]*?)[_-]v?\d", 1),
    )


def enrich_csv_file(spark: SparkSession, in_path: str, out_path: str) -> None:
    df = spark.read.option("header", "true").csv(in_path)
    enrich_csv(df).write.mode("overwrite").option("header", "true").csv(out_path)
