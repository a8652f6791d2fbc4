"""Table loading helpers over the driver-provided parquet test data.

The synthetic star schema stands in for the purldb catalog per FIXTURES.md §9:
``part`` ~ packages, ``lineitem`` ~ resources (FK join), ``orders`` ~ scan
queue, ``events`` ~ resource_uris stream, ``documents``/``embeddings`` for the
training-data-pipeline operators.

Scale notes (100 TB design): these helpers read plain parquet directories.
On a production lake the same tables would be written partitioned by a
low-cardinality dispatch column (``type`` for packages — SURVEY §4), with
files sorted/Z-ORDERed on the point-lookup keys (sha1, name, download_url)
so min/max file skipping replaces the reference's B-tree indexes. The query
code below never relies on single-file layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Small dimension tables that should always broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier"}


# Lazy-DataFrame memo, keyed by (session, sf_dir, table).  This caches the
# ANALYZED READ PLAN only — never data: every action over the returned
# DataFrame still scans the parquet files.  Rationale (r15 optimization
# round, guide §6): each spark.read.parquet() call pays directory listing +
# footer schema inference + a dozen py4j round trips, and the 241-query
# bench issues hundreds of load() calls for the same ten tables.  At 100 TB
# the same dedupe is what a catalog (metastore / Iceberg manifest) gives
# you: resolve the table once per session, not once per query.  Keyed by
# applicationId so a new session (different conf, restarted JVM) re-reads;
# plain dict ops are atomic under the GIL, and a rare duplicate build on a
# racing first call is harmless (both values are equivalent lazy plans).
_DF_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    memo = _DF_MEMO.get(key)
    if memo is not None:
        return memo
    if name == "events":
        # events stores TIMESTAMP(NANOS), which Spark refuses by default.
        # Set the legacy conf at runtime (works on any session — the DRIVER's
        # session won't have it in its builder) and convert below.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # parquet TIMESTAMP(NANOS) arrives as long (nanosAsLong); truncate to
        # microseconds — the same thing DuckDB does when reading TIMESTAMP_NS
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer div — ns epochs exceed double's exact-int range
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # drop other sessions' entries so a long-lived test process cycling
    # sessions does not accumulate dead JVM references
    app = key[0]
    for k in [k for k in list(_DF_MEMO) if k[0] != app]:
        _DF_MEMO.pop(k, None)
    _DF_MEMO[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
