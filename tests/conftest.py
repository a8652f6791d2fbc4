"""Shared fixtures: one SparkSession per test run, a DuckDB connection with
the same parquet tables registered as views (mirroring the driver's oracle
setup), and a comparer that replicates the driver's row-count + schema +
order-insensitive value check.
"""

from __future__ import annotations


import os

import duckdb
import pytest

from purldb_spark.catalog.tables import TABLES
from purldb_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("purldb_spark_tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    # Structural 2 GB cap: every oracle in the suite must fit the same
    # memory envelope the manual probes enforced (this gate caught three
    # OOM-prone oracles in rounds 9-13; AS MATERIALIZED CTEs are the fix).
    con.execute("SET memory_limit='2GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORRECT}/{t}.parquet'"
        )
    yield con
    con.close()


def assert_same_result(spark_df, con, sql):
    """Order-insensitive, repr-strict comparison of a Spark DataFrame vs
    DuckDB SQL. repr-strict means dtype drift (e.g. DuckDB HUGEINT coming
    back as Python int vs Spark's int64) fails too — the driver hashes
    values, so representation matters, not just Python ``==``."""
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    sp_cols = sorted(sp.columns)
    du_cols = sorted(du.columns)
    assert sp_cols == du_cols, f"column names differ: {sp_cols} vs {du_cols}"
    assert len(sp) == len(du), f"row counts differ: {len(sp)} vs {len(du)}"
    sp_rows = sorted(map(repr, sp[sp_cols].itertuples(index=False)))
    du_rows = sorted(map(repr, du[du_cols].itertuples(index=False)))
    mismatches = [
        (a, b) for a, b in zip(sp_rows, du_rows) if a != b
    ][:5]
    assert not mismatches, f"value mismatches (spark vs duckdb): {mismatches}"
