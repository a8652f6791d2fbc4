"""Shared fixtures: one SparkSession per test run, a DuckDB connection with
the same parquet tables registered as views (mirroring the driver's oracle
setup), and a comparer that replicates the driver's row-count + schema +
order-insensitive value check.
"""

from __future__ import annotations

import math
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
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORRECT}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def assert_same_result(spark_df, con, sql, exact_floats=True):
    """Order-insensitive comparison of a Spark DataFrame vs DuckDB SQL."""
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    sp_cols = sorted(sp.columns)
    du_cols = sorted(du.columns)
    assert sp_cols == du_cols, f"column names differ: {sp_cols} vs {du_cols}"
    assert len(sp) == len(du), f"row counts differ: {len(sp)} vs {len(du)}"
    sp_rows = sorted(
        (tuple(_norm(v) for v in row) for row in sp[sp_cols].itertuples(index=False)),
        key=repr,
    )
    du_rows = sorted(
        (tuple(_norm(v) for v in row) for row in du[du_cols].itertuples(index=False)),
        key=repr,
    )
    mismatches = []
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        if a == b:
            continue
        if not exact_floats and _approx_eq_row(a, b):
            continue
        mismatches.append((i, a, b))
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"value mismatches (spark vs duckdb): {mismatches}"


def _approx_eq_row(a, b, rtol=1e-9):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=rtol, abs_tol=1e-12):
                return False
        elif x != y:
            return False
    return True
