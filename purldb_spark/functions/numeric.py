"""Exact-arithmetic helpers for oracle-comparable aggregates.

Summing doubles is order-dependent; Spark's shuffle order differs from
DuckDB's scan order, so ``SUM(double)`` can differ in the last bits and break
value-hash comparison. We therefore cast inputs to DECIMAL (exact, associative
sum), aggregate, and cast the final result back to DOUBLE — both engines then
produce bit-identical doubles. This mirrors how the reference relies on
Postgres NUMERIC for money-ish columns.

At scale this costs nothing: decimal sums stay inside whole-stage codegen and
partial (map-side) aggregation still applies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# enough integer headroom for 100 TB row counts at these magnitudes
DEC = "decimal(30,4)"


def dsum(col: str | Column, scale: int = 4) -> Column:
    """Exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def dsum_expr(col: Column) -> Column:
    """Exact sum of an already-decimal expression, as double."""
    return F.sum(col).cast("double")


def davg(col: str | Column, scale: int = 4) -> Column:
    """Exact-sum-based average: cast(sum as double)/count — deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(30,{scale})")).cast("double")
        / F.count(c).cast("double")
    )


def dec(col: str | Column, scale: int = 4) -> Column:
    """Decimal cast for values that enter PRODUCTS. Precision 18 (not 30):
    Spark caps decimal precision at 38 and silently ROUNDS when a product's
    required precision exceeds it — (30,4)×(8,4) needs 39 and loses digits,
    while (18,4)×(8,4)×(8,4) stays exact end-to-end. DuckDB keeps the wide
    product exact, so an overflowing Spark product diverges from the oracle
    in the 9th decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


# SQL-side equivalents (DuckDB dialect == ANSI here).
# The double cast routes through VARCHAR: DuckDB's direct DECIMAL->DOUBLE
# cast computes int128->double then divides by 10^scale (two roundings, off
# by 1 ulp for >2^53 unscaled values), while the string parse — like Spark's
# BigDecimal.doubleValue — is correctly rounded.
def sql_dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS VARCHAR) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS VARCHAR) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE)"
    )
