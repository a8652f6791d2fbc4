"""Build Spark SQL expression strings with F.concat-like ergonomics.

r15 optimization (guide §5, driver work): the Column-chain builders make
one py4j round trip per F.* node — a large builder costs thousands of
round trips (~0.2-1 ms each on virtualized hosts) before any job runs.
``selectExpr``/``F.expr`` with a single SQL string is one round trip for
the whole expression tree; these helpers keep the call sites as readable
as the chains they replace.

``sql_concat`` mirrors ``F.concat(lit-or-col, ...)``: arguments starting
with a backtick are raw SQL sub-expressions (column references, CASE
expressions, nested calls); everything else is a string literal and is
quoted/escaped. The produced ``concat(...)`` is the same expression the
chain built, so results are byte-identical.
"""

from __future__ import annotations


def sql_lit(s: str) -> str:
    """A single-quoted Spark SQL string literal (escapes ' and \\)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def sql_concat(*parts: str) -> str:
    """concat(...) over literals and raw SQL fragments.

    A part starting with a backtick (`) is inserted verbatim (minus the
    backtick) as a sub-expression; any other part becomes a quoted
    string literal."""
    args = [p[1:] if p.startswith("`") else sql_lit(p) for p in parts]
    return "concat(" + ", ".join(args) + ")"
