"""Driver-side expression TEXT builder for fixture-doc columns (r15 opt).

The x_* miner/collector fixture builders compose thousands of tiny Column
objects (``F.lit``/``F.concat``/``F.when`` chains). In classic PySpark every
one of those calls is a py4j round trip that creates a JVM Column, and every
intermediate ``.select`` re-runs the analyzer over a growing plan; measured
at 0.5-1.5 s of pure driver time per x_* query on this host (guide §1 "where
the time actually was", §5 "the driver should do almost no data work").

This module builds the SAME expressions as Spark SQL *text* with zero JVM
traffic, to be handed to one ``DataFrame.selectExpr`` call, which parses the
whole projection in a single round trip. Semantics are identical by
construction: every helper emits exactly the SQL function/operator that the
corresponding ``pyspark.sql.functions`` wrapper resolves to, and every
converted query stays pinned by its DuckDB oracle.

Only the API surface the builders use is implemented. Operands may be ``X``
nodes, plain strings (treated as LITERALS, unlike F.* which treats bare
strings as column refs — keeps call sites short), ints, or None.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "X",
    "col",
    "lit",
    "concat",
    "concat_ws",
    "when",
    "coalesce",
    "nullif",
    "md5",
    "lower",
    "upper",
    "trim",
    "replace",
    "substring",
    "struct",
    "array",
    "create_map",
    "to_json",
    "array_join",
    "split",
    "fn",
    "sel",
]


def _quote(s: str) -> str:
    # default parser config (escapedStringLiterals=false): backslash is an
    # escape character inside string literals — escape it, the quote, and
    # control characters (raw newlines inside literals are parser-fragile)
    s = (
        s.replace("\\", "\\\\")
        .replace("'", "\\'")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    return "'" + s + "'"


def _x(v) -> "X":
    if isinstance(v, X):
        return v
    return lit(v)


class X:
    """A SQL expression fragment; ``name`` set iff ``.alias`` was called."""

    __slots__ = ("sql", "name")

    def __init__(self, sql: str, name: str | None = None):
        self.sql = sql
        self.name = name

    def item(self) -> str:
        """Render as a selectExpr item (top-level alias allowed)."""
        return f"{self.sql} AS `{self.name}`" if self.name else self.sql

    def alias(self, name: str) -> "X":
        return X(self.sql, name)

    def cast(self, t: str) -> "X":
        return X(f"CAST({self.sql} AS {t})")

    def isNotNull(self) -> "X":
        return X(f"({self.sql} IS NOT NULL)")

    def isNull(self) -> "X":
        return X(f"({self.sql} IS NULL)")

    def contains(self, other) -> "X":
        return X(f"contains({self.sql}, {_x(other).sql})")

    def startswith(self, other) -> "X":
        return X(f"startswith({self.sql}, {_x(other).sql})")

    def endswith(self, other) -> "X":
        return X(f"endswith({self.sql}, {_x(other).sql})")

    def rlike(self, pat: str) -> "X":
        return X(f"({self.sql} RLIKE {_quote(pat)})")

    def isin(self, *vals) -> "X":
        items = ", ".join(_x(v).sql for v in vals)
        return X(f"({self.sql} IN ({items}))")

    def substr(self, pos, length) -> "X":
        return X(f"substring({self.sql}, {_x(pos).sql}, {_x(length).sql})")

    def _bin(self, op: str, other, *, flip: bool = False) -> "X":
        a, b = self.sql, _x(other).sql
        if flip:
            a, b = b, a
        return X(f"({a} {op} {b})")

    def __mod__(self, other):
        return self._bin("%", other)

    def __add__(self, other):
        return self._bin("+", other)

    def __radd__(self, other):
        return self._bin("+", other, flip=True)

    def __sub__(self, other):
        return self._bin("-", other)

    def __mul__(self, other):
        return self._bin("*", other)

    def __eq__(self, other):  # type: ignore[override]
        return self._bin("=", other)

    def __ne__(self, other):  # type: ignore[override]
        return self._bin("!=", other)

    def __lt__(self, other):
        return self._bin("<", other)

    def __le__(self, other):
        return self._bin("<=", other)

    def __gt__(self, other):
        return self._bin(">", other)

    def __ge__(self, other):
        return self._bin(">=", other)

    def __and__(self, other):
        return self._bin("AND", other)

    def __or__(self, other):
        return self._bin("OR", other)

    def __invert__(self):
        return X(f"(NOT {self.sql})")

    __hash__ = None  # not hashable: __eq__ builds an expression


class _Case(X):
    """``when`` chain rendering to CASE WHEN ... [ELSE ...] END."""

    __slots__ = ("_parts", "_other")

    def __init__(self, parts, other=None, name: str | None = None):
        self._parts = parts
        self._other = other
        super().__init__(self._render(), name)

    def _render(self) -> str:
        body = " ".join(
            f"WHEN {c.sql} THEN {v.sql}" for c, v in self._parts
        )
        tail = f" ELSE {self._other.sql}" if self._other is not None else ""
        return f"(CASE {body}{tail} END)"

    def when(self, cond, value) -> "_Case":
        return _Case(self._parts + [(_x(cond), _x(value))])

    def otherwise(self, value) -> "_Case":
        return _Case(self._parts, _x(value))


def col(name: str) -> X:
    return X(f"`{name}`")


def lit(v) -> X:
    if v is None:
        return X("NULL")
    if isinstance(v, bool):
        return X("true" if v else "false")
    if isinstance(v, str):
        return X(_quote(v))
    if isinstance(v, (int, float)):
        return X(repr(v))
    raise TypeError(f"unsupported literal: {type(v)}")


def when(cond, value) -> _Case:
    return _Case([(_x(cond), _x(value))])


def fn(fname: str, *args) -> X:
    """Generic function call: fn('md5', c) -> md5(c)."""
    return X(f"{fname}({', '.join(_x(a).sql for a in args)})")


def concat(*args) -> X:
    return fn("concat", *args)


def concat_ws(sep: str, *args) -> X:
    return fn("concat_ws", lit(sep), *args)


def coalesce(*args) -> X:
    return fn("coalesce", *args)


def nullif(a, b) -> X:
    return fn("nullif", a, b)


def md5(c) -> X:
    return fn("md5", c)


def lower(c) -> X:
    return fn("lower", c)


def upper(c) -> X:
    return fn("upper", c)


def trim(c) -> X:
    return fn("trim", c)


def replace(c, search, repl) -> X:
    return fn("replace", c, search, repl)


def substring(c, pos: int, length: int) -> X:
    return fn("substring", c, lit(pos), lit(length))


def struct(*fields) -> X:
    """named_struct from ALIASED X fields (field names = aliases),
    mirroring ``F.struct(x.alias("a"), ...)``."""
    parts: list[str] = []
    for f in fields:
        if not isinstance(f, X) or f.name is None:
            raise ValueError("struct fields must be aliased X expressions")
        parts.append(_quote(f.name))
        parts.append(f.sql)
    return X(f"named_struct({', '.join(parts)})")


def array(*items) -> X:
    return fn("array", *items)


def create_map(*kv) -> X:
    return fn("map", *kv)


def to_json(c) -> X:
    return fn("to_json", c)


def array_join(c, sep: str) -> X:
    return fn("array_join", c, lit(sep))


def split(c, pat: str) -> X:
    return fn("split", c, lit(pat))


def base64(c) -> X:
    return fn("base64", c)


def unhex(c) -> X:
    return fn("unhex", c)


def sel(df: DataFrame, *items) -> DataFrame:
    """One selectExpr call for a mix of X nodes and raw SQL strings."""
    return df.selectExpr(
        *[i.item() if isinstance(i, X) else i for i in items]
    )
