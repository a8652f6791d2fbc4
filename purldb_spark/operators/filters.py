"""Predicate compilers — SURVEY §2.2.

The reference's query surface is a set of Django filter classes; the heart is
a query-string mini-language (``packagedb/filters.py:20-55``, imported from
scancode.io) that parses ``field<op>:value`` terms into ORM ``Q`` objects:

    ops: ``=`` iexact, ``^`` istartswith, ``$`` iendswith, ``~`` icontains,
    ``>`` gt, ``<`` lt — as a SUFFIX on the field name; ``-field`` negates;
    terms are shlex-split and AND-combined; a bare term applies the default
    lookup to the default field.

Here the same parse compiles to a Catalyst ``Column`` expression (so the
whole predicate stays JVM-side, pushes down to the scan, and prunes files at
100 TB) and, in parallel, to an ANSI-SQL string used for the DuckDB oracle.

``package_search`` reproduces ``PackageSearchFilter.filter``
(``packagedb/filters.py:77-93``): ``pkg:`` prefix routes to purl lookups
(P4), a ``:`` routes to the mini-language (P5), anything else ORs an
icontains over the search fields (P6).
"""

from __future__ import annotations

import shlex
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from purldb_spark.functions.purl import PackageURL

LOOKUP_OPS = {
    "=": "iexact",
    "^": "istartswith",
    "$": "iendswith",
    "~": "icontains",
    ">": "gt",
    "<": "lt",
}


@dataclass(frozen=True)
class Term:
    field: str
    lookup: str
    value: str
    negated: bool = False


def parse_query_string(
    query_string: str,
    default_lookup: str = "icontains",
    default_field: str = "name",
) -> list[Term]:
    """Shared parse for both compilers; mirrors
    parse_query_string_to_lookups (packagedb/filters.py:20-55)."""
    terms: list[Term] = []
    for raw in shlex.split(query_string):
        lookup = default_lookup
        negated = False
        if ":" in raw:
            field_name, value = raw.split(":", maxsplit=1)
            if field_name.endswith(tuple(LOOKUP_OPS)):
                lookup = LOOKUP_OPS[field_name[-1]]
                field_name = field_name[:-1]
            if field_name.startswith("-"):
                field_name = field_name[1:]
                negated = True
        else:
            value = raw
            field_name = default_field
        terms.append(Term(field_name, lookup, value, negated))
    return terms


def _term_column(term: Term, field_types: dict[str, str]) -> Column:
    col = F.col(_resolve(term.field, field_types))
    is_numeric = field_types.get(term.field, "string") in (
        "int",
        "long",
        "double",
        "float",
        "decimal",
    )
    v = term.value
    if term.lookup == "iexact":
        expr = F.lower(col) == v.lower()
    elif term.lookup == "istartswith":
        expr = F.lower(col).startswith(v.lower())
    elif term.lookup == "iendswith":
        expr = F.lower(col).endswith(v.lower())
    elif term.lookup == "icontains":
        expr = F.lower(col).contains(v.lower())
    elif term.lookup == "gt":
        expr = col > (float(v) if is_numeric else v)
    elif term.lookup == "lt":
        expr = col < (float(v) if is_numeric else v)
    else:
        raise ValueError(f"unknown lookup {term.lookup!r}")
    return ~expr if term.negated else expr


def _sql_quote(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def _term_sql(term: Term, field_types: dict[str, str]) -> str:
    col = _resolve(term.field, field_types)
    is_numeric = field_types.get(term.field, "string") in (
        "int",
        "long",
        "double",
        "float",
        "decimal",
    )
    v = term.value
    lv = _sql_quote(v.lower())
    if term.lookup == "iexact":
        expr = f"lower({col}) = {lv}"
    elif term.lookup == "istartswith":
        expr = f"starts_with(lower({col}), {lv})"
    elif term.lookup == "iendswith":
        expr = f"ends_with(lower({col}), {lv})"
    elif term.lookup == "icontains":
        expr = f"contains(lower({col}), {lv})"
    elif term.lookup == "gt":
        expr = f"{col} > {float(v) if is_numeric else _sql_quote(v)}"
    elif term.lookup == "lt":
        expr = f"{col} < {float(v) if is_numeric else _sql_quote(v)}"
    else:
        raise ValueError(f"unknown lookup {term.lookup!r}")
    return f"(NOT {expr})" if term.negated else f"({expr})"


def _resolve(field: str, field_types: dict[str, str]) -> str:
    if field_types and field not in field_types:
        raise KeyError(f"unknown field {field!r}; expected one of {sorted(field_types)}")
    return field


def compile_query(
    query_string: str,
    field_types: dict[str, str],
    default_field: str,
    default_lookup: str = "icontains",
) -> Column:
    """P5: mini-language -> single AND-folded Column predicate.

    An empty query matches everything (QuerySearchFilter.filter returns the
    queryset unchanged on empty value, packagedb/filters.py:60-62).
    """
    terms = parse_query_string(query_string, default_lookup, default_field)
    if not terms:
        return F.lit(True)
    return reduce(
        lambda a, b: a & b, (_term_column(t, field_types) for t in terms)
    )


def compile_query_sql(
    query_string: str,
    field_types: dict[str, str],
    default_field: str,
    default_lookup: str = "icontains",
) -> str:
    """Same parse, rendered as an ANSI/DuckDB WHERE expression (oracle side)."""
    terms = parse_query_string(query_string, default_lookup, default_field)
    if not terms:
        return "TRUE"
    return " AND ".join(_term_sql(t, field_types) for t in terms)


def keyset_page(df, key: str, after=None, limit: int = 20):
    """S1 at depth: keyset pagination — `key > after ORDER BY key LIMIT n`.
    O(page) at any depth and the predicate pushes into the scan, unlike
    offset pagination which reads and discards `offset` rows
    (packagedb/api_custom.py:13-23 is offset-based; this is the scale
    replacement)."""
    out = df
    if after is not None:
        out = out.filter(F.col(key) > after)
    return out.orderBy(F.col(key).asc()).limit(limit)


def multifield_search(value: str, fields: list[str]) -> Column:
    """P6: default search — OR of case-insensitive contains over fields
    (packagedb/filters.py:88-93)."""
    return reduce(
        lambda a, b: a | b,
        (F.lower(F.col(f)).contains(value.lower()) for f in fields),
    )


def multifield_search_sql(value: str, fields: list[str]) -> str:
    lv = _sql_quote(value.lower())
    return " OR ".join(f"contains(lower({f}), {lv})" for f in fields)


def purl_lookups(purl: str, colmap: dict[str, str]) -> Column:
    """P4: parse a purl into conjunctive equality predicates over the mapped
    columns (packagedb/api.py:276-300, purl_to_lookups)."""
    p = PackageURL.parse(purl)
    preds = []
    for attr in ("type", "namespace", "name", "version", "qualifiers", "subpath"):
        val = getattr(p, attr)
        if val and attr in colmap:
            preds.append(F.col(colmap[attr]) == val)
    if not preds:
        raise ValueError(f"purl {purl!r} produced no lookups")
    return reduce(lambda a, b: a & b, preds)


def purl_lookups_any(purls: list[str], colmap: dict[str, str]) -> Column:
    """OR across multiple purls (packagedb/api.py:294-300)."""
    return reduce(lambda a, b: a | b, (purl_lookups(p, colmap) for p in purls))


def package_search(
    value: str,
    field_types: dict[str, str],
    search_fields: list[str],
    purl_colmap: dict[str, str],
    default_field: str,
) -> Column:
    """PackageSearchFilter.filter dispatch (packagedb/filters.py:77-93)."""
    if value.startswith("pkg:"):
        return purl_lookups(value, purl_colmap)
    if "://" not in value and ":" in value:
        return compile_query(value, field_types, default_field)
    return multifield_search(value, search_fields)
