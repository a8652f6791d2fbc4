"""C9: license-expression combination — SURVEY §2.8
(minecode/indexing.py:208-215 combines per-file detected expressions into a
package-level declared expression; packagedb/models.py:425-435 converts to
SPDX).

The reference delegates to the `license-expression` library. This is a
minimal re-derivation of the subset purldb exercises — combining a bag of
expressions with AND/OR, deduplicating, and deterministic ordering — NOT a
full boolean-expression simplifier (no distribution/absorption laws; that
remains a declared gap for exotic nested expressions).

Column-level combination (the hot path: millions of resources rolling up to
packages) is pure Spark aggregation — see c9_license_combine in
plans/q_overlay.py.
"""

from __future__ import annotations

import re

_TOKEN_RX = re.compile(r"\(|\)|AND|OR|WITH|[A-Za-z0-9][A-Za-z0-9.+-]*", re.IGNORECASE)


def normalize_expression(expr: str) -> str:
    """Lowercase license keys, uppercase operators, single spacing."""
    out: list[str] = []
    for tok in _TOKEN_RX.findall(expr or ""):
        up = tok.upper()
        if up in ("AND", "OR", "WITH"):
            out.append(up)
        elif tok in ("(", ")"):
            out.append(tok)
        else:
            out.append(tok.lower())
    text = " ".join(out)
    return text.replace("( ", "(").replace(" )", ")")


def _needs_parens(expr: str) -> bool:
    return (" AND " in expr or " OR " in expr) and not (
        expr.startswith("(") and expr.endswith(")")
    )


def combine_expressions(
    expressions: list[str], relation: str = "AND", unique: bool = True
) -> str | None:
    """Combine expressions into one, the license_expression.combine shape:
    normalize, optionally dedup, deterministic (sorted) order, parenthesize
    compound sub-expressions."""
    relation = relation.upper()
    if relation not in ("AND", "OR"):
        raise ValueError(f"relation must be AND/OR, got {relation!r}")
    normed = [normalize_expression(e) for e in expressions if e and e.strip()]
    if unique:
        normed = sorted(set(normed))
    if not normed:
        return None
    if len(normed) == 1:
        return normed[0]
    wrapped = [f"({e})" if _needs_parens(e) else e for e in normed]
    return f" {relation} ".join(wrapped)
