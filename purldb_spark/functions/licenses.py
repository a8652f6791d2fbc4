"""C9: license-expression combination — SURVEY §2.8
(minecode/indexing.py:208-215 combines per-file detected expressions into a
package-level declared expression; packagedb/models.py:425-435 converts to
SPDX).

The reference delegates to the `license-expression` library (a thin layer
over boolean algebra). Two levels are re-derived here:

- combine_expressions: the combining subset purldb's indexing path uses
  (dedup + deterministic order + parenthesize), string-level;
- parse/simplify_expression: a real boolean simplifier over the license
  grammar ``expr := term (OR term)*; term := factor (AND factor)*;
  factor := atom [WITH atom] | ( expr )`` applying associativity
  flattening, commutative dedup, absorption (X OR (X AND Y) = X and its
  dual), and unit collapse — the same laws boolean.py's ``simplify()``
  applies for license-expression's ``.simplify()``. WITH-bound exceptions
  are atomic, as in the SPDX grammar. Rendering is deterministic
  (operands sorted by their rendered string).

Column-level combination (the hot path: millions of resources rolling up to
packages) is pure Spark aggregation — see c9_license_combine in
plans/q_overlay.py.
"""

from __future__ import annotations

import re

# Tokenize only parens and atoms; operators are classified by full-token
# compare in the parser (an alternation like AND|OR|WITH would match as a
# prefix of keys such as oracle-bsd / android-sdk and corrupt the stream).
_TOKEN_RX = re.compile(r"[()]|[A-Za-z0-9][A-Za-z0-9.+-]*")


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


# ------------------------------------------------------ boolean simplify --

_Node = str | tuple  # atom | (op, args tuple)


def _parse_tokens(toks: list[str], i: int = 0) -> tuple[_Node, int]:
    node, i = _parse_term(toks, i)
    args = [node]
    while i < len(toks) and toks[i].upper() == "OR":
        nxt, i = _parse_term(toks, i + 1)
        args.append(nxt)
    return (("OR", tuple(args)) if len(args) > 1 else args[0]), i


def _parse_term(toks: list[str], i: int) -> tuple[_Node, int]:
    node, i = _parse_factor(toks, i)
    args = [node]
    while i < len(toks) and toks[i].upper() == "AND":
        nxt, i = _parse_factor(toks, i + 1)
        args.append(nxt)
    return (("AND", tuple(args)) if len(args) > 1 else args[0]), i


def _parse_factor(toks: list[str], i: int) -> tuple[_Node, int]:
    if i >= len(toks):
        raise ValueError("unexpected end of license expression")
    if toks[i] == "(":
        node, i = _parse_tokens(toks, i + 1)
        if i >= len(toks) or toks[i] != ")":
            raise ValueError("unbalanced parenthesis in license expression")
        return node, i + 1
    if toks[i] == ")" or toks[i].upper() in ("AND", "OR", "WITH"):
        raise ValueError(f"unexpected token {toks[i]!r}")
    atom = toks[i].lower()
    i += 1
    if i < len(toks) and toks[i].upper() == "WITH":
        if i + 1 >= len(toks):
            raise ValueError("WITH without an exception id")
        atom = f"{atom} WITH {toks[i + 1].lower()}"
        i += 2
    return atom, i


def parse_expression(expr: str) -> _Node | None:
    """Parse a license expression into an AST: atoms (license key, or
    'key WITH exception' — atomic per the SPDX grammar) and
    ('AND'|'OR', args) nodes. Returns None for empty input."""
    toks = _TOKEN_RX.findall(expr or "")
    if not toks:
        return None
    node, i = _parse_tokens(toks)
    if i != len(toks):
        raise ValueError(f"trailing tokens in license expression: {toks[i:]}")
    return node


def _render(node: _Node) -> str:
    if isinstance(node, str):
        return node
    op, args = node
    parts = sorted(
        f"({_render(a)})" if isinstance(a, tuple) else _render(a) for a in args
    )
    return f" {op} ".join(parts)


def _operand_set(node: _Node, op: str) -> frozenset[str]:
    """Identity set for absorption under an ``op``-list: atoms are
    singletons; opposite-op nodes contribute their operands' renders."""
    if isinstance(node, tuple) and node[0] != op:
        return frozenset(_render(a) for a in node[1])
    return frozenset([_render(node)])


def _simplify_node(node: _Node) -> _Node:
    if isinstance(node, str):
        return node
    op, args = node
    # associativity: flatten same-op children
    flat: list[_Node] = []
    for a in (_simplify_node(a) for a in args):
        if isinstance(a, tuple) and a[0] == op:
            flat.extend(a[1])
        else:
            flat.append(a)
    # commutativity + idempotence: dedup by canonical render
    uniq: dict[str, _Node] = {}
    for a in flat:
        uniq.setdefault(_render(a), a)
    # absorption: drop a child whose operand set strictly contains a
    # sibling's (X OR (X AND Y) = X; X AND (X OR Y) = X)
    sets = {r: _operand_set(a, op) for r, a in uniq.items()}
    kept = [
        a
        for r, a in uniq.items()
        if not any(other < sets[r] for o, other in sets.items() if o != r)
    ]
    if len(kept) == 1:
        return kept[0]
    return (op, tuple(sorted(kept, key=_render)))


def simplify_expression(expr: str | None) -> str | None:
    """Full normalize + boolean-simplify of one license expression; the
    engine-side twin is a vectorized pandas UDF over this function (license
    algebra is symbolic — the reference also runs it in Python via the
    license-expression lib, minecode/indexing.py:208-215)."""
    node = parse_expression(expr)
    if node is None:
        return None
    return _render(_simplify_node(node))
