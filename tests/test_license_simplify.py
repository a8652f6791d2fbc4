"""Boolean-simplifier laws, checked semantically: a random expression and
its simplified form must agree under every truth assignment of their atoms,
simplification must be idempotent, and rendering deterministic."""

from __future__ import annotations

from itertools import product

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from purldb_spark.functions.licenses import (
    parse_expression,
    simplify_expression,
)

ATOMS = ["a", "b", "c"]


def _exprs(depth: int):
    if depth == 0:
        return st.sampled_from(ATOMS)
    sub = _exprs(depth - 1)
    return st.one_of(
        st.sampled_from(ATOMS),
        st.tuples(sub, st.sampled_from([" AND ", " OR "]), sub).map(
            lambda t: f"({t[0]}{t[1]}{t[2]})"
        ),
    )


def _eval(node, assignment: dict[str, bool]) -> bool:
    if isinstance(node, str):
        return assignment[node]
    op, args = node
    vals = [_eval(a, assignment) for a in args]
    return all(vals) if op == "AND" else any(vals)


@settings(max_examples=300, deadline=None)
@given(_exprs(3))
def test_simplify_preserves_semantics_and_is_idempotent(expr):
    simplified = simplify_expression(expr)
    before, after = parse_expression(expr), parse_expression(simplified)
    for bits in product([False, True], repeat=len(ATOMS)):
        assignment = dict(zip(ATOMS, bits))
        assert _eval(before, assignment) == _eval(after, assignment), (
            expr,
            simplified,
            assignment,
        )
    assert simplify_expression(simplified) == simplified


def test_with_exception_is_atomic():
    assert simplify_expression("gpl-2.0 WITH x OR gpl-2.0") == "gpl-2.0 OR gpl-2.0 WITH x"
    with pytest.raises(ValueError):
        simplify_expression("gpl-2.0 WITH")


def test_malformed_expressions_raise():
    for bad in ["(a OR b", "a AND", "AND a", "a b OR c)"]:
        with pytest.raises(ValueError):
            simplify_expression(bad)


def test_none_and_empty():
    assert simplify_expression(None) is None
    assert simplify_expression("") is None
