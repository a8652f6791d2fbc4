"""Property-based tests (hypothesis) for the pure-python kernels whose
invariants the distributed operators lean on: the natural-version total
order, purl round-tripping, and the query-string parser.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from purldb_spark.functions.purl import PackageURL
from purldb_spark.functions.versions import nat_version_key_py as key
from purldb_spark.operators.filters import parse_query_string

# dotted numeric versions with optional prerelease suffix
versions = st.builds(
    lambda parts, pre: ".".join(map(str, parts)) + (f"-beta{pre}" if pre is not None else ""),
    st.lists(st.integers(0, 999), min_size=1, max_size=4),
    st.one_of(st.none(), st.integers(0, 9)),
)


def semantic(v: str):
    """Ground-truth comparator: core segment tuple, then release flag
    (prerelease < release), then prerelease segment tuple."""
    core, dash, pre = v.partition("-")
    core_nums = tuple(int(x) for x in re.findall(r"\d+", core))
    pre_nums = tuple(int(x) for x in re.findall(r"\d+", pre))
    return (core_nums, 0 if dash else 1, pre_nums)


@given(versions, versions)
@settings(max_examples=300)
def test_version_key_is_order_isomorphic(a, b):
    """key(a) < key(b) iff semantic(a) < semantic(b) — the string key is an
    order isomorphism, so JVM-side string sorts equal true version sorts."""
    # identical numeric tuples with same release-ness are equal-keyed
    assert (key(a) < key(b)) == (semantic(a) < semantic(b))
    assert (key(a) == key(b)) == (semantic(a) == semantic(b))


purl_names = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", min_size=1, max_size=20
).filter(lambda s: not s.startswith((".", "-")))


@given(
    st.sampled_from(["npm", "pypi", "maven", "cargo", "gem"]),
    st.one_of(st.none(), purl_names),
    purl_names,
    st.one_of(st.none(), versions),
)
@settings(max_examples=200)
def test_purl_roundtrip_property(ptype, namespace, name, version):
    p = PackageURL(ptype, namespace, name, version)
    s = p.to_string()
    q = PackageURL.parse(s)
    assert (q.type, q.namespace, q.name, q.version) == (
        ptype,
        namespace,
        name,
        version,
    )


@given(
    st.integers(0, 5000),
    st.lists(st.integers(0, 5000), min_size=1, max_size=40),
)
@settings(max_examples=300)
def test_f5_size_band_tier_containment(q_size, cand_sizes):
    """The ±1 size-bucket banding in f5_rank_tiebreak is lossless: whenever
    the banded window holds a candidate with |Δ| <= B, the window's
    min-size_diff tier equals the exact global tier; otherwise the plan's
    exact fallback fires. Mirrors plans/q_match.py:_F5_BUCKET logic."""
    from purldb_spark.plans.q_match import _F5_BUCKET as B

    qb = q_size // B
    window = [c for c in cand_sizes if abs(c // B - qb) <= 1]
    global_min = min(abs(c - q_size) for c in cand_sizes)
    global_tier = sorted(
        i for i, c in enumerate(cand_sizes) if abs(c - q_size) == global_min
    )
    win_diffs = [abs(c - q_size) for c in window]
    if win_diffs and min(win_diffs) <= B:
        # safe path taken by the plan: window tier must equal global tier
        win_min = min(win_diffs)
        win_tier = sorted(
            i
            for i, c in enumerate(cand_sizes)
            if abs(c // B - qb) <= 1 and abs(c - q_size) == win_min
        )
        assert win_min == global_min
        assert win_tier == global_tier
    # else: the plan recomputes exactly (fallback) — nothing to prove


@given(st.lists(st.tuples(
    st.sampled_from(["name", "type", "brand", "size"]),
    st.sampled_from(["=", "^", "$", "~", ">", "<"]),
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789.#", min_size=1, max_size=10),
    st.booleans(),
), min_size=1, max_size=5))
@settings(max_examples=200)
def test_query_string_parse_roundtrip(terms):
    """Rendering terms back to the mini-language and reparsing is lossless."""
    qs = " ".join(
        f"{'-' if neg else ''}{field}{op}:{value}" for field, op, value, neg in terms
    )
    parsed = parse_query_string(qs)
    from purldb_spark.operators.filters import LOOKUP_OPS

    assert len(parsed) == len(terms)
    for t, (field, op, value, neg) in zip(parsed, terms):
        assert t.field == field
        assert t.lookup == LOOKUP_OPS[op]
        assert t.value == value
        assert t.negated == neg


@given(
    st.sampled_from(["npm", "pypi", "maven", "cargo", "gem"]),
    st.one_of(st.none(), purl_names),
    purl_names,
    st.one_of(st.none(), versions),
)
@settings(max_examples=200)
def test_purl_validity_regex_agrees_with_parser(ptype, namespace, name, version):
    """operators/validate.py's column regex accepts exactly the purls
    functions/purl.py::PackageURL.parse accepts, on well-formed purls and
    their canonical mutations (no scheme / no name)."""
    import re

    from purldb_spark.operators.validate import _PURL_RX

    rx = re.compile(_PURL_RX)
    s = PackageURL(ptype, namespace, name, version).to_string()
    assert rx.match(s), s
    # canonical mutations must be rejected by BOTH
    no_scheme = s[len("pkg:"):]
    assert not rx.match(no_scheme)
    try:
        PackageURL.parse(no_scheme)
        raised = False
    except ValueError:
        raised = True
    assert raised
    no_name = f"pkg:{ptype}"
    assert not rx.match(no_name)
    try:
        PackageURL.parse(no_name)
        raised = False
    except ValueError:
        raised = True
    assert raised


# ---------------------------------------------------------------------------
# UniMax waterfilling closed form (plans/q_select.py::select_unimax_budget)
# ---------------------------------------------------------------------------


def _waterfill(caps: list[int], budget: int):
    """Reference replica of the closed form the Spark/SQL windows compute:
    sort by (capacity, idx); a row is capped iff capacity * remaining <=
    remaining budget at its position, taken as a running MIN (prefix);
    uncapped rows share the leftover uniformly (floor)."""
    n = len(caps)
    order = sorted(range(n), key=lambda i: (caps[i], i))
    prefix = 0
    run = 1
    flags = []
    for pos, i in enumerate(order, start=1):
        cond = 1 if caps[i] * (n - pos + 1) <= budget - prefix else 0
        run = min(run, cond)
        flags.append(run)
        prefix += caps[i]
    k = sum(flags)
    pk = sum(caps[i] for f, i in zip(flags, order) if f)
    level = (budget - pk) // max(n - k, 1)
    alloc = [0] * n
    for f, i in zip(flags, order):
        alloc[i] = caps[i] if f else level
    return alloc, flags, order, level, k


@given(
    st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=99),
)
@settings(max_examples=300, deadline=None)
def test_unimax_waterfill_axioms(caps, pct):
    budget = sum(caps) * pct // 100
    alloc, flags, order, level, k = _waterfill(caps, budget)
    n = len(caps)
    # never exceed a language's own capacity-epoch cap
    assert all(0 <= a <= max(c, level) for a, c in zip(alloc, caps))
    for f, i in zip(flags, order):
        if f:
            assert alloc[i] == caps[i]
    # budget conservation: total within floor loss of the budget, never over
    total = sum(alloc)
    if k < n:
        assert total <= budget
        assert total >= budget - (n - k)  # floor loses < 1 per uncapped row
    else:
        # everything fits: entire corpus allocated, budget covers it
        assert total == sum(caps) and total <= budget
    # the capped set is a PREFIX of the capacity order (the property that
    # makes the running-MIN window correct)
    assert flags == sorted(flags, reverse=True)
    # water level dominates every capped capacity (uncapped rows never get
    # less than a capped row's full corpus)
    if k < n:
        for f, i in zip(flags, order):
            if f:
                assert caps[i] <= level + 1  # +1 for integer floor


# ---------------------------------------------------------------------------
# sqrt-temperature smoothing (plans/q_select.py::mix_temperature_sampling)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.integers(min_value=100, max_value=10**12), min_size=2, max_size=10
    )
)
@settings(max_examples=300, deadline=None)
def test_temperature_smoothing_flattens_toward_uniform(tokens):
    import math

    w = [math.floor(1e6 * math.sqrt(t)) for t in tokens]
    tot_t, tot_w = sum(tokens), sum(w)
    n = len(tokens)
    # NOT every share moves toward 1/n (middle shares can move away when
    # the distribution is multi-modal — hypothesis found [100, 556021,
    # 1094592] where the middle share GROWS past uniform); the true
    # invariants of p^alpha smoothing with 0 < alpha < 1 are:
    # 1) relative-gain monotonicity: smaller languages gain relatively —
    #    w_i * t_j >= w_j * t_i whenever t_i <= t_j (exact integers)
    for i in range(n):
        for j in range(n):
            if tokens[i] <= tokens[j]:
                # sqrt(t_i)t_j >= sqrt(t_j)t_i up to the e6 floor: compare
                # on the grid with the floor slack of one w unit
                assert (w[i] + 1) * tokens[j] >= (w[j] - 1) * tokens[i]
    # 2) the extremes move toward uniform: max share shrinks, min grows
    p_raw = [t * 1_000_000 // tot_t for t in tokens]
    p_samp = [wi * 1_000_000 // tot_w for wi in w]
    i_max = max(range(n), key=lambda i: (tokens[i], i))
    i_min = min(range(n), key=lambda i: (tokens[i], -i))
    assert p_samp[i_max] <= p_raw[i_max] + 2
    assert p_samp[i_min] >= p_raw[i_min] - 2
    # 3) sqrt preserves the order of the raw counts
    order_raw = sorted(range(n), key=lambda i: (tokens[i], i))
    order_w = sorted(range(n), key=lambda i: (w[i], i))
    assert order_raw == order_w
