"""Pin the fixture_runtime hash-exclusion invariant (r12 verdict #2).

``plans/fixture_runtime.py`` is in ``tools/query_hashes._EXCLUDED``: edits
to it do not re-stale oracle queries for driver re-verification.  That is
only sound while the module stays semantics-free, which needs two
mechanical guarantees:

1. fixture_runtime imports NOTHING from purldb_spark — a semantic import
   there would smuggle result-shaping code out of every query's hash
   closure.
2. No registered query's closure contains fixture_runtime.py, so a
   lock-only edit produces zero oracle claimants (tools/claimants.py).
"""

from __future__ import annotations

import os
import re

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNTIME = os.path.join(HERE, "purldb_spark", "plans", "fixture_runtime.py")


def test_runtime_module_imports_no_purldb_code():
    src = open(RUNTIME, encoding="utf-8").read()
    # the same import regex the hash tool uses — if it can't see a
    # purldb_spark import here, neither can the closure walk
    hits = re.findall(
        r"^\s*(?:from|import)\s+(purldb_spark(?:\.\w+)*)", src, re.M
    )
    assert hits == [], (
        f"fixture_runtime must stay import-isolated from purldb_spark "
        f"(hash-excluded module); found {hits}"
    )


def test_runtime_module_outside_every_query_closure():
    import sys

    sys.path.insert(0, os.path.join(HERE, "tools"))
    import query_hashes as qh

    assert "purldb_spark.plans.fixture_runtime" in qh._EXCLUDED
    # fixture_cache is the package's single entry point into the runtime
    # module; if its closure excludes fixture_runtime.py, every query's
    # closure does (queries reach the runtime only through fixture_cache)
    closure = qh._closure_files(HERE, "purldb_spark.plans.fixture_cache")
    assert RUNTIME not in closure, (
        "fixture_runtime.py leaked into the hash closure — lock edits "
        "would re-stale every fixture-cache query again"
    )
    assert any(p.endswith("fixture_cache.py") for p in closure)


def test_runtime_functions_are_semantics_free_surface():
    """The public runtime surface is caching/lease plumbing only; anything
    result-shaping (build functions, cache keys, bucket counts) must live
    in fixture_cache.py inside the hash closure."""
    from purldb_spark.plans import fixture_runtime as rt

    public = sorted(
        n
        for n, obj in vars(rt).items()
        if callable(obj) and not n.startswith("_")
        and getattr(obj, "__module__", "") == rt.__name__
    )
    assert public == [
        "build_seconds_by_key",
        "build_seconds_total",
        "cached_fixture",
        "cached_model",
        "claim_bucketed_dir",
        "touch_owner",
    ], f"unexpected public runtime surface: {public}"


def test_build_ledger_charges_builds_not_hits():
    """The build-cost ledger (r14: bench.py lazy-fixture attribution)
    records wall seconds per build exactly once: a cache hit adds
    nothing, a second distinct key accumulates separately. Pure-Python
    check — no Spark session needed."""
    import time as _time

    from purldb_spark.plans import fixture_runtime as rt

    cache: dict = {}
    before = rt.build_seconds_total()

    def build_slow():
        _time.sleep(0.02)
        return "artifact"

    key = ("test-app", "ledger-probe-key")
    assert rt._get_or_build(cache, "test-app", key, build_slow) == "artifact"
    mid = rt.build_seconds_total()
    assert mid - before >= 0.02
    # hit: no build, no charge
    assert rt._get_or_build(cache, "test-app", key, build_slow) == "artifact"
    assert rt.build_seconds_total() == mid
    assert rt.build_seconds_by_key().get("ledger-probe-key", 0.0) >= 0.02
    # cleanup so repeated in-process runs don't accumulate test keys
    with rt._CACHE_LOCK:
        rt._BUILD_SECONDS.pop("ledger-probe-key", None)
        rt._BUILD_LOCKS.pop(key, None)
