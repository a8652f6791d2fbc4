"""Meta-test: the shared prebuild (plans/fixture_warmup.py) must cover
every public fixture in plans/fixture_cache.py — a fixture added without a
prebuild line silently re-attributes its build cost to whichever bench or
plan-audit query touches it first (the j1_fk_join_bucketed 30.6 MB lesson).
"""

from __future__ import annotations

import inspect


def test_prebuild_covers_every_public_fixture():
    import purldb_spark.plans.fixture_cache as fc
    import purldb_spark.plans.fixture_warmup as fw

    src = inspect.getsource(fw._prebuild_steps)
    public = [
        n
        for n, obj in vars(fc).items()
        if inspect.isfunction(obj)
        and not n.startswith("_")
        and obj.__module__ == fc.__name__
        and n != "cached_fixture"  # the cache primitive, not a fixture
    ]
    missing = [n for n in public if n not in src]
    assert not missing, (
        f"fixtures missing from fixture_warmup.prebuild_fixtures: {missing}"
    )


def test_prebuild_runs_and_is_idempotent(spark):
    from purldb_spark.plans.fixture_warmup import prebuild_fixtures
    from tests.conftest import SF_SMOKE

    first = prebuild_fixtures(spark, SF_SMOKE)
    again = prebuild_fixtures(spark, SF_SMOKE)
    assert first >= 0
    # everything cached: the second pass is pure cache hits
    assert again <= max(first, 1.0)
