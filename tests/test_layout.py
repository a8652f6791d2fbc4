"""Z-order layout properties: normalized Morton bucketing must dominate the
single-key sort across the predicate suite, and per-predicate match counts
are layout-invariant."""

from __future__ import annotations

from purldb_spark.plans.registry import QUERIES, load_inventory
from tests.conftest import SF_CORRECT

load_inventory()


def test_zorder_skipping_dominance(spark):
    rows = QUERIES["layout_zorder_skipping"](spark, SF_CORRECT).collect()
    by = {(r["layout"], r["predicate"]): r for r in rows}
    assert len(by) == 6

    for pred in ("xy_slab", "y_slab"):
        # the filter's own selectivity is a layout-free fact
        assert (
            by[("insertion", pred)]["rows_matching"]
            == by[("single_key", pred)]["rows_matching"]
            == by[("zorder", pred)]["rows_matching"]
        )
        # insertion order prunes nothing
        assert by[("insertion", pred)]["n_touched"] == 64
        # a touched bucket set always covers the matching rows
        for lay in ("insertion", "single_key", "zorder"):
            r = by[(lay, pred)]
            assert r["rows_scanned"] >= r["rows_matching"]
            assert 0 < r["n_touched"] <= r["n_buckets"] == 64

    # the z-order argument: never worse than the single-key sort on its
    # own predicate, dramatically better on the other dim's predicate
    assert (
        by[("zorder", "xy_slab")]["n_touched"]
        <= by[("single_key", "xy_slab")]["n_touched"] + 2
    )
    assert by[("single_key", "y_slab")]["n_touched"] == 64
    assert by[("zorder", "y_slab")]["n_touched"] < 32
