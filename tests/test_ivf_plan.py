"""ivf_probe_plan dashboard: probe-policy algebra and the shipped law."""

from __future__ import annotations


def test_probe_policy_algebra(spark):
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    rows = {
        r["plan"]: r.asDict()
        for r in QUERIES["ivf_probe_plan"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {
        "probe_1_fixed",
        "probe_floor_min",
        "probe_sqrt_shipped",
        "probe_2x_sqrt",
    }
    shipped = rows["probe_sqrt_shipped"]
    assert shipped["is_shipped"] is True
    n, k = shipped["n_vecs"], shipped["nlist"]
    assert k == max(8, n // 250)
    # every verification corpus floors the law at MIN_NPROBE = 2
    assert shipped["nprobe"] == 2 == rows["probe_floor_min"]["nprobe"]
    for row in rows.values():
        assert 1 <= row["nprobe"] <= k
        assert row["probed_vecs_per_query"] == (n * row["nprobe"]) // k
        assert row["probed_frac_e6"] == (row["nprobe"] * 1_000_000) // k
        assert row["reorder_depth"] == 10 * row["nprobe"]
    # probe volume is monotone in the policy ordering
    order = [
        "probe_1_fixed",
        "probe_floor_min",
        "probe_sqrt_shipped",
        "probe_2x_sqrt",
    ]
    vols = [rows[p]["probed_vecs_per_query"] for p in order]
    assert vols == sorted(vols)


def test_shipped_law_sublinear_at_scale():
    """Off-corpus algebra: at production N the shipped policy's probe
    volume is ~sqrt(250 N) (sublinear) while probe_1's is N/k ~ 250."""
    import math

    vols = {}
    for n in (10**6, 10**8, 10**10):
        k = max(8, n // 250)
        isq = max(2, math.isqrt(k))
        vols[n] = (n * min(isq, k)) // k
        # sqrt(250*N) within integer-truncation slack
        assert abs(vols[n] - math.isqrt(250 * n)) <= isq + 250
    # sqrt growth: 100x the corpus ~ 10x the probe volume, not 100x
    assert 9 <= vols[10**8] / vols[10**6] <= 11
    assert 9 <= vols[10**10] / vols[10**8] <= 11
