"""minhash_band_plan dashboard: S-curve shape and layout algebra."""

from __future__ import annotations


def test_s_curve_shape_and_layout_algebra(spark):
    from purldb_spark.plans.q_minhash_plan import _J_GRID
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    rows = {
        r["layout"]: r.asDict()
        for r in QUERIES["minhash_band_plan"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows["4x2_shipped"]["is_shipped"] is True
    for name, row in rows.items():
        # P(candidate | J) is monotone increasing in J for every layout
        ps = [row[f"p_cand_e6_at_{j}"] for j in _J_GRID]
        assert ps == sorted(ps) and 0 <= ps[0] and ps[-1] <= 1_000_000
        assert row["n_hashes"] == row["n_bands"] * row["rows_per_band"]
        assert row["index_bytes"] == row["n_docs"] * row["n_hashes"] * 32
    # more bands of fewer rows = recall-leaning (higher P at low J);
    # fewer bands of more rows = precision-leaning (lower P at low J)
    assert (
        rows["8x1_recall"]["p_cand_e6_at_25"]
        > rows["4x2_shipped"]["p_cand_e6_at_25"]
        > rows["2x4_precision"]["p_cand_e6_at_25"]
    )
    # exact closed form at the shipped layout's threshold point J=0.5,
    # b=4, r=2: 1 - (1 - 0.25)^4 = 0.68359375 exactly in binary
    assert rows["4x2_shipped"]["p_cand_e6_at_50"] == 683593
