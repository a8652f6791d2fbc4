"""simhash_width_plan dashboard: width algebra, saturation law, and the
measured width-history ordering (finding 3) reproduced as data."""

from __future__ import annotations


def test_width_algebra_and_saturation_law(spark):
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    rows = {
        r["width"]: r.asDict()
        for r in QUERIES["simhash_width_plan"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows["120bit_shipped"]["is_shipped"] is True
    n = rows["120bit_shipped"]["n_docs"]
    assert n > 0
    for row in rows.values():
        assert row["band_bits"] == row["width_bits"] // 4
        assert row["n_bands"] == 4 and row["hamming_radius"] == 3
        assert row["saturation_docs"] == 2 ** (row["band_bits"] + 1) + 1
        n_longs = -(-row["width_bits"] // 60)  # 60-bit-packed BIGINTs
        assert row["fingerprint_bytes"] == n * 8 * n_longs
        # exact expectation: floor(C(n,2) / 2^band_bits)
        assert row["rand_pairs_per_band"] == (n * (n - 1) // 2) // (
            2 ** row["band_bits"]
        )
    # wider fingerprints strictly reduce random fan-in and raise headroom
    order = ["32bit_legacy", "60bit_unit", "120bit_shipped", "240bit_next"]
    fanins = [rows[w]["rand_pairs_per_band"] for w in order]
    assert fanins == sorted(fanins, reverse=True)
    sats = [rows[w]["saturation_docs"] for w in order]
    assert sats == sorted(sats)
    # the history the dashboard encodes: even this tiny corpus has spent
    # >= 90% of the legacy 32-bit width's budget (saturated at any real
    # scale) while the shipped 120-bit spends essentially none
    assert rows["32bit_legacy"]["headroom_e6"] >= 900_000
    assert rows["120bit_shipped"]["headroom_e6"] == 0
