"""compaction_retention_plan dashboard: window algebra, monotonicity,
and agreement with a directly-filtered recount."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_retention_algebra_and_monotonicity(spark):
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.dedup import word_shingles
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    sf_dir = "/root/testdata/sf0.001"
    rows = {
        r["policy"]: r.asDict()
        for r in QUERIES["compaction_retention_plan"](spark, sf_dir).collect()
    }
    assert set(rows) == {
        "keep_025pct",
        "keep_050pct",
        "keep_075pct",
        "keep_100pct",
    }
    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    full = rows["keep_100pct"]
    assert full["retained_docs"] == n
    assert full["retained_frac_e6"] == 1_000_000

    order = ["keep_025pct", "keep_050pct", "keep_075pct", "keep_100pct"]
    for col in ("retained_docs", "posting_rows", "posting_bytes"):
        vals = [rows[p][col] for p in order]
        assert vals == sorted(vals), col
    for row in rows.values():
        assert row["band_rows"] == row["retained_docs"] * 4
        assert row["band_bytes"] == row["band_rows"] * 80
        assert row["posting_bytes"] >= row["posting_rows"] * 9  # sh >= 1 char

    # spot-check one window against a direct recount of the same cut
    cut = rows["keep_050pct"]["cutoff_id"]
    kept = docs.filter(F.col("doc_id") >= cut)
    assert rows["keep_050pct"]["retained_docs"] == kept.count()
    assert (
        rows["keep_050pct"]["posting_rows"]
        == word_shingles(kept, "doc_id", "text", n=3).count()
    )
