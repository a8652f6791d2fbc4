"""dedup_cost_plan invariants: method algebra over the shared fixtures."""

from __future__ import annotations


def test_cost_plan_algebra(spark):
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    sf = "/root/testdata/sf0.001"
    rows = {
        r["method"]: r.asDict()
        for r in QUERIES["dedup_cost_plan"](spark, sf).collect()
    }
    n_docs = spark.read.parquet(sf + "/documents.parquet").count()
    assert rows["exact"]["index_rows"] == n_docs
    # banded methods store one row per (doc, band): 4 bands each
    assert rows["minhash_4x2"]["index_rows"] == 4 * n_docs
    assert rows["simhash_120bit"]["index_rows"] == 4 * n_docs
    # the df cap can only DROP posting rows and fan-in
    assert (
        rows["ngram_capped_16"]["index_rows"]
        <= rows["ngram_uncapped"]["index_rows"]
    )
    assert (
        rows["ngram_capped_16"]["candidate_fanin"]
        <= rows["ngram_uncapped"]["candidate_fanin"]
    )
    for r in rows.values():
        assert r["candidate_fanin"] >= 0 and r["index_rows"] >= 0
