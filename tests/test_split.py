"""Leakage-safe splitting: the by_cluster invariant, naive-baseline
contrast, determinism, and degenerate inputs."""

from __future__ import annotations

import pyspark.sql.types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def test_cluster_split_never_leaks(spark):
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    rows = QUERIES["split_leakage_safe"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_m = {}
    for r in rows:
        by_m.setdefault(r["method"], []).append(r)
    # every split row of the cluster method is leak-free BY CONSTRUCTION
    assert all(r["n_pairs_leaked"] == 0 for r in by_m["by_cluster"])
    # both methods partition the same corpus
    assert sum(r["n_docs"] for r in by_m["by_cluster"]) == sum(
        r["n_docs"] for r in by_m["by_doc"]
    )
    # pair conservation: internal + leaked/2 sums to the same pair count
    # in both methods (each leaked pair appears in exactly two rows)
    def pair_total(rs):
        return sum(r["n_pairs_internal"] for r in rs) + sum(
            r["n_pairs_leaked"] for r in rs
        ) // 2

    assert pair_total(by_m["by_cluster"]) == pair_total(by_m["by_doc"])


def test_split_on_empty_corpus(spark, tmp_path):
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    sf = str(tmp_path)
    spark.createDataFrame([], DOC_SCHEMA).write.parquet(
        f"{sf}/documents.parquet"
    )
    assert QUERIES["split_leakage_safe"](spark, sf).count() == 0
