"""Prefix-filtered set-similarity join (plans/q_prefix.py, t = 0.8):
exactness vs brute force on synthetic corpora, identity with the
all-pairs registry query at the same threshold, and the boilerplate-
flood candidate collapse that is the operator's regime argument."""

from __future__ import annotations

import itertools

from purldb_spark.plans.q_prefix import dedup_ngram_prefix
from purldb_spark.plans.registry import QUERIES, load_inventory

SF = "/root/testdata/sf0.001"


def test_identical_to_exact_all_pairs_on_testdata(spark):
    load_inventory()
    # the all-pairs exact query emits jaccard >= 0.5; restrict to the
    # prefix query's 0.8 threshold — the sets must coincide exactly
    exact = {
        (r.doc_a, r.doc_b, r.intersection, round(r.jaccard, 12))
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF).collect()
        if r.jaccard >= 0.8
    }
    pfx = {
        (r.id_a, r.id_b, r.intersection, round(r.jaccard, 12))
        for r in dedup_ngram_prefix(spark, SF).collect()
    }
    assert pfx == exact and len(pfx) > 0


def test_exact_vs_bruteforce_on_synthetic(spark, tmp_path):
    """Brute-force jaccard over word-3-shingle sets of a hand corpus —
    including a near-pair whose only common shingles are its most
    FREQUENT ones (the case a wrong prefix order drops)."""
    common = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (0, common + " alpha beta gamma"),
        (1, common + " alpha beta delta"),
        (2, common),
        (3, "completely different text with no overlap at all here okay"),
        (4, "completely different text with no overlap at all here too"),
        (5, "short one"),
        (6, "twin texts that are fully identical word for word here"),
        (7, "twin texts that are fully identical word for word here"),
    ]
    ddir = str(tmp_path / "documents.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(ddir)
    # doc_shingles loads <sf_dir>/documents.parquet via catalog.tables.load
    sf_dir = str(tmp_path)

    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    exp = set()
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        sa, sb = shingles(ta), shingles(tb)
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter and inter / len(sa | sb) >= 0.8:
            exp.add((min(ia, ib), max(ia, ib), inter))
    got = {
        (r.id_a, r.id_b, r.intersection)
        for r in dedup_ngram_prefix(spark, sf_dir).collect()
    }
    assert got == exp and len(exp) >= 2


def test_flood_candidate_collapse(spark, tmp_path):
    """The regime argument (module docstring): a boilerplate shingle
    shared by k docs puts k^2 pair rows through the classic counting
    plan, while rarest-first prefixes exclude hot shingles — candidate
    volume collapses to ~zero and the join stays EXACT."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from purldb_spark.plans.fixture_cache import doc_shingles

    boiler = "this content is provided as is without warranty of any kind"
    docs = [
        (i, boiler + f" unique tail {i} marker {i * 7} end {i * 13}")
        for i in range(60)
    ]
    (
        spark.createDataFrame(docs, "doc_id long, text string")
        .write.parquet(str(tmp_path / "documents.parquet"))
    )
    sf_dir = str(tmp_path)
    sh = doc_shingles(spark, sf_dir)

    # classic counting plan's exchange volume: pair rows before dedup
    full_pair_rows = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .count()
    )
    df_tbl = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    prefix = (
        sh.join(df_tbl, "sh")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "sh")
            ),
        )
        .join(sizes, "doc_id")
        .filter(F.col("rn") <= F.col("n") - F.expr("(4*n + 4) div 5") + 1)
        .select("doc_id", "sh")
    )
    prefix_pair_rows = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .count()
    )
    # boilerplate alone contributes >= 9 shingles x C(60,2) pair rows
    assert full_pair_rows >= 9 * (60 * 59) // 2
    # prefixes hold each doc's rarest (unique-tail) shingles only
    assert prefix_pair_rows == 0
    # and the join itself stays exact: no pair reaches jaccard 0.8
    assert dedup_ngram_prefix(spark, sf_dir).count() == 0
