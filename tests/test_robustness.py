"""Edge-input robustness: degenerate scan JSON through S7, and the SimHash
pigeonhole-banding guarantee checked against brute force."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from purldb_spark.operators.dedup import simhash_near_pairs
from purldb_spark.sources.scan_json import ingest_scan


def test_scan_ingest_degenerate_inputs(spark, tmp_path):
    """Empty files array, missing extra_data, dir without fingerprints —
    every output table exists and is empty/partial rather than erroring."""
    doc = {
        "package_uid": "pkg:npm/empty@1.0.0?uuid=x",
        "files": [
            {"path": "bare", "type": "directory", "name": "bare"},  # no extra_data
            {"path": "bare/file.txt", "type": "file", "name": "file.txt"},  # no sha1
        ],
    }
    p = tmp_path / "scan_degenerate.json"
    p.write_text(json.dumps(doc))
    out = ingest_scan(spark, str(p))
    assert out["resources"].count() == 2
    assert out["exact_file_index"].count() == 0  # no sha1 -> not indexed
    assert out["approx_dir_content_index"].count() == 0
    assert out["snippet_index"].count() == 0

    empty = {"package_uid": "pkg:npm/none@1.0.0?uuid=y", "files": []}
    p2 = tmp_path / "scan_empty.json"
    p2.write_text(json.dumps(empty))
    out2 = ingest_scan(spark, str(p2))
    assert all(df.count() == 0 for df in out2.values())


def test_simhash_banding_guarantee_vs_brute_force(spark):
    """Pigeonhole: every pair at hamming ≤ 3 MUST be found by the 4-band
    join. Compare against brute-force bit_count over deterministic
    pseudo-random 32-bit fingerprints (seeded from ids, includes planted
    near-identical pairs)."""
    base = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(2**32)).alias("simhash"),
    )
    # plant near-dups: ids 1000+k get id k's fingerprint with 2 bits flipped
    planted = base.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.col("simhash").bitwiseXOR(F.lit(0b101)).alias("simhash"),
    )
    sim = base.unionByName(planted)

    found = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(sim, "doc_id", max_hamming=3, n_bands=4).collect()
    }

    a = sim.alias("a")
    b = sim.alias("b")
    brute = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hd"),
        )
        .filter(F.col("hd") <= 3)
        .collect()
    }
    assert found == brute  # banding finds EXACTLY the brute-force set
    assert len(brute) >= 20  # the planted pairs are all in there


def test_new_selection_queries_on_empty_corpus(spark, tmp_path):
    """Degenerate input: an empty documents table. The funnel must report
    ZEROS (not nulls — Spark SUM over empty is null where the DuckDB
    oracle's COUNT FILTER is 0); the language-mixture queries must return
    zero rows without erroring."""
    import pyspark.sql.types as T

    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    sf = str(tmp_path)
    spark.createDataFrame([], schema).write.parquet(f"{sf}/documents.parquet")

    funnel = sorted(
        QUERIES["corpus_funnel_report"](spark, sf).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage"] for r in funnel] == [1, 2, 3, 4]
    for r in funnel:
        assert r["n_in"] == 0 and r["n_kept"] == 0  # zeros, never null

    assert QUERIES["mix_temperature_sampling"](spark, sf).count() == 0
    assert QUERIES["select_unimax_budget"](spark, sf).count() == 0
    assert QUERIES["select_gopher_rules"](spark, sf).count() == 0


def test_perplexity_lm_without_target_slice(spark, tmp_path):
    """A corpus with documents but NO 'en' slice (the LM training target):
    _trigram_lm's denominator must not TypeError on the NULL sum, and the
    query must still match its oracle exactly (both engines guard the
    empty-slice denominator with greatest(..., 1))."""
    import duckdb

    from purldb_spark.plans.registry import ORACLES, QUERIES, load_inventory
    from tests.conftest import assert_same_result

    load_inventory()
    sf = str(tmp_path)
    rows = [
        (1, "ein kleiner text ueber dinge", "de", "web", 28),
        (2, "noch ein text ueber andere dinge", "de", "web", 32),
        (3, "un texte sur des choses", "fr", "web", 23),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    df = QUERIES["select_perplexity_buckets"](spark, sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    assert_same_result(df, con, ORACLES["select_perplexity_buckets"])
    con.close()


def test_recall_possible_counts_actual_ground_truth(spark, tmp_path):
    """An anchor with fewer than 3 eligible neighbors (3-vector corpus):
    ``possible`` must be the ground-truth row count (2), not 3 x anchors —
    and the full report must hash-match the oracle on the same corpus."""
    import duckdb

    from pyspark.sql import functions as F

    from purldb_spark.plans.registry import ORACLES, QUERIES, load_inventory
    from tests.conftest import assert_same_result

    load_inventory()
    sf = str(tmp_path)
    emb = spark.range(3).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i ->"
            " cast(sin(cast(id * 64 + i as double)) as float))"
        ).alias("embedding"),
        F.lit(0).alias("label"),
    )
    emb.write.parquet(f"{sf}/embeddings.parquet")

    df = QUERIES["knn_recall_eval"](spark, sf)
    got = {r["method"]: r for r in df.collect()}
    for r in got.values():
        assert r["possible"] == 2, "possible must equal the gt row count"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet/*.parquet'"
    )
    assert_same_result(df, con, ORACLES["knn_recall_eval"])
    con.close()


def test_event_queries_on_empty_events(spark, tmp_path):
    """Degenerate input: an empty events table. The as-of join, the HLL
    and quantile sketches, and the z-order-free event paths must return
    zero rows without erroring (and without divide-by-zero in the sketch
    estimates)."""
    import pyspark.sql.types as T

    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    sf = str(tmp_path)
    spark.createDataFrame([], schema).write.parquet(f"{sf}/events.parquet")

    assert QUERIES["j14_asof_join"](spark, sf).count() == 0
    assert QUERIES["sketch_hll_distinct"](spark, sf).count() == 0
    assert QUERIES["sketch_histogram_quantiles"](spark, sf).count() == 0
