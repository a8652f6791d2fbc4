"""Unit and degenerate-input tests for the KMV sketch query and the
corpus-scaled coarse-k helper."""

from __future__ import annotations

import datetime

import pyspark.sql.types as T

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def test_kmv_on_empty_events(spark, tmp_path):
    """An empty events table must yield zero pairs without erroring (the
    driver-collected type list is empty -> empty literal pair frame)."""
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    sf = str(tmp_path)
    spark.createDataFrame([], EV_SCHEMA).write.parquet(f"{sf}/events.parquet")
    assert QUERIES["sketch_kmv_intersect"](spark, sf).count() == 0


def test_kmv_single_type_yields_no_pairs(spark, tmp_path):
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    sf = str(tmp_path)
    rows = [
        (i, datetime.datetime(2024, 1, 1 + i % 3), i, "click", 1.0, "{}")
        for i in range(10)
    ]
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
        f"{sf}/events.parquet"
    )
    assert QUERIES["sketch_kmv_intersect"](spark, sf).count() == 0


def test_two_phase_bottom_k_equals_global(spark):
    """kmv_sketch's salted two-phase rank must equal a plain global
    bottom-k (the exactness claim in its docstring)."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from purldb_spark.plans.q_kmv import _EL_SPARK, _KMV_K, kmv_sketch

    rows = [
        (i, datetime.datetime(2024, 1, 1 + (i * 7) % 20), i % 97,
         "t%d" % (i % 3), 0.0, "{}")
        for i in range(600)
    ]
    ev = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        (r["event_type"], r["hv"]) for r in kmv_sketch(ev).collect()
    }
    d = ev.select("event_type", F.expr(_EL_SPARK).alias("hv")).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    want = {
        (r["event_type"], r["hv"])
        for r in d.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _KMV_K)
        .collect()
    }
    assert got == want and len(want) > 0


def test_coarse_k_formula_and_memo(spark):
    """coarse_k: floor of 8 at every verification scale, N/250 beyond;
    the per-(session, sf_dir) memo avoids a count job per query call."""
    from purldb_spark.plans import q_cluster

    sf = "/root/testdata/sf0.001"
    k = q_cluster.coarse_k(spark, sf)
    assert k == 8  # 500 vectors -> max(8, 2) == 8
    key = (spark.sparkContext.applicationId, sf)
    assert q_cluster._K_BY_CORPUS[key] == 8
    # formula scales: 20k vectors -> 80 cells (the sf1 probe's regime)
    assert max(q_cluster._K, 20000 // q_cluster._CELL_TARGET) == 80


def test_estimator_numerator_derives_from_k():
    """r9 advice pin: the union estimator's exact-double numerator must be
    built from _KMV_K (the literal 31e0 was only correct while k == 32),
    and the (k-1)e6 factor must stay integer-exact in IEEE double."""
    from purldb_spark.plans.q_kmv import _EST_NUM, _KMV_K

    assert f"{_KMV_K - 1}e0" in _EST_NUM
    assert float(1_000_000 * (_KMV_K - 1)) == 1_000_000 * (_KMV_K - 1)
