"""Focused regression tests for the r15 lambda-binding rewrite of the
argmin/argmax literal folds (operators/kmeans.assign_expr,
operators/pq.encode_expr, operators/ivf.cell_expr / top2_cells_expr).

The rewrite binds the distance/dot array to a lambda variable via a
1-element ``transform`` so the k folds evaluate once per row; these tests
pin the results against a pure-Python recomputation on real embeddings so
any future reshaping of the expression must keep the arithmetic and the
first-min / strictly-second tie semantics bit-exact.
"""

from __future__ import annotations

from tests.conftest import SF_CORRECT


def _vecs(spark, n=64):
    from purldb_spark.catalog.tables import load

    rows = (
        load(spark, SF_CORRECT, "embeddings")
        .select("vec_id", "embedding")
        .limit(n)
        .collect()
    )
    return [(r.vec_id, [float(x) for x in r.embedding]) for r in rows]


def test_cell_expr_is_brute_force_argmax(spark):
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.ivf import CENTROIDS, cell_expr

    got = {
        r.vec_id: r.cell
        for r in load(spark, SF_CORRECT, "embeddings")
        .limit(64)
        .select("vec_id", cell_expr("embedding").alias("cell"))
        .collect()
    }
    for vec_id, v in _vecs(spark):
        dots = [sum(float(x) * y for x, y in zip(v, c)) for c in CENTROIDS]
        want = dots.index(max(dots)) + 1  # 1-based, first-max ties
        assert got[vec_id] == want, vec_id


def test_top2_cells_expr_is_argmax_plus_strict_runner_up(spark):
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.ivf import CENTROIDS, top2_cells_expr

    got = {
        r.vec_id: list(r.cells)
        for r in load(spark, SF_CORRECT, "embeddings")
        .limit(64)
        .select("vec_id", top2_cells_expr("embedding").alias("cells"))
        .collect()
    }
    for vec_id, v in _vecs(spark):
        dots = [sum(float(x) * y for x, y in zip(v, c)) for c in CENTROIDS]
        mx = max(dots)
        want = [dots.index(mx) + 1]
        below = [d for d in dots if d < mx]
        if below:
            cand = dots.index(max(below)) + 1
            if cand not in want:
                want.append(cand)
        assert got[vec_id] == want, vec_id


def test_assign_expr_binding_matches_naive_duplicated_form(spark):
    """The bound form must equal the naive
    ``array_position(dists, array_min(dists))`` it replaced, row for row,
    on real data (same folds, same first-min ties)."""
    from pyspark.sql import functions as F

    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.kmeans import assign_expr, sqdist_spark
    from purldb_spark.operators.pq import CODEBOOKS, SUB

    cents = [[float(x) for x in c] for c in CODEBOOKS[0]]
    sub = f"slice(embedding, 1, {SUB})"
    dists = "array(" + ", ".join(sqdist_spark(sub, c) for c in cents) + ")"
    naive = F.expr(f"array_position({dists}, array_min({dists}))").cast("long")
    e = load(spark, SF_CORRECT, "embeddings")
    n_diff = (
        e.select(
            assign_expr(sub, cents).alias("bound"), naive.alias("naive")
        )
        .filter("bound != naive")
        .count()
    )
    assert n_diff == 0
