"""r16 focused tests: the blocked pair-space decomposition is EXACT.

VERDICT r15 item 1 replaced the full-corpus BroadcastNestedLoopJoin in the
all-pairs baselines with block decompositions of the pair space:

- grid_cross_pairs: Q x N grid cells keyed (pmod(q_id, Qb), pmod(i_id, Ib))
  — every (query, index) pair must appear EXACTLY once, at any block count;
- dedup_embedding_cosine: B x B triangle cells over pmod(vec_id, B) —
  every unordered i < j pair exactly once, cosine bit-identical to the
  direct dot (cross-block cells re-orient ids with least/greatest, which
  must not move the double).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.mark.parametrize("qb", [2, 3, 7])
def test_grid_cross_pairs_exactly_once(spark, qb):
    from purldb_spark.operators.knn import grid_cross_pairs

    q = spark.range(0, 9).select(F.col("id").alias("q_vec_id"))
    i = spark.range(0, 23).select(F.col("id").alias("vec_id"))
    rows = grid_cross_pairs(q, i, "q_vec_id", "vec_id", qb).collect()
    got = sorted((r["q_vec_id"], r["vec_id"]) for r in rows)
    want = sorted((a, b) for a in range(9) for b in range(23))
    assert got == want  # every pair exactly once, none duplicated/dropped


def test_blocked_triangle_matches_python_bruteforce(spark):
    """dedup_embedding_cosine's B x B triangle = plain O(N²) Python loop,
    pair set and (repr-exact) doubles both."""
    import math

    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    emb = {
        r["vec_id"]: r["embedding"]
        for r in spark.read.parquet(SF + "/embeddings.parquet").collect()
    }

    def unit(v):
        n = math.sqrt(sum(float(x) * float(x) for x in v))
        return [float(x) / n for x in v]

    u = {k: unit(v) for k, v in emb.items()}
    ids = sorted(u)
    want = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            acc = 0.0
            for p, qv in zip(u[a], u[b]):
                acc += p * qv
            if acc >= 0.4:
                want[(a, b)] = acc
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in QUERIES["dedup_embedding_cosine"](spark, SF).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert repr(got[k]) == repr(want[k])


def test_blocked_triangle_plan_has_no_nested_loop(spark):
    import contextlib
    import io

    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    for name in ("dedup_embedding_cosine", "knn_bruteforce"):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES[name](spark, SF).explain("formatted")
        plan = buf.getvalue()
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
