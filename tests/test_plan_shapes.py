"""Registry-wide plan-shape guard: no accidental O(N²) joins.

Every registered query's physical plan must be free of
CartesianProduct / BroadcastNestedLoopJoin — the shapes that stop
scaling past one executor — except the labeled all-pairs
baselines below, whose bucketed scale twins (or sampled-anchor
production shapes) are the scale path:

- knn_bruteforce (exact top-k ground truth; twin knn_lsh_bucketed)
- dedup_embedding_cosine (exact pair verify; twin dedup_embedding_blocked)
- knn_recall_eval / knn_recall_fully_trained (recall@k harnesses —
  their ground-truth side IS the labeled anchors x corpus exact scan;
  the approximate sides under evaluation stay cell-bounded equi-joins)
- embed_recall_blocked (the banding-recall harness: its ground-truth
  side IS dedup_embedding_cosine's labeled all-pairs scan; both
  approximate sides under evaluation are banded equi-joins)

This is the regression fence for the DESIGN.md claim that every
candidate generation is an equi-join: a constant-folded join key (the
j6 fixture once corrupted a chunk with a literal, which Catalyst folds
out of the key leaving a nested-loop range join) or an accidental
crossJoin shows up here immediately.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from purldb_spark.plans.registry import QUERIES, load_inventory
from tests.conftest import SF_SMOKE

load_inventory()

ALLPAIRS_BASELINES = {
    "knn_bruteforce",
    "dedup_embedding_cosine",
    "knn_recall_eval",
    "knn_recall_fully_trained",
    "knn_recall_residual",
    "embed_recall_blocked",
}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - ALLPAIRS_BASELINES))
def test_no_unbounded_join_shapes(name, spark):
    df = QUERIES[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, f"{name} compiles to {marker}"
