"""Registry-wide plan-shape guard: no accidental O(N²) joins.

Every registered query's physical plan must be free of
CartesianProduct / BroadcastNestedLoopJoin — the shapes that stop
scaling past one executor.  Since r16 this includes the labeled
all-pairs baselines (knn_bruteforce, dedup_embedding_cosine, the
recall harnesses' exact ground-truth sides): their O(N²) pair scans
are exact B x B block decompositions of the pair space joined on the
cell id (operators.knn.grid_cross_pairs; q_embed's triangle blocks),
so the planner sees a plain equi-join — broadcast-hash at
verification scale, shuffled at production scale — and no task ever
holds more than one bounded block per side.

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

# r16: EMPTY — the labeled all-pairs baselines (knn_bruteforce,
# dedup_embedding_cosine, the recall harnesses' ground-truth sides) now
# run as blocked-grid equi-joins on a cell key (operators.knn.
# grid_cross_pairs / q_embed's B x B triangle decomposition), so even the
# inherently O(N²) exact scans compile to BroadcastHashJoin /
# SortMergeJoin over bounded blocks, never a full-corpus nested loop.
ALLPAIRS_BASELINES: set[str] = set()


@pytest.mark.parametrize("name", sorted(set(QUERIES) - ALLPAIRS_BASELINES))
def test_no_unbounded_join_shapes(name, spark):
    df = QUERIES[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, f"{name} compiles to {marker}"
