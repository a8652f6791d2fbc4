"""Randomized cross-check of merge_intervals (F6) against a pure-python
reference merger, plus keyset pagination behavior."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from purldb_spark.operators.filters import keyset_page
from purldb_spark.operators.windows import merge_intervals


def _reference_merge(intervals: list[tuple[int, int]], max_gap: int):
    """Classic sort-and-sweep interval merge with gap tolerance."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1] + max_gap:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def test_merge_intervals_matches_reference_on_random_inputs(spark):
    rng = random.Random(7)
    rows = []
    expected = {}
    for g in range(25):  # 25 groups of random intervals
        ivals = []
        for _ in range(rng.randint(1, 30)):
            s = rng.randint(0, 500)
            ivals.append((s, s + rng.randint(0, 40)))
        rows += [(g, s, e) for s, e in ivals]
        expected[g] = _reference_merge(ivals, max_gap=16)

    df = spark.createDataFrame(rows, ["g", "start", "end"])
    merged = merge_intervals(df, ["g"], "start", "end", F.lit(16))
    got: dict[int, list[tuple[int, int]]] = {}
    for r in merged.collect():
        got.setdefault(r.g, []).append((r.span_start, r.span_end))
    for g in expected:
        assert sorted(got[g]) == expected[g], f"group {g}"


def test_merge_intervals_counts_items(spark):
    df = spark.createDataFrame(
        [(1, 0, 5), (1, 3, 8), (1, 30, 31)], ["g", "start", "end"]
    )
    out = {
        (r.span_start, r.span_end): r.n_items
        for r in merge_intervals(df, ["g"], "start", "end", F.lit(16)).collect()
    }
    assert out == {(0, 8): 2, (30, 31): 1}


def test_keyset_pagination_walks_whole_table(spark):
    df = spark.range(95).withColumnRenamed("id", "k")
    seen, after, pages = [], None, 0
    while True:
        page = keyset_page(df, "k", after, limit=20).collect()
        if not page:
            break
        seen += [r.k for r in page]
        after = page[-1].k
        pages += 1
    assert seen == list(range(95))  # every row exactly once, in order
    assert pages == 5  # 4 full pages + 1 partial