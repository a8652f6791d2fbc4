"""dedup_plan_choice dispatcher: the argmin must pick 'prefix' exactly in
the regime the prefix plan exists for (a boilerplate flood, where the
counting plan's pair rows go quadratic in the flood size) and 'counting'
on a benign slice (where the prefix plan's extra posting-table passes
outweigh its smaller candidate set) — the r14 ledger's measured regime
study, now enforced by the dispatcher itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from purldb_spark.plans.q_plan_choice import dedup_plan_stats


def _postings(spark, rows):
    return spark.createDataFrame(rows, "slice string, doc_id long, sh string")


@pytest.fixture(scope="module")
def stats(spark):
    rows = []
    # FLOOD slice: 100 docs, each carrying the SAME hot boilerplate
    # shingle plus 9 unique ones (doc size 10 -> prefix length
    # 10 - (4*10+4)//5 + 1 = 3, all unique: rarest-first excludes the
    # hot shingle from every prefix). Counting fan-in C(100,2) = 4950;
    # prefix fan-in 0.
    for d in range(100):
        rows.append(("flood", d, "hot boilerplate shingle"))
        rows += [("flood", d, f"uniq-{d}-{j}") for j in range(9)]
    # BENIGN slice: 20 docs of 10 shingles; consecutive docs share ONE
    # df=2 shingle, everything else unique — tiny counting fan-in, but
    # the prefix plan still pays 4 passes over all postings.
    for d in range(20):
        rows.append(("benign", d, f"pair-{d - (d % 2)}"))
        rows += [("benign", d, f"solo-{d}-{j}") for j in range(9)]
    got = dedup_plan_stats(_postings(spark, rows)).collect()
    return {r.slice: r for r in got}


def test_flood_slice_dispatches_to_prefix(stats):
    r = stats["flood"]
    assert r.n_docs == 100 and r.postings == 1000 and r.max_df == 100
    assert r.counting_fanin == 100 * 99 // 2  # the quadratic pair rows
    # rarest-first prefixes (3 unique shingles per doc) exclude the hot
    # shingle entirely: zero candidate pairs
    assert r.prefix_postings == 300 and r.prefix_fanin == 0
    assert r.counting_cost == 1000 + 4950
    assert r.prefix_cost == 4 * 1000  # 4 posting passes, no candidates
    assert r.chosen_plan == "prefix"


def test_benign_slice_dispatches_to_counting(stats):
    r = stats["benign"]
    assert r.n_docs == 20 and r.postings == 200
    assert r.max_df == 2 and r.counting_fanin == 10  # ten df=2 shingles
    # prefix length 3, doc's df=1 shingles outrank its df=2 pair shingle,
    # so prefixes hold only unique shingles -> no prefix candidates either
    assert r.prefix_fanin == 0
    # ... but 4 posting passes cost more than 200 + 10 row-touches
    assert r.counting_cost == 210 and r.prefix_cost == 800
    assert r.chosen_plan == "counting"


def test_capped_columns_report_the_recall_tradeoff(stats):
    # flood: the hot shingle (df=100 > 16) is dropped by the cap —
    # 100 posting rows of recall thrown away; nothing else is capped
    r = stats["flood"]
    assert r.capped_dropped_postings == 100 and r.capped_fanin == 0
    # benign: nothing exceeds the cap; capped == counting
    b = stats["benign"]
    assert b.capped_dropped_postings == 0 and b.capped_fanin == b.counting_fanin


def test_counting_fanin_equals_actual_pair_rows(spark):
    """The statistic IS the plan's cost: sum C(df,2) must equal the pair
    rows the counting plan's self-join actually produces."""
    rows = [
        ("s", d, sh)
        for d, shs in enumerate(
            [["a", "b"], ["a", "b", "c"], ["b", "c"], ["d"]]
        )
        for sh in shs
    ]
    sh = _postings(spark, rows)
    got = dedup_plan_stats(sh).collect()[0]
    pair_rows = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.sh") == F.col("y.sh"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .count()
    )
    assert got.counting_fanin == pair_rows == 1 + 1 + 3  # a:1, c:1, b:C(3,2)


def test_dispatch_runners_agree_with_python_bruteforce(spark):
    """Both slice-aware runners (_counting_pairs, _prefix_pairs) are
    EXACT: on a mixed flood+benign corpus each must reproduce the
    pure-Python brute-force jaccard pairs at t = 0.8 — so the
    dispatcher's choice changes only cost, never the answer."""
    from itertools import combinations

    from purldb_spark.plans.q_plan_choice import (
        _counting_pairs,
        _prefix_pairs,
        dedup_plan_stats,
    )

    rows = []
    # 100-doc flood (hot shingle everywhere -> C(100,2) counting pair
    # rows); docs 0/1 carry identical shingle sets (jaccard 1.0)
    for d in range(100):
        base = [f"sh-{0 if d <= 1 else d}-{j}" for j in range(9)]
        rows += [("flood", d, "hot shingle")] + [
            ("flood", d, sh) for sh in base
        ]
    # benign slice: docs 0/1 identical shingle sets (jaccard 1.0)
    for d in range(6):
        rows += [
            ("benign", d, f"b-{0 if d <= 1 else d}-{j}")
            for j in range(10)
        ]
    sliced = _postings(spark, rows)

    by_doc: dict[tuple[str, int], set] = {}
    for sl, d, sh in rows:
        by_doc.setdefault((sl, d), set()).add(sh)
    want = set()
    for (sl_a, da), (sl_b, db) in combinations(sorted(by_doc), 2):
        if sl_a != sl_b:
            continue
        inter = len(by_doc[(sl_a, da)] & by_doc[(sl_b, db)])
        union = len(by_doc[(sl_a, da)] | by_doc[(sl_b, db)])
        if union and inter / union >= 0.8:
            want.add((sl_a, min(da, db), max(da, db), inter))

    got_c = {
        (r.slice, r.id_a, r.id_b, r.intersection)
        for r in _counting_pairs(sliced).collect()
    }
    got_p = {
        (r.slice, r.id_a, r.id_b, r.intersection)
        for r in _prefix_pairs(sliced).collect()
    }
    assert got_c == want and got_p == want

    # and the dispatcher picks a different plan per slice on this corpus
    choices = {
        r.slice: r.chosen_plan for r in dedup_plan_stats(sliced).collect()
    }
    assert choices == {"flood": "prefix", "benign": "counting"}
