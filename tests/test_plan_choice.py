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
