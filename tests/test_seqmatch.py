"""Exact-parity proof for f5_seqmatch_rank: replay the reference's
step-4 ranking loop (matchcode/models.py:339-366) in plain Python with
difflib over the same fixture rows and compare winners."""

from __future__ import annotations

from collections import defaultdict
from difflib import SequenceMatcher

from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.functions.seqmatch import seqmatch_ratio
from purldb_spark.plans.q_seqmatch import f5_seqmatch_rank
from tests.conftest import SF_SMOKE as SF_SMALL


def test_ratio_udf_matches_difflib(spark):
    pairs = [
        ("libfoo-1.2.tar.gz", "libfoo-1.3.tar.gz"),
        ("a", "b"),
        ("", "x"),
        ("same", "same"),
        (None, "x"),
    ]
    df = spark.createDataFrame(pairs, "a string, b string").select(
        "a", "b", seqmatch_ratio(F.col("a"), F.col("b")).alias("r")
    )
    for row in df.collect():
        if row.a is None:
            assert row.r is None
        else:
            assert row.r == SequenceMatcher(a=row.a, b=row.b).ratio()


def test_rank_matches_reference_loop(spark):
    got = {
        r.q_doc_id: (r.cand_doc_id, round(r.name_ratio, 6))
        for r in f5_seqmatch_rank(spark, SF_SMALL).collect()
    }

    docs = [
        (r.doc_id, r.lang, r.n_chars, r.text[:24])
        for r in load(spark, SF_SMALL, "documents")
        .select("doc_id", "lang", "n_chars", "text")
        .collect()
    ]
    by_lang = defaultdict(list)
    for d in docs:
        by_lang[d[1]].append(d)
    expected = {}
    for qid, lang, qc, qh in docs:
        if qid % 20 != 0:
            continue
        cands = [(cid, ic, ih) for cid, cl, ic, ih in by_lang[lang] if cid != qid]
        if not cands:
            continue
        min_diff = min(abs(qc - ic) for _, ic, _ in cands)
        tier = [(cid, ih) for cid, ic, ih in cands if abs(qc - ic) == min_diff]
        # the reference orders by name_difference = 1 - ratio, low first
        best = min(
            tier, key=lambda t: (1 - SequenceMatcher(a=qh, b=t[1]).ratio(), t[0])
        )
        expected[qid] = (
            best[0],
            round(SequenceMatcher(a=qh, b=best[1]).ratio(), 6),
        )
    assert got == expected
