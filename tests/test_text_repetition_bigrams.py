"""Focused regression test for the r15 bigram-build rewrite in
plans/q_llm2.text_repetition: ``zip_with`` over two linear slices replaces
``transform(sequence(0, n-2), i -> element_at(...))``.

Pins every output column of text_repetition against a pure-Python
recomputation on real documents, so any future reshaping of the bigram
expression must keep the (words[i], words[i+1]) pairing, the distinct
counts, and the 1e-6 rounding bit-exact."""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_CORRECT


def test_text_repetition_matches_brute_force(spark):
    from purldb_spark.catalog.tables import load
    from purldb_spark.plans.q_llm2 import text_repetition

    texts = {
        r.doc_id: r.text
        for r in load(spark, SF_CORRECT, "documents")
        .select("doc_id", "text")
        .limit(64)
        .collect()
    }
    got = {
        r.doc_id: r
        for r in text_repetition(spark, SF_CORRECT)
        .filter(f"doc_id IN ({','.join(map(str, texts))})")
        .collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        words = text.split(" ")
        n = len(words)
        bigrams = [f"{words[i]} {words[i + 1]}" for i in range(n - 1)]
        top = max(Counter(words).values())
        dup = 1.0 - len(set(bigrams)) / len(bigrams)
        r = got[doc_id]
        assert r.n_words == n
        assert r.distinct_ratio == round(len(set(words)) / n, 6)
        assert r.top_word_frac == round(top / n, 6)
        assert r.dup_bigram_frac == round(dup, 6)
        assert r.keep == (top / n <= 0.1 and dup <= 0.3)
