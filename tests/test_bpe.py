"""BPE trainer parity: the distributed trainer (operators/bpe.py) must
reproduce a plain-Python replay of the Sennrich et al. 2016 merge loop —
greedy left-to-right pair merging with (count DESC, left, right)
tie-breaks — merge for merge and segmentation for segmentation.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from purldb_spark.operators.bpe import (
    EOW,
    bpe_fit,
    encoded_vocab,
    word_vocab,
)

# a corpus with real merge structure: repeated stems, shared suffixes,
# a tie (the counts of ('l','o') and ('o','w') collide) and 1-char words
_DOCS = [
    "low lower lowest low low slow slower",
    "new newer newest new news low a",
    "wide wider widest wide new slow i",
    "low lower new newer wide slow slow",
]


def _py_bpe(docs: list[str], iters: int):
    """Reference replay: dict-of-tuples vocabulary, explicit pair count,
    greedy non-overlapping merge scan."""
    vocab = Counter()
    for d in docs:
        for w in d.split(" "):
            if w:
                vocab[w] += 1
    syms = {w: [*w, EOW] for w in vocab}
    merges = []
    for _ in range(iters):
        pairs: Counter = Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return vocab, syms, merges


def test_trainer_matches_python_replay(spark):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(_DOCS)], "doc_id long, text string")
    vocab_df = word_vocab(docs).localCheckpoint(eager=True)
    got_merges = bpe_fit(vocab_df, 10)
    _, py_syms, py_merges = _py_bpe(_DOCS, 10)
    assert got_merges == py_merges

    enc = encoded_vocab(
        vocab_df, [(left, right) for left, right, _ in got_merges]
    )
    got_syms = {r["w"]: r["toks"].split(" ") for r in enc.collect()}
    assert got_syms == py_syms


def test_merge_is_greedy_non_overlapping(spark):
    # 'a a a a' under pair (a,a) must give 'aa aa', and 'a a a' -> 'aa a':
    # the fold merges left-to-right without re-merging fresh tokens
    df = spark.range(1).select(
        F.expr("'a a a a'").alias("syms")
    )
    from purldb_spark.operators.bpe import merge_fold_expr

    out = df.select(F.expr(merge_fold_expr("syms", "a", "a")).alias("m")).first()["m"]
    assert out == "aa aa"
    df3 = spark.range(1).select(F.expr("'a a a'").alias("syms"))
    out3 = df3.select(F.expr(merge_fold_expr("syms", "a", "a")).alias("m")).first()["m"]
    assert out3 == "aa a"


def test_eow_marker_segments_word_boundaries(spark):
    # the last symbol of every segmentation carries the marker, so no merge
    # can ever cross a word boundary
    docs = spark.createDataFrame([(0, _DOCS[0])], "doc_id long, text string")
    vocab_df = word_vocab(docs)
    enc = encoded_vocab(vocab_df, [])
    for r in enc.collect():
        assert r["toks"].split(" ")[-1] == EOW


def test_fertility_by_lang_consistent_with_encode_stats(spark):
    """Per-language fertility aggregates the same (doc, token) counts as
    bpe_encode_stats; fertility >= 1e6 (a word is at least one subword)."""
    from purldb_spark.plans.registry import QUERIES, load_inventory
    from tests.conftest import SF_SMOKE

    load_inventory()
    fert = QUERIES["bpe_fertility_by_lang"](spark, SF_SMOKE).collect()
    assert fert
    for r in fert:
        assert r["fertility_e6"] >= 1_000_000
        assert r["fertility_e6"] == r["n_tokens"] * 1_000_000 // r["n_words"]
    stats = QUERIES["bpe_encode_stats"](spark, SF_SMOKE).collect()
    assert sum(r["n_tokens"] for r in fert) == sum(
        r["n_tokens"] for r in stats
    )
    assert sum(r["n_words"] for r in fert) == sum(r["n_words"] for r in stats)


def test_trainer_handles_quote_and_backslash_symbols(spark):
    """Symbol literals reach the Spark plan as SQL strings: a corpus whose
    learned merges contain an apostrophe or a backslash must still parse
    (Spark's lexer escapes with backslash, NOT SQL-92 '' doubling) and
    reproduce the Python replay exactly."""
    docs_txt = ["don't don't don't it's", "a\\b a\\b c'd"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_txt)], "doc_id long, text string"
    )
    vocab_df = word_vocab(docs).localCheckpoint(eager=True)
    got_merges = bpe_fit(vocab_df, 6)
    _, py_syms, py_merges = _py_bpe(docs_txt, 6)
    assert got_merges == py_merges
    # at least one learned pair must actually carry the hazardous chars,
    # or this test proves nothing
    flat = "".join(l + r for l, r, _ in got_merges)
    assert "'" in flat and "\\" in flat

    enc = encoded_vocab(
        vocab_df, [(left, right) for left, right, _ in got_merges]
    )
    got_syms = {r["w"]: r["toks"].split(" ") for r in enc.collect()}
    assert got_syms == py_syms
