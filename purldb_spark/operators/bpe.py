"""Distributed byte-pair-encoding (BPE) vocabulary trainer — the tokenizer
counterpart of the k-means trainer in operators/kmeans.py (SURVEY.md §8:
"token counting (whitespace + a BPE-ish regex)" taken to its real
conclusion: a trained subword vocabulary as a first-class corpus artifact).

Beyond-reference op (the purldb reference has no ML-corpus tooling); the
algorithm is Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units": start from characters (plus an explicit
end-of-word marker ``</w>``), and repeatedly merge the most frequent
adjacent symbol pair, left-to-right greedily within each word.

Execution model (the scalable shape SentencePiece-style distributed
trainers use):

  * ONE corpus scan collapses 100 TB of text to a (word, count) vocabulary
    table — vocabulary-bounded, not corpus-bounded, and cached for the
    whole training loop;
  * each merge iteration is: adjacent-pair expansion (map-only ``transform``
    over the symbol array — no explode of raw text, only of the vocab
    table), a map-side-combined groupBy(pair) whose shuffle is
    O(distinct pairs), and a 1-row TakeOrdered argmax to the driver
    (cf. kmeans.lloyd_step collecting k*dim rows);
  * the chosen pair rides back as a plan literal and the merge itself is a
    map-only left fold over each word's symbols — no join, no shuffle.

The symbol sequence is re-derived per iteration by nesting the merge folds
over the cached base vocabulary (iteration i recomputes i map-only folds:
O(iters^2 x vocab) total map work, zero extra shuffles, shallow lineage).
At a 100M-row vocabulary you would localCheckpoint the symbols column
every few iterations instead — only this recompute/checkpoint trade-off
changes, the per-iteration plan is identical.

Determinism contract (what makes an exact-hash DuckDB oracle possible):
everything is string equality and BIGINT counting — no floats anywhere.
Pair-count ties break on (count DESC, left ASC, right ASC) in both
engines; the greedy within-word merge is the same left fold
(``aggregate`` in Spark, ``list_reduce`` in DuckDB — both fold from the
first element), where a pair (l, r) merges iff the accumulator's LAST
token equals l and the next symbol equals r, which is exactly
non-overlapping left-to-right merging (a freshly merged token ``lr`` can
never re-merge in the same pass because it no longer equals ``l``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def _q(sym: str) -> str:
    """Spark-SQL-quote a symbol literal (symbols never contain spaces —
    they are drawn from whitespace-split words plus the marker).

    Spark's default lexer escapes with BACKSLASH, not SQL-92 doubling:
    ``'it''s'`` lexes as two adjacent string tokens, so a corpus word with
    an apostrophe in a learned merge pair would break the plan while the
    DuckDB oracle (which re-derives merges relationally and never sees
    these literals) sailed on — escape ``\\`` then ``'`` instead."""
    return "'" + sym.replace("\\", "\\\\").replace("'", "\\'") + "'"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The (word, cnt, syms) vocabulary table: ONE corpus scan + ONE
    vocabulary-sized shuffle. ``syms`` is the space-joined character
    sequence with the ``</w>`` marker appended (space is a safe separator:
    words are whitespace-split so no symbol contains one)."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select(
            "w",
            "cnt",
            F.expr(
                "array_join(concat(transform(sequence(1, length(w)),"
                f" i -> substring(w, i, 1)), array({_q(EOW)})), ' ')"
            ).alias("syms"),
        )
    )


def merge_fold_expr(syms_expr: str, left: str, right: str) -> str:
    """Greedy left-to-right merge of the pair (left, right) over a
    space-joined symbol string, as a Spark SQL left fold."""
    ql, qr = _q(left), _q(right)
    return (
        f"aggregate(slice(split({syms_expr}, ' '), 2,"
        f" greatest(size(split({syms_expr}, ' ')) - 1, 0)),"
        f" element_at(split({syms_expr}, ' '), 1),"
        f" (acc, x) -> CASE WHEN x = {qr} AND"
        f" (acc = {ql} OR endswith(acc, concat(' ', {ql})))"
        " THEN concat(acc, x) ELSE concat(acc, ' ', x) END)"
    )


def syms_after(merges: list[tuple[str, str]]) -> str:
    """The symbols column after applying ``merges`` in order: nested
    map-only folds over the base ``syms`` (see module docstring for the
    recompute-vs-checkpoint trade-off at scale).

    Each layer is wrapped as ``transform(array(<prev>), s -> merge(s))[1]``
    so the previous layer's expression appears exactly ONCE per level —
    the merge body references its input several times, and referencing
    ``<prev>`` directly would grow the expression text exponentially in
    the merge count (a 12-merge chain overflowed the SQL parser); the
    single-reference lambda keeps growth linear."""
    expr = "syms"
    for left, right in merges:
        body = merge_fold_expr("s", left, right)
        expr = f"element_at(transform(array({expr}), s -> {body}), 1)"
    return expr


def pair_counts(vocab: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Adjacent-pair counts under the current merge list: map-only pair
    expansion over the vocab table, then an O(distinct pairs) groupBy."""
    cur = syms_after(merges)
    # single-reference wrap again (see syms_after): the pair expansion
    # needs the current symbols three times, the lambda var pays for them
    pairs = vocab.select(
        F.col("cnt"),
        F.expr(
            f"explode(element_at(transform(array({cur}), s ->"
            # slice-based expansion is empty-safe: a fully-merged word has
            # ONE symbol, and sequence(1, size-1) would DESCEND [1, 0]
            " transform(slice(split(s, ' '), 1,"
            " greatest(size(split(s, ' ')) - 1, 0)),"
            " (x, i) -> struct(x as l,"
            " element_at(split(s, ' '), i + 2) as r))), 1))"
        ).alias("p"),
    )
    return pairs.groupBy("p.l", "p.r").agg(F.sum("cnt").alias("c"))


def bpe_fit(
    vocab: DataFrame, iters: int
) -> list[tuple[str, str, int]]:
    """Run ``iters`` merge iterations over a cached vocabulary table;
    returns the learned merge list [(left, right, pair_count)] in merge
    order. Each iteration is one distributed job whose driver traffic is a
    single argmax row (the BPE analogue of lloyd_step's k*dim rows).
    Stops early if no adjacent pair remains (fully merged corpus).

    Each iteration MATERIALIZES the merged symbols (one localCheckpoint
    of the vocab-bounded table) and the next iteration's pair count reads
    the plain column — iteration cost is constant in the merge number.
    The pre-r13 variant re-derived the symbols from the base column
    through the full nested merge chain every iteration: O(i) fold work
    per row AND an O(i)-deep codegen unit per iteration (expression
    compile dominated wall time — 12 iterations measured ~18 s at sf0.1,
    ~6.5 s materialized). The checkpoint is O(distinct words), the same
    bound the vocab table already carries, so the trade holds at 100 TB
    (vocab ~10^7-10^8 rows across the cluster, merged symbols a few
    bytes wider than the base column)."""
    merges: list[tuple[str, str]] = []
    out: list[tuple[str, str, int]] = []
    cur = vocab
    for _ in range(iters):
        best = (
            pair_counts(cur, [])
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        merges.append((row["l"], row["r"]))
        out.append((row["l"], row["r"], int(row["c"])))
        body = merge_fold_expr("s", row["l"], row["r"])
        prev = cur
        cur = cur.select(
            "w",
            "cnt",
            F.expr(
                f"element_at(transform(array(syms), s -> {body}), 1)"
            ).alias("syms"),
        ).localCheckpoint(eager=True)
        # release the PREVIOUS generation's checkpoint blocks once the new
        # one is materialized (eager=True above) — without this, `iters`
        # full vocab copies pile up in block storage until the driver GC
        # happens to reclaim them (the checkpoint-leak class fixed in r12;
        # r13 advice). The caller's input vocab is not ours to unpersist.
        if prev is not vocab:
            prev.unpersist()
    return out


def encoded_vocab(
    vocab: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word, cnt, toks) under the trained merge list — the materialized
    tokenizer artifact: every corpus word mapped to its subword sequence.
    Map-only (nested folds over the cached vocab)."""
    return vocab.select(
        "w", "cnt", F.expr(syms_after(merges)).alias("toks")
    )
