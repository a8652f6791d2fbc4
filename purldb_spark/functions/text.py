"""Text analysis for training-data pipelines: language-ID heuristic, quality
scoring, token counting, winnowing fingerprints.

All expressions are engine-portable (plain string/array functions, no UDF):
ratios are int/int double divisions and the score is a fixed linear
combination of identical doubles, so results compare bit-exact with DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny stopword lexicons for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "es"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit"],
}

# BPE-ish tokenizer: letter runs, digit runs, or single non-space symbols
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _spark_rx(rx: str) -> str:
    """Spark SQL string literals process backslash escapes (DuckDB's don't);
    double them so the engine-side regex text matches DuckDB's."""
    return rx.replace("\\", "\\\\")


def n_tokens_ws(text: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.col(text), " ")).cast("long")


def n_tokens_bpe(text: str = "text") -> Column:
    """Regex (BPE-ish) token count — JVM-side regexp_extract_all."""
    return F.size(
        F.expr(f"regexp_extract_all({text}, '{_spark_rx(TOKEN_REGEX)}', 0)")
    ).cast("long")


def stopword_hits(lang: str, text: str = "text") -> Column:
    """Number of whitespace tokens that are stopwords of `lang`."""
    words = STOPWORDS[lang]
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    return F.size(
        F.expr(f"filter(split({text}, ' '), t -> array_contains({arr}, t))")
    ).cast("long")


def predicted_lang(text: str = "text") -> Column:
    """Pick the language whose stopword ratio is highest (≥2% of tokens),
    else 'und'. Deterministic argmax with fixed evaluation order."""
    total = n_tokens_ws(text).cast("double")
    best = F.lit("und")
    best_ratio = F.lit(0.02)
    # fixed iteration order => deterministic tie behavior (first wins)
    for lang in sorted(STOPWORDS):
        ratio = stopword_hits(lang, text).cast("double") / total
        is_better = ratio > best_ratio
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_ratio = F.when(is_better, ratio).otherwise(best_ratio)
    return best


def predicted_lang_sql(text: str = "text") -> str:
    """DuckDB rendering of the same argmax cascade."""
    total = f"CAST(len(string_split({text}, ' ')) AS DOUBLE)"

    def hits(lang: str) -> str:
        arr = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
        return (
            f"CAST(len(list_filter(string_split({text}, ' '),"
            f" t -> list_contains({arr}, t))) AS DOUBLE)"
        )

    best, best_ratio = "'und'", "0.02"
    for lang in sorted(STOPWORDS):
        r = f"({hits(lang)} / {total})"
        best = f"(CASE WHEN {r} > {best_ratio} THEN '{lang}' ELSE {best} END)"
        best_ratio = f"(CASE WHEN {r} > {best_ratio} THEN {r} ELSE {best_ratio} END)"
    return best


def quality_features(text: str = "text") -> dict[str, Column]:
    """Length/punct/stopword/word-length features + a linear quality score
    in [0,1]-ish. Same formula rendered for DuckDB in quality_sql()."""
    n_chars = F.length(F.col(text)).cast("long")
    n_ws = n_tokens_ws(text)
    n_punct = F.size(
        F.expr(f"regexp_extract_all({text}, '[^A-Za-z0-9\\\\s]', 0)")
    ).cast("long")
    stop_ratio = stopword_hits("en", text).cast("double") / n_ws.cast("double")
    punct_ratio = n_punct.cast("double") / n_chars.cast("double")
    mean_word_len = (n_chars - n_ws + 1).cast("double") / n_ws.cast("double")
    score = (
        F.lit(0.4) * F.least(n_ws.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * F.least(stop_ratio * 10.0, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0)))
    )
    return {
        "n_chars": n_chars,
        "n_words": n_ws,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "mean_word_len": mean_word_len,
        "quality_score": score,
    }


def quality_sql(text: str = "text") -> str:
    """SELECT-list fragment with identical names/semantics for DuckDB."""
    en = "[" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"
    n_chars = f"CAST(length({text}) AS BIGINT)"
    n_ws = f"CAST(len(string_split({text}, ' ')) AS BIGINT)"
    n_punct = f"CAST(len(regexp_extract_all({text}, '[^A-Za-z0-9\\s]')) AS BIGINT)"
    stop = (
        f"CAST(len(list_filter(string_split({text}, ' '),"
        f" t -> list_contains({en}, t))) AS BIGINT)"
    )
    stop_ratio = f"(CAST({stop} AS DOUBLE) / CAST({n_ws} AS DOUBLE))"
    punct_ratio = f"(CAST({n_punct} AS DOUBLE) / CAST({n_chars} AS DOUBLE))"
    mean_wl = f"(CAST({n_chars} - {n_ws} + 1 AS DOUBLE) / CAST({n_ws} AS DOUBLE))"
    score = (
        f"(0.4 * least(CAST({n_ws} AS DOUBLE) / 100.0, 1.0)"
        f" + 0.3 * least({stop_ratio} * 10.0, 1.0)"
        f" + 0.3 * (1.0 - least({punct_ratio} * 5.0, 1.0)))"
    )
    return (
        f"{n_chars} AS n_chars, {n_ws} AS n_words, {punct_ratio} AS punct_ratio,"
        f" {stop_ratio} AS stop_ratio, {mean_wl} AS mean_word_len,"
        f" {score} AS quality_score"
    )
