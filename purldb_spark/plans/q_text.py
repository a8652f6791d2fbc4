"""Training-data-pipeline queries, text-analysis family (split from the
former q_llm.py so one edit no longer invalidates the whole LLM-ops
inventory's verification hashes at once).

Coverage:
  language-ID         -> text_langid   (stopword-ratio argmax heuristic)
  quality scoring     -> text_quality  (C4/Gopher-rule feature shape)
  token counting      -> text_tokens   (whitespace + BPE-ish regex)
  doc fingerprinting  -> text_winnow_fingerprint (winnowing rolling min)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.functions.text import (
    n_tokens_bpe,
    n_tokens_ws,
    predicted_lang,
    predicted_lang_sql,
    quality_features,
    quality_sql,
    TOKEN_REGEX,
)
from purldb_spark.plans.registry import query


@query(
    "text_langid",
    oracle=f"""
    SELECT doc_id, lang, {predicted_lang_sql("text")} AS pred_lang
    FROM documents
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax of per-language stopword ratios (≥2%
    floor, deterministic first-wins ties). A lexicon heuristic, not a model —
    the Spark shape (pure column expressions over a literal lexicon) is what
    a real fastText-style scorer would replace via pandas_udf."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", predicted_lang("text").alias("pred_lang"))


@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id, {quality_sql("text")}
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punctuation/stopword features + linear score
    (the C4/Gopher-rule shape). Pure JVM expressions; bit-exact vs oracle."""
    d = load(spark, sf_dir, "documents")
    feats = quality_features("text")
    return d.select("doc_id", *[c.alias(n) for n, c in feats.items()])


@query(
    "text_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS n_tokens_bpe
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex tokenizer."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_tokens_ws("text").alias("n_tokens_ws"),
        n_tokens_bpe("text").alias("n_tokens_bpe"),
    )


_W = 4  # winnowing window (fingerprints per ~w tokens)


@query(
    "text_winnow_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(list_slice(w, i, i + 4), ' ')) AS g
      FROM toks, unnest(generate_series(1, len(w) - 4)) AS t(i)
    ),
    winnowed AS (
      SELECT doc_id,
             min(g) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {_W - 1} FOLLOWING) AS fp
      FROM grams
    )
    SELECT doc_id, count(DISTINCT fp) AS n_fingerprints
    FROM winnowed GROUP BY doc_id
    """,
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by winnowing (the matchcode snippet-index
    construction, matchcode/models.py:425-657 consumes exactly such
    fingerprints): hash every 5-token gram, slide a window of 4, keep the
    window minimum — the classic winnowing guarantee (one fingerprint per
    window, shared grams -> shared fingerprints). Windowed min per doc, no
    UDF."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 5)  # sequence() runs backward on n<1 — guard
    )
    grams = d.select(
        "doc_id",
        F.posexplode(
            F.expr("transform(sequence(1, size(w) - 4), i -> md5(concat_ws(' ', slice(w, i, 5))))")
        ).alias("pos", "g"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _W - 1)
    winnowed = grams.withColumn("fp", F.min("g").over(win))
    return winnowed.groupBy("doc_id").agg(
        F.countDistinct("fp").alias("n_fingerprints")
    )
