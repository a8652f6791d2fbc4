"""Training-data text ops, batch 2: repetition-based quality signals
(Gopher-style repetition filters: Rae et al. 2021, "Scaling Language
Models", §A1.1) and PII detection/redaction — both pure column
expressions over the documents table, whole-stage codegen end to end.

- text_repetition: per-document distinct-word ratio, top-word
  fraction, duplicate-bigram fraction, and the keep/drop flag a Gopher
  pipeline derives from them. The bigram set is built with transform()
  over an index sequence — no explode, no shuffle; the only shuffle in
  the query is none at all (per-row aggregates via array functions).
- text_pii_scrub: email/IPv4 detection counts and redaction via
  regexp_count/regexp_replace. The fixture plants synthetic addresses
  deterministically (doc_id-derived) so the oracle can recompute both
  the counts and the redacted text.

At 100 TB both are embarrassingly parallel map-only passes — they
read, transform, and write with zero shuffle, so they scale linearly
with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query


@query(
    "text_repetition",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    b AS (
      SELECT doc_id, words, len(words) AS n_words,
             len(list_distinct(words)) AS n_distinct,
             [words[i] || ' ' || words[i+1] FOR i IN range(1, len(words))]
               AS bigrams
      FROM w
    ),
    t AS (
      SELECT doc_id, unnest(words) AS word FROM w
    ),
    topw AS (
      SELECT doc_id, max(cnt) AS top_word_count
      FROM (SELECT doc_id, word, count(*) AS cnt FROM t GROUP BY 1, 2)
      GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           round(CAST(n_distinct AS DOUBLE) / n_words, 6) AS distinct_ratio,
           round(CAST(top_word_count AS DOUBLE) / n_words, 6)
             AS top_word_frac,
           round(1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                   / len(bigrams), 6) AS dup_bigram_frac,
           (CAST(top_word_count AS DOUBLE) / n_words <= 0.1
            AND 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                  / len(bigrams) <= 0.3) AS keep
    FROM b JOIN topw ON b.doc_id = topw.doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-word
    ratio, most-frequent-word fraction, duplicate-bigram fraction, and
    the keep flag (top-word <= 10%, dup-bigrams <= 30%). All per-row
    array expressions — a map-only pass with no shuffle (the oracle's
    group-bys recompute the same values relationally)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    n = F.size("words")
    # zip_with over two linear slices: same (words[i], words[i+1]) pairs as
    # indexing through sequence(0, n-2), but one pass over contiguous arrays
    # instead of two random element_at lookups per index — ~7x cheaper in
    # the interpreted HOF evaluator (guide §4.1), bit-identical output
    bigrams = F.zip_with(
        F.slice("words", 1, n - 1),
        F.slice("words", 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # top word count without a shuffle and without a quadratic scan:
    # sort the row's words and fold the max consecutive-run length —
    # O(n log n) per row, safe for arbitrarily long documents
    top_count = F.aggregate(
        F.array_sort("words"),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    out = docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(F.size(F.array_distinct("words")) / n, 6).alias("distinct_ratio"),
        F.round(top_count / n, 6).alias("top_word_frac"),
        F.round(
            1.0 - F.size(F.array_distinct(bigrams)) / F.size(bigrams), 6
        ).alias("dup_bigram_frac"),
        (
            (top_count / n <= 0.1)
            & (1.0 - F.size(F.array_distinct(bigrams)) / F.size(bigrams) <= 0.3)
        ).alias("keep"),
    )
    return out


_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4_RX = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             text ||
               (CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com now' ELSE '' END) ||
               (CASE WHEN doc_id % 4 = 0
                     THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.1 up' ELSE '' END) AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RX}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_IPV4_RX}')) AS BIGINT)
             AS n_ips,
           regexp_replace(
             regexp_replace(text, '{_EMAIL_RX}', '<EMAIL>', 'g'),
             '{_IPV4_RX}', '<IP>', 'g') AS scrubbed
    FROM planted
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: email/IPv4 counts via regexp_count
    and in-place redaction via regexp_replace. The fixture plants
    doc_id-derived addresses so the oracle recomputes the exact counts
    and redacted text. Map-only, zero shuffle."""
    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" contact user"), did.cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 4 == 0,
                F.concat(
                    F.lit(" host 10.0."), (did % 256).cast("string"),
                    F.lit(".1 up"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return planted.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RX)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(_IPV4_RX)).cast("long").alias("n_ips"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RX, "<EMAIL>"), _IPV4_RX, "<IP>"
        ).alias("scrubbed"),
    )
