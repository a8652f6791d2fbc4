"""Document chunking for retrieval / context assembly — the step between
corpus curation and embedding: split each document into fixed-size
overlapping windows (the standard RAG chunking shape) and detect chunk-level
cross-document repetition.

Not in the reference (purldb has no text pipeline); added as a first-class
training-data-pipeline operator per the build brief, composing with the
existing family: documents -> text_chunk_windows -> (per-chunk embedding)
-> q_embed's band index, and chunk_shared_across_docs is the chunk-grained
twin of dedup_exact (boilerplate that survives document-level dedup because
the CONTAINING documents differ — headers, licenses, navigation — is
exactly what repeats at chunk grain). Complements q_llm4's
text_chunk_overlap (token-budget windows for sequence assembly): these
windows carry a CONTENT IDENTITY (chunk_md5) plus source coordinates
(start_pos/chunk_len), the keys retrieval indexes, embedding caches, and
chunk-level dedup operate on.

Chunking is CHARACTER-windowed (size 128, stride 96) with both
engines running the identical substring arithmetic, so chunk hashes are
bit-identical by construction; token-budget packing of the resulting chunks
is q_bpe.pack_bpe_budget's job. Scale shape: map-only explode — a row's
chunk fan-out is ceil(len/stride), no shuffle at all for the window step;
the repetition report is one hash-groupBy (the dedup_exact shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query

_CHUNK = 128   # window size (chars)
_STRIDE = 96   # window stride (chars) -> 32-char overlap

# last chunk index for a non-empty text of length L is (L-1) div STRIDE
# (start 1 + i*STRIDE <= L); the greatest(..., 0) guard keeps empty strings
# at exactly one (empty) chunk in BOTH engines — Spark's sequence(0, -1)
# would generate a DESCENDING [0, -1], DuckDB's generate_series(0, -1) an
# empty set, so the bound must never go negative
_LAST_IDX_SPARK = f"greatest((length(text) - 1) div {_STRIDE}, 0)"
_LAST_IDX_SQL = f"greatest((length(text) - 1) // {_STRIDE}, 0)"


@query(
    "text_chunk_windows",
    oracle=f"""
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(1 + i * {_STRIDE} AS BIGINT) AS start_pos,
           CAST(length(substring(text, CAST(1 + i * {_STRIDE} AS INT),
                                 {_CHUNK})) AS BIGINT) AS chunk_len,
           md5(substring(text, CAST(1 + i * {_STRIDE} AS INT), {_CHUNK}))
             AS chunk_md5,
           CAST({_LAST_IDX_SQL} + 1 AS BIGINT) AS n_chunks
    FROM documents,
         unnest(generate_series(0, {_LAST_IDX_SQL})) AS t(i)
    WHERE text IS NOT NULL
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping character windows per document (128-char
    chunks every 96 chars): (doc_id, chunk_idx, start_pos,
    chunk_len, chunk_md5, n_chunks). The md5 is the chunk identity
    downstream stages key on (chunk-level dedup, embedding cache hits);
    start_pos/chunk_len let a retriever map matches back into the source
    document; the overlap keeps sentences split by a boundary present in
    at least one window.

    Scale shape at 100 TB: map-only — explode(sequence(...)) fans each row
    out to ceil(len/stride) chunks with zero shuffle, the plan stays one
    WholeStageCodegen scan, and partition sizing follows bytes of text
    (spark.sql.files.maxPartitionBytes), not row count. Substring
    arithmetic (1-based, identical in Spark and DuckDB) makes every
    emitted value engine-exact, including the empty-text single-chunk
    edge (see _LAST_IDX note)."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    chunks = d.select(
        "doc_id",
        "text",
        F.explode(
            F.expr(f"sequence(0L, cast({_LAST_IDX_SPARK} as long))")
        ).alias("i"),
    )
    sub = f"substring(text, cast(1 + i * {_STRIDE} as int), {_CHUNK})"
    return chunks.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_idx"),
        F.expr(f"cast(1 + i * {_STRIDE} as bigint)").alias("start_pos"),
        F.expr(f"cast(length({sub}) as bigint)").alias("chunk_len"),
        F.expr(f"md5({sub})").alias("chunk_md5"),
        F.expr(f"cast({_LAST_IDX_SPARK} + 1 as bigint)").alias("n_chunks"),
    )


@query(
    "chunk_shared_across_docs",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             md5(substring(text, CAST(1 + i * {_STRIDE} AS INT), {_CHUNK}))
               AS chunk_md5,
             CAST(length(substring(text, CAST(1 + i * {_STRIDE} AS INT),
                                   {_CHUNK})) AS BIGINT) AS chunk_len
      FROM documents,
           unnest(generate_series(0, {_LAST_IDX_SQL})) AS t(i)
      WHERE text IS NOT NULL
    )
    SELECT chunk_md5,
           CAST(min(chunk_len) AS BIGINT) AS chunk_len,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(doc_id) AS BIGINT) AS example_doc
    FROM c
    GROUP BY chunk_md5
    HAVING count(DISTINCT doc_id) > 1
    """,
)
def chunk_shared_across_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-grained repetition report: windows (from text_chunk_windows'
    layout) whose md5 occurs in MORE THAN ONE document — the boilerplate
    detector document-level dedup cannot see (a shared header or license
    block repeats at chunk grain while every containing document stays
    unique). Training pipelines drop or downweight these before sampling
    (the repeated-span scrub at corpus scope); retrieval pipelines dedupe
    them out of the index so one boilerplate chunk can't crowd a result
    list.

    Scale shape: the dedup_exact shape exactly — map-only chunk fan-out,
    then ONE hash-groupBy on chunk_md5 (map-side partial aggregation,
    uniform 128-bit keys, no skew), HAVING-filtered to the tiny repeated
    tail. No joins, no windows."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sub = f"substring(text, cast(1 + i * {_STRIDE} as int), {_CHUNK})"
    c = d.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(0L, cast({_LAST_IDX_SPARK} as long))")
        ).alias("i"),
        "text",
    ).select(
        "doc_id",
        F.expr(f"md5({sub})").alias("chunk_md5"),
        F.expr(f"cast(length({sub}) as bigint)").alias("chunk_len"),
    )
    return (
        c.groupBy("chunk_md5")
        .agg(
            F.min("chunk_len").cast("long").alias("chunk_len"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("doc_id").cast("long").alias("example_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .select(
            "chunk_md5",
            "chunk_len",
            "n_docs",
            "n_occurrences",
            "example_doc",
        )
    )
