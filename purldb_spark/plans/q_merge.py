"""Merge/upsert queries — SURVEY §2.10, exercising operators/merge.py
against a deterministic existing/incoming split of `documents`:

  existing: doc_id % 3 != 0, lang nulled on every 7th doc (fill target),
            mining level = n_chars % 5
  incoming: doc_id % 2 == 0, re-mined at level 3, upstream source renamed,
            checksum corrupted on every 50th doc (conflict class)

Policies under test: lang=FILL_IF_NULL, source=REPLACE (level-gated),
content_hash=CHECKSUM (conflict -> dead-letter, excluded from the merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.operators.merge import MergeSpec, Policy, merge_upsert, replace_children
from purldb_spark.plans.registry import query

_SPEC = MergeSpec(
    key="doc_id",
    fields={
        "lang": Policy.FILL_IF_NULL,
        "source": Policy.REPLACE,
        "content_hash": Policy.CHECKSUM,
    },
    level_col="lvl",
)


def _existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("lang")).alias("lang"),
        "source",
        F.md5("text").alias("content_hash"),
        (F.col("n_chars") % 5).cast("int").alias("lvl"),
    )


def _incoming(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        "lang",
        F.concat(F.lit("mined-"), F.col("source")).alias("source"),
        F.when(
            F.col("doc_id") % 50 == 0, F.md5(F.concat(F.lit("corrupt"), F.col("text")))
        )
        .otherwise(F.md5("text"))
        .alias("content_hash"),
        F.lit(3).cast("int").alias("lvl"),
    )


_EXISTING_SQL = """
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
         source,
         md5(text) AS content_hash,
         CAST(n_chars % 5 AS INTEGER) AS lvl
  FROM documents WHERE doc_id % 3 <> 0
"""

_INCOMING_SQL = """
  SELECT doc_id, lang,
         'mined-' || source AS source,
         CASE WHEN doc_id % 50 = 0 THEN md5('corrupt' || text) ELSE md5(text) END
           AS content_hash,
         CAST(3 AS INTEGER) AS lvl
  FROM documents WHERE doc_id % 2 = 0
"""

_MERGE_CORE_SQL = f"""
    WITH existing AS ({_EXISTING_SQL}),
    incoming AS ({_INCOMING_SQL}),
    j AS (
      SELECT coalesce(e.doc_id, i.doc_id) AS doc_id,
             e.doc_id IS NOT NULL AS has_old,
             e.lang AS old_lang, i.lang AS new_lang,
             e.source AS old_source, i.source AS new_source,
             e.content_hash AS old_hash, i.content_hash AS new_hash,
             e.lvl AS old_lvl, i.lvl AS new_lvl
      FROM existing e FULL OUTER JOIN incoming i ON e.doc_id = i.doc_id
    ),
    flagged AS (
      SELECT *,
             (old_hash IS NOT NULL AND new_hash IS NOT NULL
              AND old_hash <> new_hash) AS conflict
      FROM j
    )
"""


@query(
    "m1_merge_upsert",
    oracle=_MERGE_CORE_SQL
    + """
    SELECT doc_id,
           CASE WHEN old_lang IS NULL OR old_lang = '' THEN new_lang
                ELSE old_lang END AS lang,
           CASE WHEN old_source IS NULL OR old_source = '' THEN new_source
                WHEN new_lvl >= old_lvl AND new_source IS NOT NULL
                     AND new_source <> '' THEN new_source
                ELSE old_source END AS source,
           CASE WHEN old_hash IS NULL OR old_hash = '' THEN new_hash
                ELSE old_hash END AS content_hash
    FROM flagged WHERE NOT conflict
    """,
)
def m1_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2: field-wise merge_or_create — fill-if-null, level-gated
    replace, checksum conflicts dead-lettered
    (minecode/model_utils.py:70-228, 231-449)."""
    merged, _conflicts = merge_upsert(
        _existing(spark, sf_dir), _incoming(spark, sf_dir), _SPEC
    )
    return merged


@query(
    "m1_merge_conflicts",
    oracle=_MERGE_CORE_SQL
    + """
    SELECT doc_id,
           old_hash AS existing_content_hash,
           new_hash AS incoming_content_hash
    FROM flagged WHERE conflict
    """,
)
def m1_merge_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 dead-letter side: checksum disagreements routed out instead of
    failing the batch (the reference raises per-row,
    model_utils.py:123-141; a distributed merge must not)."""
    _merged, conflicts = merge_upsert(
        _existing(spark, sf_dir), _incoming(spark, sf_dir), _SPEC
    )
    return conflicts.select(
        "doc_id",
        F.col("existing_content_hash"),
        F.col("incoming_content_hash"),
    )


@query(
    "m3_replace_children",
    oracle="""
    WITH children AS (
      SELECT l_orderkey AS parent_key, l_linenumber AS child_id,
             l_quantity AS qty
      FROM lineitem
    ),
    incoming AS (
      SELECT o_orderkey AS parent_key, 0 AS child_id,
             CAST(o_totalprice AS DOUBLE) AS qty
      FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT parent_key, child_id, qty FROM children
    WHERE parent_key NOT IN (SELECT parent_key FROM incoming)
    UNION ALL
    SELECT parent_key, child_id, qty FROM incoming
    """,
)
def m3_replace_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3/M6: wholesale child-row replacement per parent (parties,
    dependencies, resources-on-reindex: model_utils.py:142-171,
    minecode/indexing.py:35-43) — anti-join out old children of re-mined
    parents, append the new. Same algebra as `replaceWhere` partition
    overwrite."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("parent_key"),
        F.col("l_linenumber").alias("child_id"),
        F.col("l_quantity").alias("qty"),
    )
    inc = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            F.col("o_orderkey").alias("parent_key"),
            F.lit(0).alias("child_id"),
            F.col("o_totalprice").cast("double").alias("qty"),
        )
    )
    return replace_children(li, inc, "parent_key")
