"""Window / sort / top-k / dedup / set-op queries — SURVEY §2.5 (W1-W7) and
§2.6 (U1-U5), built on the reusable primitives in operators/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.operators.windows import (
    flag_duplicates_keep_best,
    keep_best_per_group,
    merge_intervals,
    stable_dedup,
    top_k_per_group,
)
from purldb_spark.plans.registry import query


@query(
    "w1_multisort",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def w1_multisort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: whitelisted multi-key sort with `-` desc prefix
    (packagedb/api.py:303-315). orderBy+limit compiles to
    TakeOrderedAndProject — a per-partition top-k then a k-way driver merge,
    never a full global sort."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "w3_priority_queue_order",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    ORDER BY value DESC, event_id DESC
    LIMIT 100
    """,
)
def w3_priority_queue_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: priority-queue consumption order `-priority, -uri`
    (minecode/models.py:272,343)."""
    e = load(spark, sf_dir, "events")
    return (
        e.select("event_id", "event_type", "value")
        .orderBy(F.desc("value"), F.desc("event_id"))
        .limit(100)
    )


@query(
    "w4_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT event_id, event_type, ts, user_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_id, event_type, ts, user_id FROM ranked WHERE rn <= 10
    """,
)
def w4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: 10 most recent per status (minecode/models.py:636)."""
    e = load(spark, sf_dir, "events")
    return top_k_per_group(
        e.select("event_id", "event_type", "ts", "user_id"),
        ["event_type"],
        [F.desc("ts"), F.desc("event_id")],
        10,
    )


@query(
    "w5_rank_pick_best",
    oracle="""
    WITH scored AS (
      SELECT c_custkey, c_name, c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             dense_rank() OVER (PARTITION BY c_nationkey
                                ORDER BY CAST(floor(c_acctbal / 1000) AS BIGINT) DESC) AS rk
      FROM customer
    )
    SELECT c_custkey, c_name, c_nationkey, bal_band FROM scored WHERE rk = 1
    """,
)
def w5_rank_pick_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: rank matches by score tuple, keep the whole best group including
    ties (matchcode/models.py:326-373). The banded score creates real ties,
    exercising dense_rank-keeps-ties semantics."""
    c = load(spark, sf_dir, "customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 1000).cast("long")
    )
    return keep_best_per_group(
        c.select("c_custkey", "c_name", "c_nationkey", "bal_band"),
        ["c_nationkey"],
        [F.desc("bal_band")],
    )


@query(
    "w6_span_merge_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             max(ts) OVER (PARTITION BY user_id ORDER BY ts, ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_max IS NULL
                       OR ts > prev_max + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, ts) AS span_id
      FROM flagged
    )
    SELECT user_id, min(ts) AS span_start, max(ts) AS span_end,
           count(*) AS n_items
    FROM sessions GROUP BY user_id, span_id
    """,
)
def w6_span_merge_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6/F6: span merge (matchcode/match.py:290-348 merges match spans with
    gap ≤ 16 positions) applied to event sessionization with a 30-minute gap
    — the identical interval-merge algebra, windows + one groupBy, no UDF."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", F.col("ts").alias("ts_end")
    )
    return merge_intervals(
        e, ["user_id"], "ts", "ts_end", F.expr("INTERVAL 30 MINUTES")
    ).select("user_id", "span_start", "span_end", "n_items")


@query(
    "w7_stable_dedup",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, source FROM ranked WHERE rn = 1
    """,
)
def w7_stable_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: stable first-wins dedup (resolved_packages_by_purl,
    packagedb/api.py:1243-1283) — deterministic dropDuplicates via an
    explicit total order, one row per (lang, source)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stable_dedup(d, ["lang", "source"], [F.asc("doc_id")])


# ---------------------------------------------------------------- set ops --


@query(
    "u1_union_disjoint",
    oracle="""
    SELECT o_orderkey, o_orderstatus, 'pending' AS bucket
    FROM orders WHERE o_orderstatus = 'P'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, 'stale_open' AS bucket
    FROM orders WHERE o_orderstatus = 'O' AND o_orderdate < TIMESTAMP '1993-01-01 00:00:00'
    """,
)
def u1_union_disjoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: visitables = never_visited ∪ revisitables
    (minecode/models.py:254-273) — disjoint predicates, so UNION ALL with no
    dedup shuffle."""
    o = load(spark, sf_dir, "orders")
    pending = o.filter(F.col("o_orderstatus") == "P").select(
        "o_orderkey", "o_orderstatus", F.lit("pending").alias("bucket")
    )
    stale = o.filter(
        (F.col("o_orderstatus") == "O")
        & (F.col("o_orderdate") < F.lit("1993-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderstatus", F.lit("stale_open").alias("bucket"))
    return pending.unionByName(stale)


@query(
    "u3_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def u3_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: .distinct() post multi-value filter (packagedb/api.py:138)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "u4_except_exclusion",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderstatus <> 'F'
      AND o_orderkey NOT IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '1-URGENT')
    """,
)
def u4_except_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: EXCEPT-style exclusion (minecode/models.py:246-252 — revisitables
    minus mappable-not-yet-mapped), as an anti-join on the key."""
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return (
        o.filter(F.col("o_orderstatus") != "F")
        .join(urgent, "o_orderkey", "left_anti")
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "u5_dedup_flag_best",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars // 100 AS size_band
      FROM documents
    ),
    marked AS (
      SELECT doc_id, source, size_band,
             first_value(doc_id) OVER (PARTITION BY source, size_band
                                       ORDER BY doc_id) AS canonical_doc_id
      FROM keyed
    )
    SELECT doc_id, source, size_band, canonical_doc_id,
           doc_id <> canonical_doc_id AS is_duplicate
    FROM marked
    """,
)
def u5_dedup_flag_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: duplicate-package dedup — same key ⇒ keep best, flag the rest
    is_duplicate and point them at the canonical row
    (minecode/indexing.py:133-195)."""
    # integer div on both engines — a double division + cast would round in
    # DuckDB but truncate in Spark
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr("n_chars div 100").alias("size_band")
    )
    return flag_duplicates_keep_best(
        d, ["source", "size_band"], [F.asc("doc_id")], "doc_id"
    )
