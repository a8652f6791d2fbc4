"""Join operators — SURVEY §2.3 (J1-J12).

Table roles per FIXTURES.md §9: `part` ~ packages, `lineitem` ~ resources,
`orders` ~ queue, `documents` carries md5-derived fingerprints so the
LSH-banding join (J6) and exact-fingerprint join (J7) are computable on BOTH
engines (md5 is identical in Spark and DuckDB — no fixture smuggling).

Scale notes: dimension sides carry explicit ``broadcast()`` hints where they
are bounded (nation/region, filtered key sets); the banding join is the
query shape that replaces an O(N²) hamming crossjoin with 4 hash joins —
the single most important scale decision in the match engine (SURVEY §4).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from purldb_spark.catalog.tables import load
from purldb_spark.functions.halohash import bah128_fingerprint_sql
from purldb_spark.plans.fixture_cache import (
    bucketed_orderkey_tables,
    doc_fingerprint_base,
)
from purldb_spark.plans.registry import query


@query(
    "j1_fk_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
           o.o_orderstatus, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity >= 49.5
    """,
)
def j1_fk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: N:1 FK equi-join (Resource -> Package, `select_related`,
    packagedb/api.py:199). Filter applied before the join so only matching
    resource rows shuffle; Catalyst/AQE picks the physical join."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49.5)
    o = load(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_orderstatus", "o_orderpriority"
    )


@query(
    "j1_fk_join_bucketed",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
           o.o_orderstatus, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity >= 49.5
    """,
)
def j1_fk_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1's co-located twin: the same FK equi-join read from storage-
    BUCKETED tables (fixture_cache.bucketed_orderkey_tables — bucketBy(16)
    on the orderkey, both sides), joined with a merge hint so the plan is
    a SortMergeJoin with ZERO Exchange on either side (asserted by
    tests/test_joins_bucketed.py). This is the brief's "bucketing for
    co-located joins" made concrete: at 100 TB the ingest pipeline bucket-
    writes the resource->package FK pair once and every downstream join on
    that key skips both shuffles. Identical semantics and oracle as
    j1_fk_join — only the physical plan differs."""
    li_name, o_name = bucketed_orderkey_tables(spark, sf_dir)
    li = spark.table(li_name).filter(F.col("l_quantity") >= 49.5)
    o = spark.table(o_name)
    return li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_orderstatus", "o_orderpriority"
    )


@query(
    "j2_prefetch_nest",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus,
           count(*) AS n_lines,
           string_agg(CAST(l.l_linenumber AS VARCHAR), ',' ORDER BY l.l_linenumber) AS line_numbers
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY o.o_orderkey, o.o_orderstatus
    """,
)
def j2_prefetch_nest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: 1:N prefetch — children nested under the parent
    (`prefetch_related("dependencies","parties")`, packagedb/api.py:374).
    Spark shape: join + groupBy parent + sorted collect_list; rendered as a
    CSV string for engine-portable comparison."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.expr(
                "array_join(transform(sort_array(collect_list(l_linenumber)),"
                " x -> cast(x as string)), ',')"
            ).alias("line_numbers"),
        )
    )


@query(
    "j3_m2m_double_join",
    oracle="""
    SELECT r.r_name AS region_name, count(*) AS n_customers,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,4))) AS VARCHAR) AS DOUBLE) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j3_m2m_double_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: M2M through a bridge table (package <-> package_sets,
    packagedb/models.py:1467-1474) — double join through `nation` with both
    dimensions broadcast (they are bounded small, like package_sets)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(30,4)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
    )


@query(
    "j4_hash_semijoin",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey
    FROM lineitem
    WHERE EXISTS (SELECT 1 FROM part p
                  WHERE p.p_partkey = lineitem.l_partkey AND p.p_size = 50)
    """,
)
def j4_hash_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: batched hash probe as one semi-join (matchcode/pipes/
    matching.py:106-168 probes 1000 sha1s per chunk; Spark replaces the
    chunking loop with a single left-semi hash join — SURVEY §4). The probe
    side is small after its filter, so it broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    probe = (
        load(spark, sf_dir, "part").filter(F.col("p_size") == 50).select("p_partkey")
    )
    return li.join(
        F.broadcast(probe), li.l_partkey == probe.p_partkey, "left_semi"
    ).select("l_orderkey", "l_linenumber", "l_partkey")


@query(
    "j5_earliest_per_key",
    oracle="""
    WITH ranked AS (
      SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
      FROM lineitem
      WHERE EXISTS (SELECT 1 FROM part p
                    WHERE p.p_partkey = lineitem.l_partkey AND p.p_size >= 48)
    )
    SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate
    FROM ranked WHERE rn = 1
    """,
)
def j5_earliest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: correlated earliest-per-key subquery (packagedb/api.py:474-492 —
    per checksum, the Package with earliest release_date) decorrelated into
    a row_number window with a total-order tie-break."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    probe = (
        load(spark, sf_dir, "part").filter(F.col("p_size") >= 48).select("p_partkey")
    )
    li = li.join(F.broadcast(probe), li.l_partkey == probe.p_partkey, "left_semi")
    w = W.partitionBy("l_partkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_shipdate")
    )


# --- fingerprint joins on documents: fp = md5(text), 4 chunks of 8 hex ---

# genuine BAH128 bit-majority fingerprints per document (bag of words),
# recomputed from first principles on the oracle side — J6/J7 band and
# exact-join REAL halohash chunks (functions/halohash.py)
_FP_CHUNKS_SQL = f"""
  SELECT doc_id, n_chars,
         substr(bah128, 1, 8)  AS chunk1,
         substr(bah128, 9, 8)  AS chunk2,
         substr(bah128, 17, 8) AS chunk3,
         substr(bah128, 25, 8) AS chunk4
  FROM ({bah128_fingerprint_sql(
      "SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS w"
      " FROM documents",
      ["doc_id", "n_chars"],
      "w",
  )})
"""


def _fp_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex-chunk view of the session-shared fingerprint base
    (fixture_cache.doc_fingerprint_base) — the production analogue is a
    precomputed index table, so no query pays the aggregation twice."""
    return doc_fingerprint_base(spark, sf_dir).select(
        "doc_id",
        "n_chars",
        F.substring("bah128", 1, 8).alias("chunk1"),
        F.substring("bah128", 9, 8).alias("chunk2"),
        F.substring("bah128", 17, 8).alias("chunk3"),
        F.substring("bah128", 25, 8).alias("chunk4"),
    )


@query(
    "j6_banding_join",
    oracle=f"""
    WITH idx AS ({_FP_CHUNKS_SQL}),
    q AS (
      SELECT doc_id AS q_doc_id, chunk1,
             'f' || substring(chunk2, 2, 7) AS chunk2, chunk3, chunk4,
             CAST(floor(n_chars * 0.98) AS BIGINT) AS q_count
      FROM idx WHERE doc_id % 10 = 0
    ),
    hits AS (
      SELECT q.q_doc_id, i.doc_id AS index_doc_id FROM q JOIN idx i ON q.chunk1 = i.chunk1
        WHERE i.n_chars BETWEEN floor(q.q_count * 0.95) AND floor(q.q_count * 1.05)
      UNION
      SELECT q.q_doc_id, i.doc_id FROM q JOIN idx i ON q.chunk2 = i.chunk2
        WHERE i.n_chars BETWEEN floor(q.q_count * 0.95) AND floor(q.q_count * 1.05)
      UNION
      SELECT q.q_doc_id, i.doc_id FROM q JOIN idx i ON q.chunk3 = i.chunk3
        WHERE i.n_chars BETWEEN floor(q.q_count * 0.95) AND floor(q.q_count * 1.05)
      UNION
      SELECT q.q_doc_id, i.doc_id FROM q JOIN idx i ON q.chunk4 = i.chunk4
        WHERE i.n_chars BETWEEN floor(q.q_count * 0.95) AND floor(q.q_count * 1.05)
    )
    SELECT q_doc_id, index_doc_id FROM hits
    """,
)
def j6_banding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: LSH-banding candidate join (matchcode/models.py:258-265) — a
    4-way UNION of chunk equi-joins with the ±5% element-count gate, NOT a
    crossjoin+hamming scan. Query fingerprints simulate near-duplicates: one
    corrupted chunk (so 3 of 4 bands still hit) and a count drifted -2%
    (inside the gate), per FIXTURES.md §5's generator hint.

    At 100 TB each branch is a shuffle-hash join on a high-cardinality chunk
    key; candidates ~ O(true matches), never O(N²)."""
    # single materialized fingerprint index; the query side is an aliased
    # projection of the SAME checkpointed frame (the checkpoint is a leaf, so
    # the aggregation runs once and the self-join resolves without a fresh
    # read — rebuilding it doubled a full-corpus shuffle, the r3 regression)
    base = _fp_chunks(spark, sf_dir)
    idx = base.alias("i")
    q = (
        base.filter(F.col("doc_id") % 10 == 0)
        .select(
            F.col("doc_id").alias("q_doc_id"),
            F.col("chunk1").alias("q_chunk1"),
            # per-row corruption (first hex digit forced to f): a CONSTANT
            # corrupted chunk gets folded out of the join key by Catalyst,
            # degrading that branch to a nested-loop join on the range gate
            F.concat(F.lit("f"), F.substring("chunk2", 2, 7)).alias("q_chunk2"),
            F.col("chunk3").alias("q_chunk3"),
            F.col("chunk4").alias("q_chunk4"),
            F.floor(F.col("n_chars") * 0.98).cast("long").alias("q_count"),
        )
        .alias("q")
    )
    branches = []
    for i in (1, 2, 3, 4):
        branches.append(
            q.join(
                idx, on=F.col(f"q.q_chunk{i}") == F.col(f"i.chunk{i}"), how="inner"
            )
            .filter(
                F.col("i.n_chars").between(
                    F.floor(F.col("q.q_count") * 0.95),
                    F.floor(F.col("q.q_count") * 1.05),
                )
            )
            .select(F.col("q.q_doc_id"), F.col("i.doc_id").alias("index_doc_id"))
        )
    return reduce(lambda a, b: a.unionByName(b), branches).dropDuplicates()


@query(
    "j7_exact_fp_join",
    oracle=f"""
    WITH idx AS ({_FP_CHUNKS_SQL}),
    q AS (SELECT * FROM idx WHERE doc_id % 7 = 0)
    SELECT q.doc_id AS q_doc_id, i.doc_id AS index_doc_id, i.n_chars
    FROM q JOIN idx i
      ON q.chunk1 = i.chunk1 AND q.chunk2 = i.chunk2
     AND q.chunk3 = i.chunk3 AND q.chunk4 = i.chunk4
     AND q.n_chars = i.n_chars
    """,
)
def j7_exact_fp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: exact fingerprint match — all 4 chunks + element count equal
    (matchcode/models.py:247-255, exact_match=True). One multi-column hash
    join."""
    base = _fp_chunks(spark, sf_dir)
    idx = base.alias("i")
    q = base.filter(F.col("doc_id") % 7 == 0).alias("q")
    cond = (
        (F.col("q.chunk1") == F.col("i.chunk1"))
        & (F.col("q.chunk2") == F.col("i.chunk2"))
        & (F.col("q.chunk3") == F.col("i.chunk3"))
        & (F.col("q.chunk4") == F.col("i.chunk4"))
        & (F.col("q.n_chars") == F.col("i.n_chars"))
    )
    return q.join(idx, cond, "inner").select(
        F.col("q.doc_id").alias("q_doc_id"),
        F.col("i.doc_id").alias("index_doc_id"),
        F.col("i.n_chars").alias("n_chars"),
    )


@query(
    "j9_path_suffix_join",
    oracle="""
    WITH paths AS (
      SELECT p_partkey, replace(p_name, ' ', '/') AS path,
             string_split(replace(p_name, ' ', '/'), '/') AS segs
      FROM part
    ),
    q AS (SELECT * FROM paths WHERE p_partkey % 100 = 0),
    suffixes AS (
      SELECT q.p_partkey AS q_partkey,
             array_to_string(list_slice(q.segs, i, len(q.segs)), '/') AS suffix
      FROM q, unnest(generate_series(1, len(q.segs))) AS t(i)
    )
    SELECT DISTINCT s.q_partkey, p.p_partkey AS index_partkey, p.path
    FROM suffixes s JOIN paths p ON s.suffix = p.path
    """,
)
def j9_path_suffix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: path-suffix containment join (matchcode/match.py:275-287
    path_suffixes) — explode every suffix of the query path, equi-join
    against indexed paths. Pure SQL suffix generation (C6): split +
    transform + slice + array_join, no UDF."""
    def paths_df() -> DataFrame:
        return (
            load(spark, sf_dir, "part")
            .select("p_partkey", F.regexp_replace("p_name", " ", "/").alias("path"))
            .withColumn("segs", F.split("path", "/"))
        )

    paths = paths_df()
    q = paths_df().filter(F.col("p_partkey") % 100 == 0)
    suffixes = q.select(
        F.col("p_partkey").alias("q_partkey"),
        F.explode(
            F.expr(
                "transform(sequence(1, size(segs)),"
                " i -> array_join(slice(segs, i, size(segs) - i + 1), '/'))"
            )
        ).alias("suffix"),
    )
    return (
        suffixes.join(paths, suffixes.suffix == paths.path, "inner")
        .select("q_partkey", F.col("p_partkey").alias("index_partkey"), "path")
        .dropDuplicates()
    )


@query(
    "j10_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = customer.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def j10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: anti-join existence check (packages without matched resources,
    matchcode/pipelines/matching.py:134-139) — customers with no URGENT
    order. The filter narrows the build side before the anti-join."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "j11_self_join_coords",
    oracle="""
    SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
           a.p_brand, a.p_type, a.p_size
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_type = b.p_type AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    """,
)
def j11_self_join_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: self-join on purl coordinates — packages sharing
    type/ns/name/version land in one PackageSet (minecode/model_utils.py:
    342-348). Equi-join on the coordinate columns + key inequality to emit
    each unordered pair once."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type", "p_size")
    a = p.alias("a")
    b = p.alias("b")
    return a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_type") == F.col("b.p_type"))
        & (F.col("a.p_size") == F.col("b.p_size"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        "inner",
    ).select(
        F.col("a.p_partkey").alias("partkey_a"),
        F.col("b.p_partkey").alias("partkey_b"),
        F.col("a.p_brand").alias("p_brand"),
        F.col("a.p_type").alias("p_type"),
        F.col("a.p_size").alias("p_size"),
    )


@query(
    "j12_json_extract_join",
    oracle="""
    SELECT e.event_id, e.event_type,
           CAST(json_extract_string(e.props, '$.k') AS INTEGER) AS k,
           n.n_name
    FROM events e
    JOIN nation n ON CAST(json_extract_string(e.props, '$.k') AS INTEGER) % 25 = n.n_nationkey
    WHERE e.event_type = 'purchase' AND e.value > 95
    """,
)
def j12_json_extract_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: join on a key derived from a semi-structured column (the
    sourcemap-sha1 shape, matchcode/pipes/matching.py:306-308): extract from
    JSON props, transform, equi-join a broadcast dimension."""
    e = load(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 95)
    )
    n = load(spark, sf_dir, "nation")
    e = e.withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    return e.join(F.broadcast(n), e.k % 25 == n.n_nationkey, "inner").select(
        "event_id", "event_type", "k", "n_name"
    )


@query(
    "j13_skew_salted_join",
    oracle="""
    WITH dim AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS lang_docs,
             CAST(sum(n_chars) AS BIGINT) AS lang_chars
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars, m.lang_docs, m.lang_chars,
           d.n_chars * m.lang_docs > m.lang_chars AS above_avg
    FROM documents d JOIN dim m ON d.lang = m.lang
    """,
)
def j13_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13 (beyond-reference scale shape): salted equi-join against a hot
    key — the fact table joins a per-language stats dimension, and `en`
    holds ~44% of all rows, so an unsalted shuffle join would send nearly
    half the fact table through one reducer. operators/skew.py::
    salt_explode_join spreads each hot key over 8 reducers: the big side
    gets a deterministic xxhash64-derived salt, the dimension is exploded
    across all 8 salt values, and the join key becomes (lang, salt); every
    fact row still matches exactly one dimension row, so the result is
    bit-identical to the plain join the oracle runs.

    At bench scale AQE broadcasts the 8x-exploded dimension (the salt is
    plan-neutral there); the shape is for the production case where the
    dimension exceeds the broadcast threshold (billions of zipf-distributed
    domains/languages) AND its key frequency is skewed — salting is then
    the only way to bound the largest reducer, complementing AQE's
    skew-join split which handles the probe side but not a build-side hot
    partition. Deterministic salt (no rand()) keeps retries/idempotence
    safe (DESIGN.md salting-as-last-resort)."""
    from purldb_spark.operators.skew import salt_explode_join

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    dim = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("lang_docs"),
            F.sum("n_chars").cast("long").alias("lang_chars"),
        )
    )
    out = salt_explode_join(docs, dim, "lang", "doc_id", buckets=8)
    return out.select(
        "doc_id",
        "lang",
        "n_chars",
        "lang_docs",
        "lang_chars",
        (F.col("n_chars") * F.col("lang_docs") > F.col("lang_chars")).alias(
            "above_avg"
        ),
    )


@query(
    "j14_asof_join",
    oracle="""
    WITH tagged AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side,
             CASE WHEN event_type = 'view' THEN event_id END AS v_id,
             CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS v_us
      FROM events WHERE event_type IN ('view', 'click')
    ),
    carried AS (
      SELECT user_id, us, event_id, side,
             last_value(v_id IGNORE NULLS) OVER w AS view_event_id,
             last_value(v_us IGNORE NULLS) OVER w AS view_us
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY us, side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS click_event_id, user_id, us AS click_us,
           view_event_id, view_us,
           us - view_us AS gap_us
    FROM carried WHERE side = 1
    """,
)
def j14_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14 (beyond-reference, brief-mandated custom operator): AS-OF join —
    for every 'click' event, the most recent 'view' by the same user at or
    before the click's timestamp (the point-in-time join of every feature
    store / market-data system; DuckDB ships it as ``ASOF JOIN``, Spark has
    no built-in).

    Spark-first design — NOT a range join: the naive formulation
    (t1.ts <= t2.ts AND t1.ts = max prior) is a non-equi join that Catalyst
    can only execute as BroadcastNestedLoopJoin (fenced by
    tests/test_plan_shapes.py) or a per-key sort-merge with full re-scan.
    Instead both sides are UNIONED and tagged, then ONE window pass per
    user carries the last non-null view forward (``last(col, ignoreNulls)``
    over rows UNBOUNDED PRECEDING..CURRENT): each click row reads the view
    that precedes it in (us, side, event_id) order. One shuffle on
    user_id, O(n log n) per partition, zero join — the same algebra
    Flink's event-time temporal join executes incrementally.

    Determinism: total order (us, side, event_id) — a view AT the click's
    exact timestamp sorts first (side 0) so the as-of is inclusive, and
    equal-timestamp views resolve to the largest event_id. Timestamps ride
    as unix-microsecond BIGINTs (identical to DuckDB's epoch_us after the
    catalog's shared nanos->micros truncation; the NTZ->timestamp
    cast is value-preserving under the session's pinned UTC timezone).

    Scale shape: at 100 TB this is one hash-partition by user over the two
    filtered event types (filters pushed to the parquet scan) and one
    in-partition sort — the window carries O(1) state per row; no
    broadcast, no fan-out, skew bounded by the hottest single user (salt
    the window key with a session epoch if one user exceeds a partition).
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    is_view = F.col("event_type") == "view"
    tagged = ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        F.when(is_view, F.lit(0)).otherwise(F.lit(1)).alias("side"),
        F.when(is_view, F.col("event_id")).alias("v_id"),
        F.when(is_view, F.unix_micros(F.col("ts").cast("timestamp"))).alias("v_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id",
        "us",
        "event_id",
        "side",
        F.last("v_id", ignorenulls=True).over(w).alias("view_event_id"),
        F.last("v_us", ignorenulls=True).over(w).alias("view_us"),
    )
    return carried.filter(F.col("side") == 1).select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("us").alias("click_us"),
        "view_event_id",
        "view_us",
        (F.col("us") - F.col("view_us")).alias("gap_us"),
    )


_BIN_CENTS = 1000  # 10.00-wide price bins (integer cents, zero float math)


@query(
    "j15_interval_bin_join",
    oracle=f"""
    WITH iv AS (
      SELECT p_brand,
             CAST(round(min(p_retailprice) * 100) AS BIGINT) AS lo_c,
             CAST(round(max(p_retailprice) * 100) AS BIGINT) AS hi_c
      FROM part GROUP BY p_brand
    ),
    fact AS (
      SELECT l_orderkey, l_quantity,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
      FROM lineitem
    )
    SELECT iv.p_brand,
           CAST(count(*) AS BIGINT) AS n_matches,
           CAST(COALESCE(sum(CAST(fact.l_quantity AS BIGINT)), 0) AS BIGINT)
             AS sum_qty,
           CAST(COALESCE(sum(fact.price_c), 0) AS BIGINT) AS sum_price_cents
    FROM fact JOIN iv
      ON fact.price_c BETWEEN iv.lo_c AND iv.hi_c
    GROUP BY iv.p_brand
    """,
)
def j15_interval_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J15 (beyond-reference, brief-mandated custom operator): INTERVAL
    (range) join — every lineitem whose extended price falls inside a
    brand's [min, max] retail-price interval, intervals OVERLAPPING so a
    fact row can match many brands (the general interval-join case, not a
    bin lookup).

    Spark-first design — the naive BETWEEN join is a pure non-equi
    predicate, which Catalyst executes as BroadcastNestedLoopJoin: every
    fact row tests every interval (O(N x M) work on ONE loop per
    partition; fenced by tests/test_plan_shapes.py). The standard fix
    (Databricks' range-join binning, DuckDB/kdb interval indexes) is to
    quantize: each interval EXPLODES to the fixed-width bins it covers,
    facts compute their bin with one integer division, and the join
    becomes an EQUI-join on bin followed by the exact BETWEEN re-check.
    Fan-out is span/bin_width per interval (bounded, broadcastable);
    Catalyst broadcasts the exploded interval table and the whole plan is
    map-only against the fact scan.

    All arithmetic is integer cents (prices have exactly 2 decimals —
    round(x*100) is >= 1e-10 away from any .5, so HALF_UP vs HALF_EVEN can
    never diverge); bins are `cents div {_BIN_CENTS}`. Zero float math end
    to end: the whole result is BIGINT-exact.

    Scale shape at 100 TB: the interval dimension aggregates to
    |brands| rows and explodes to |brands| x span/width keys — thousands
    of rows, always broadcastable; the fact side never shuffles (map-side
    join + partial agg, one exchange for the final |brands|-row groupBy).
    Skewed bins (every brand overlaps [900, 1000]) cost fan-out, not a hot
    reducer, because the fan-out happens on the broadcast side."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    iv = part.groupBy("p_brand").agg(
        F.expr("cast(round(min(p_retailprice) * 100) as bigint)").alias("lo_c"),
        F.expr("cast(round(max(p_retailprice) * 100) as bigint)").alias("hi_c"),
    )
    iv_bins = iv.select(
        "p_brand",
        "lo_c",
        "hi_c",
        F.explode(
            F.expr(f"sequence(lo_c div {_BIN_CENTS}, hi_c div {_BIN_CENTS})")
        ).alias("bin"),
    )
    fact = li.select(
        "l_quantity",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("price_c"),
    ).withColumn("bin", F.expr(f"price_c div {_BIN_CENTS}"))
    joined = fact.join(F.broadcast(iv_bins), "bin").filter(
        (F.col("price_c") >= F.col("lo_c")) & (F.col("price_c") <= F.col("hi_c"))
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.coalesce(F.sum(F.col("l_quantity").cast("long")), F.lit(0))
        .cast("long")
        .alias("sum_qty"),
        F.coalesce(F.sum("price_c"), F.lit(0)).cast("long").alias(
            "sum_price_cents"
        ),
    )
