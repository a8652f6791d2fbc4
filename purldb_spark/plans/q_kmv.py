"""K-Minimum-Values (bottom-k) distinct sketch with SET-OPERATION
estimates (Beyer et al. 2007, "On synopses for distinct value estimation
under multiset operations") — the sketch-family member HLL cannot be:
HLL registers merge by MAX into a UNION estimate only, while a KMV
synopsis of the k smallest distinct hash values supports union,
intersection, and Jaccard between any two sketched sets.

sketch_kmv_intersect -> per PAIR of event types, the KMV union/Jaccard/
intersection estimates over ACTIVE-USER-DAY sets next to their exact baselines (the
sketch + ground-truth-in-one-report pattern of sketch_hll_distinct and
knn_recall_eval).

Estimator (on the repo's md5-60-bit hash convention — the same
15-hex-char split q_sketch uses, so the DuckDB oracle computes the
identical sketch):

  * per-type sketch      = k smallest DISTINCT hv (k = 32),
  * merged pair sketch   = k smallest of the union of the two sketches
    (bottom-k is a commutative, idempotent monoid — the same property
    that lets the streaming face merge micro-batches in any order),
  * union estimate       = (k-1) * 2^60 / kth_smallest  (exact when the
    merged sketch holds fewer than k values),
  * Jaccard estimate     = |merged sketch ∩ both sketches| / k',
  * intersection         = Jaccard * union  (BIGINT-composed:
    n_both * union_est_e6 // k' — no second float step).

Determinism contract: hash values and counts are BIGINT end to end; the
one float step (the union estimate's division) follows the established
pattern — an EXACT double numerator (1e6 * 31 * 2^60 needs 19 significand
bits) divided once, floor-snapped to the 1e-6 grid; the Jaccard and
intersection estimates are pure BIGINT floor divisions.

Scale shape at 100 TB: the per-type sketch is a TWO-PHASE bottom-k — a
64-way salted partial bottom-k (window over (type, salt) — fully
parallel, map-side bounded to 64 x k candidate rows per type) then a
global bottom-k over those <= 64*k survivors — so no single task ever
sees a type's full distinct stream; the pair stage joins a broadcast
|pairs| frame against k-row sketches. The labeled exact baselines pay
one distinct-set-sized groupBy(hv) (r16 — each element expands to its
type set's m(m-1)/2 pairs, m <= T, instead of the old (T-1)x
replication of the whole distinct set across the pair frame), the same
ground-truth status as knn_bruteforce. The synopsis is the persistent
state production keeps per shard/day: kmv_stream (streaming face) merges
micro-batch sketches by the identical bottom-k-of-union fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query

_KMV_K = 32

# sketch ELEMENT = active user-DAY (user_id | UTC date): every event type
# touches the same user population in the synthetic corpus, so plain
# user_id sets are identical across types — user-days give each type a
# genuinely partial overlap (Jaccards ~0.2) that exercises the estimator.
# Same md5-60-bit convention as q_sketch (15 hex chars stay positive in
# BIGINT); ts is TIMESTAMP_NTZ in the parquet, cast through timestamp
# under the session's pinned UTC (the j14/unix_micros convention).
_EL_SPARK = (
    "cast(conv(substring(md5(concat(cast(user_id as string), '|',"
    " cast(cast(cast(ts as timestamp) as date) as string))), 1, 15),"
    " 16, 10) as bigint)"
)
_EL_SQL = (
    "CAST(CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR) || '|'"
    " || CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 15)) AS UBIGINT)"
    " AS BIGINT)"
)
_SALTS = 64  # phase-1 parallelism of the bottom-k (salt = hv % _SALTS)
# exact double numerator: 1e6 * (k-1) * 2^60 (left-to-right product is
# integer-exact in IEEE double — (k-1)e6 needs well under 53 significand
# bits for any plausible k, the 2^60 factor only shifts the exponent); e0
# notation = DOUBLE in both engines.  Derived from _KMV_K so changing the
# sketch size cannot silently skew the union estimator (r9 advice: the
# literal 31e0 was only correct while _KMV_K == 32).
_EST_NUM = f"1000000e0 * {_KMV_K - 1}e0 * 1152921504606846976e0"


def kmv_sketch(ev: DataFrame, k: int = _KMV_K) -> DataFrame:
    """(event_type, hv) bottom-k sketch of the distinct element hashes — the
    unit both the batch query and streaming/kmv_stream.py build.

    Two-phase exact bottom-k: phase 1 ranks within (type, hv % _SALTS)
    so the heavy scan parallelizes across 64 salt groups per type; the
    global phase ranks the <= 64k survivors. Bottom-k of disjoint-partial
    bottom-ks IS the global bottom-k, so the result is identical to the
    oracle's single ranked window."""
    d = ev.select(
        "event_type", F.expr(_EL_SPARK).alias("hv")
    ).distinct()
    return kmv_from_distinct(d, k)


def kmv_from_distinct(d: DataFrame, k: int = _KMV_K) -> DataFrame:
    """The two-phase rank over an already-distinct (event_type, hv) frame
    — split out so the batch query shares ONE distinct pass between the
    sketch and its exact baseline."""
    w1 = Window.partitionBy(
        "event_type", F.expr(f"hv % {_SALTS}")
    ).orderBy("hv")
    cand = d.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy("event_type").orderBy("hv")
    return (
        cand.withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .select("event_type", "hv")
    )


def _pairs_df(spark: SparkSession, types: list[str]) -> DataFrame:
    """The bounded (type_a < type_b) pair frame, built from the
    driver-collected type list (a handful of strings — the documented
    BNLJ-avoidance pattern: a literal pair frame + two equi-joins instead
    of a `<` theta-join)."""
    rows = [
        (a, b)
        for i, a in enumerate(types)
        for b in types[i + 1 :]
    ]
    return spark.createDataFrame(rows, "type_a string, type_b string")


@query(
    "sketch_kmv_intersect",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT event_type, {_EL_SQL} AS hv FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS r
      FROM d
    ),
    kmv AS (SELECT event_type, hv FROM ranked WHERE r <= {_KMV_K}),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
    ),
    mtall AS (
      SELECT p.type_a, p.type_b, s.hv,
             MAX(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END)
               AS in_a,
             MAX(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END)
               AS in_b
      FROM pairs p
      JOIN kmv s ON s.event_type IN (p.type_a, p.type_b)
      GROUP BY p.type_a, p.type_b, s.hv
    ),
    mranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY type_a, type_b ORDER BY hv) AS r
      FROM mtall
    ),
    sk AS (
      SELECT type_a, type_b,
             CAST(count(*) AS BIGINT) AS kk,
             CAST(max(hv) AS BIGINT) AS kth,
             CAST(sum(in_a * in_b) AS BIGINT) AS n_both
      FROM mranked WHERE r <= {_KMV_K}
      GROUP BY type_a, type_b
    ),
    ftall AS (
      SELECT p.type_a, p.type_b, s.hv,
             MAX(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END)
               AS in_a,
             MAX(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END)
               AS in_b
      FROM pairs p
      JOIN d s ON s.event_type IN (p.type_a, p.type_b)
      GROUP BY p.type_a, p.type_b, s.hv
    ),
    exact AS (
      SELECT type_a, type_b,
             CAST(count(*) AS BIGINT) AS n_exact_union,
             CAST(sum(in_a * in_b) AS BIGINT) AS n_exact_intersect
      FROM ftall GROUP BY type_a, type_b
    ),
    est AS (
      SELECT s.type_a, s.type_b, s.kk, s.n_both,
             CASE WHEN s.kk < {_KMV_K} THEN s.kk * 1000000
                  ELSE CAST(floor({_EST_NUM}
                       / CAST(s.kth AS DOUBLE)) AS BIGINT)
             END AS union_est_e6
      FROM sk s
    )
    SELECT e.type_a, e.type_b, x.n_exact_union, x.n_exact_intersect,
           e.union_est_e6,
           CAST(e.n_both * 1000000 // e.kk AS BIGINT) AS jaccard_est_e6,
           CAST(e.n_both * e.union_est_e6 // e.kk AS BIGINT)
             AS intersect_est_e6
    FROM est e
    JOIN exact x ON x.type_a = e.type_a AND x.type_b = e.type_b
    """,
)
def sketch_kmv_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimates for every pair of event types: distinct
    user hashes sketch to bottom-32 per type (two-phase parallel rank),
    pair sketches merge by bottom-k of the union, and union / Jaccard /
    intersection estimates ride next to their exact baselines.

    The pair fan-out is a literal broadcast frame (types collected
    driver-side — a bounded scalar list, the documented pattern) and two
    equi-joins; the exact baseline's only distinct-set-sized work is one
    groupBy(hv) whose per-element output is the type-pair expansion
    (m(m-1)/2 rows, m <= T), unions closed by inclusion-exclusion.
    """
    ev = load(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    # ONE distinct pass feeds the sketch, the exact baseline, and the type
    # list (materialized — the session-fixture convention; the oracle
    # recomputes it relationally as the `d` CTE).  NULL user_id/ts would
    # hash to a NULL hv, which Spark's ascending window ranks FIRST and
    # DuckDB's ORDER BY ranks LAST — filter identically in both engines
    # BEFORE ranking (r9 advice) so a NULL can never become the "smallest"
    # sketch value on one side only.
    d = (
        ev.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("event_type", F.expr(_EL_SPARK).alias("hv"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    kmv = kmv_from_distinct(d)
    types = sorted(
        r["event_type"] for r in d.select("event_type").distinct().collect()
    )
    pairs = _pairs_df(spark, types)

    def tagged_union(src: DataFrame) -> DataFrame:
        a = pairs.join(
            src.select(F.col("event_type").alias("type_a"), "hv"), "type_a"
        ).select("type_a", "type_b", "hv", F.lit(1).alias("in_a"),
                 F.lit(0).alias("in_b"))
        b = pairs.join(
            src.select(F.col("event_type").alias("type_b"), "hv"), "type_b"
        ).select("type_a", "type_b", "hv", F.lit(0).alias("in_a"),
                 F.lit(1).alias("in_b"))
        return (
            a.unionByName(b)
            .groupBy("type_a", "type_b", "hv")
            .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        )

    w = Window.partitionBy("type_a", "type_b").orderBy("hv")
    sk = (
        tagged_union(kmv)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _KMV_K)
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("kk"),
            F.max("hv").cast("long").alias("kth"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias(
                "n_both"
            ),
        )
    )
    # Exact baseline WITHOUT replicating the distinct set across the
    # pair frame (r16, guide §2.2: shuffle fewer bytes). The old shape
    # shuffled (T-1)*|d| tagged rows into a (type_a, type_b, hv) groupBy
    # (sf0.1: 322,992 rows). Instead: group by hv once -> the sorted set
    # of types holding it (one |d|-row shuffle), explode each hv's
    # m-type set into its m(m-1)/2 type PAIRS (m <= T, and hvs unique to
    # one type emit nothing — sf0.1: 58,025 rows, 5.6x fewer), count
    # per pair = the exact intersection; the exact union is then the
    # set identity |A u B| = |A| + |B| - |A n B| from per-type counts.
    # Integer-exact end to end, so the output is bit-identical.
    byhv = d.groupBy("hv").agg(
        F.sort_array(F.collect_set("event_type")).alias("ts")
    )
    ipairs = byhv.select(
        F.explode(
            F.expr(
                "flatten(transform(ts, (a, i) ->"
                " transform(slice(ts, i + 2, size(ts)),"
                " b -> struct(a as type_a, b as type_b))))"
            )
        ).alias("p")
    ).select("p.type_a", "p.type_b")
    inter = ipairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_i")
    )
    ntype = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    exact = (
        pairs.join(
            ntype.select(
                F.col("event_type").alias("type_a"),
                F.col("n_t").alias("n_ta"),
            ),
            "type_a",
        )
        .join(
            ntype.select(
                F.col("event_type").alias("type_b"),
                F.col("n_t").alias("n_tb"),
            ),
            "type_b",
        )
        .join(inter, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            (
                F.col("n_ta")
                + F.col("n_tb")
                - F.coalesce(F.col("n_i"), F.lit(0))
            )
            .cast("long")
            .alias("n_exact_union"),
            F.coalesce(F.col("n_i"), F.lit(0))
            .cast("long")
            .alias("n_exact_intersect"),
        )
    )
    est = sk.withColumn(
        "union_est_e6",
        F.when(
            F.col("kk") < _KMV_K, F.col("kk") * F.lit(1000000)
        ).otherwise(
            F.expr(
                f"cast(floor({_EST_NUM} / cast(kth as double)) as bigint)"
            )
        ),
    )
    return est.join(F.broadcast(exact), ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "n_exact_union",
        "n_exact_intersect",
        "union_est_e6",
        F.expr("cast(n_both * 1000000 div kk as bigint)").alias(
            "jaccard_est_e6"
        ),
        F.expr("cast(n_both * union_est_e6 div kk as bigint)").alias(
            "intersect_est_e6"
        ),
    )
