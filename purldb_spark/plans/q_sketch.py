"""Cardinality / frequency SKETCHES as first-class queries (beyond-reference,
brief-mandated "novel sketch" family; SURVEY.md §8).

At 100 TB you do not count distincts or token frequencies exactly on every
dashboard refresh — you maintain mergeable fixed-size sketches:

  sketch_hll_distinct -> HyperLogLog distinct-user counts per event type
                         (Flajolet et al. 2007), m = 64 registers
  sketch_cms_topk     -> Count-Min frequency estimates (Cormode &
                         Muthukrishnan 2005) for the exact top-10 corpus
                         tokens, d = 4 rows x w = 8 columns
                         (the corpus vocabulary is ~31 tokens, so the
                         narrow sketch genuinely collides)

Both are built RELATIONALLY from the shared md5 hash convention
(operators/assemble.py: first hex chars of md5 as an integer), so the DuckDB
oracle computes the *identical* sketch — the estimates themselves are
deterministic cross-engine, not just the exact baselines. Spark's built-in
approx_count_distinct is the production shortcut but its HLL++ register
layout is JVM-private; building the registers as rows keeps the sketch
engine-portable (and is exactly how you'd persist it as a mergeable table).

Determinism contract: register indexes, rho ranks, and counters are pure
BIGINT (bit lengths via length(bin(x)) — no log2 floats); the one float
step, the harmonic-mean estimate, rides the established 1e-6 grid
(floor(1e6 * ...) with ln/division from the same libm — the select_dsir
convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query

# ---------------------------------------------------------------------------
# sketch_hll_distinct
# ---------------------------------------------------------------------------

# m = 2^6 = 64 registers; 60-bit hash = 15 md5 hex chars (stays positive in
# BIGINT); top 6 bits -> register index, low 54 bits -> rho rank
_HLL_P = 6
_HLL_M = 64
_HLL_REST_BITS = 54
_POW54 = 1 << 54
_POW55 = 1 << 55
# alpha_64 = 0.709 (the published constant for m = 64); the estimate is
# alpha * m^2 / sum(2^-M) = 709/1000 * 4096 * 2^55 / S  with
# S = sum(2^(55 - M)) an exact BIGINT (max 64 * 2^55 = 2^61)
# e0 notation => DOUBLE literals in BOTH engines (DuckDB parses 123.0 as
# DECIMAL and would overflow the product)
_HLL_NUM = "1000000e0 * 709e0 * 4096e0 * 36028797018963968e0"
# linear-counting cutoff: raw < 2.5 * m  (on the e6 grid)
_HLL_LC_CUT = 160_000_000

_HV_SPARK = (
    "cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10)"
    " as bigint)"
)
_HV_SQL = (
    "CAST(CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15))"
    " AS UBIGINT) AS BIGINT)"
)


def hll_registers(ev: DataFrame) -> DataFrame:
    """(event_type, idx, m): the HLL register table for a (event_type,
    user_id) frame — the unit both the batch query and the streaming face
    (streaming/hll_stream.py) build. MAX-mergeable: registers from any
    partition of the data combine by max(m), which is also what makes the
    micro-batch merge idempotent under replay."""
    split = ev.select(
        "event_type",
        F.expr(f"{_HV_SPARK} div {_POW54}").alias("idx"),
        F.expr(f"{_HV_SPARK} % {_POW54}").alias("rest"),
    )
    return split.groupBy("event_type", "idx").agg(
        F.expr(
            "max(case when rest = 0 then 55 else 55 - length(bin(rest)) end)"
        ).alias("m")
    )


def hll_estimate(regs: DataFrame) -> DataFrame:
    """(event_type, registers_used, zeros, hll_est_e6) from a register
    table — the fold the batch query applies after joining its exact
    baseline, exposed separately so the streaming face derives estimates
    from its PERSISTED registers with the identical expression."""
    per_type = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("registers_used"),
        F.expr("cast(sum(shiftleft(1L, 55 - m)) as bigint)").alias(
            "s_present"
        ),
    )
    est = per_type.select(
        "event_type",
        "registers_used",
        (F.lit(_HLL_M) - F.col("registers_used")).cast("long").alias("zeros"),
        (
            F.col("s_present")
            + (F.lit(_HLL_M) - F.col("registers_used")) * F.lit(_POW55)
        ).alias("s"),
    )
    raw = est.withColumn(
        "raw_e6",
        F.expr(
            f"cast(floor({_HLL_NUM} / (1000e0 * cast(s as double)))"
            " as bigint)"
        ),
    )
    return raw.select(
        "event_type",
        "registers_used",
        "zeros",
        F.expr(
            f"case when zeros > 0 and raw_e6 < {_HLL_LC_CUT}"
            " then cast(floor(1000000e0 * 64e0 *"
            " ln(64e0 / cast(zeros as double))) as bigint)"
            " else raw_e6 end"
        ).alias("hll_est_e6"),
    )


@query(
    "sketch_hll_distinct",
    oracle=f"""
    WITH hashed AS (
      SELECT event_type,
             {_HV_SQL} AS hv
      FROM events
    ),
    split AS (
      SELECT event_type, hv // {_POW54} AS idx, hv % {_POW54} AS rest
      FROM hashed
    ),
    regs AS (
      SELECT event_type, idx,
             MAX(CASE WHEN rest = 0 THEN 55
                      ELSE 55 - length(bin(rest)) END) AS m
      FROM split GROUP BY event_type, idx
    ),
    per_type AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS present,
             CAST(sum(CAST(1 AS BIGINT) << (55 - m)) AS BIGINT) AS s_present
      FROM regs GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    ),
    est AS (
      SELECT e.event_type, e.n_exact,
             p.present AS registers_used,
             {_HLL_M} - p.present AS zeros,
             p.s_present + ({_HLL_M} - p.present) * CAST({_POW55} AS BIGINT)
               AS s
      FROM exact e JOIN per_type p ON e.event_type = p.event_type
    ),
    raw AS (
      SELECT event_type, n_exact, registers_used, zeros,
             CAST(floor({_HLL_NUM} / (1000e0 * CAST(s AS DOUBLE)))
                  AS BIGINT) AS raw_e6
      FROM est
    )
    SELECT event_type, n_exact,
           CAST(registers_used AS BIGINT) AS registers_used,
           CAST(zeros AS BIGINT) AS zeros,
           CASE WHEN zeros > 0 AND raw_e6 < {_HLL_LC_CUT}
                THEN CAST(floor(1000000e0 * 64e0 *
                                ln(64e0 / CAST(zeros AS DOUBLE))) AS BIGINT)
                ELSE raw_e6 END AS hll_est_e6
    FROM raw
    """,
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user-per-event-type, registers built as rows:
    hash each user id (shared md5 convention), split into (register index,
    remainder), keep MAX(rho) per (type, register) — a map-side-combinable
    aggregate collapsing any corpus to <= types x 64 rows — then fold the
    registers into the harmonic-mean estimate with the standard
    linear-counting small-range correction (zeros present and raw < 2.5m).
    The exact distinct count rides along as the published-eval baseline
    (the same pattern as knn_recall_eval: sketch + ground truth in one
    report).

    rho is computed WITHOUT floats: the remainder's bit length is
    length(bin(rest)) in both engines (identical unpadded binary strings),
    so rho = 55 - bitlen is BIGINT-exact; the only float is the final
    harmonic estimate, snapped once to the 1e-6 grid. The 2^32 large-range
    correction is irrelevant at a 60-bit hash and omitted.

    Scale shape at 100 TB: the register table is the persistent sketch
    state — mergeable by MAX across partitions, shards, and days (this is
    why production metrics pipelines ship HLL registers, not counts); the
    shuffle is bounded by types x 64 rows regardless of corpus size, while
    the exact baseline pays the full distinct shuffle (labeled here as the
    eval's ground truth, same status as knn_bruteforce)."""
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    est = hll_estimate(hll_registers(ev))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(F.broadcast(est), "event_type").select(
        "event_type", "n_exact", "registers_used", "zeros", "hll_est_e6"
    )


# ---------------------------------------------------------------------------
# sketch_cms_topk
# ---------------------------------------------------------------------------

_CMS_D = 4      # hash rows
_CMS_W = 8      # columns per row — narrower than the ~31-token vocabulary
                # so collisions (the estimator's one-sided error) are real
_CMS_TOPK = 10

# row-j column for token w: md5 with a per-row salt, first 8 hex chars
_CMS_COL_SPARK = (
    "pmod(cast(conv(substring(md5(concat('cms', cast({j} as string), '|',"
    " {w})), 1, 8), 16, 10) as bigint), 8)"
)
_CMS_COL_SQL = (
    "CAST(CAST(concat('0x', substring(md5('cms' || CAST({j} AS VARCHAR)"
    " || '|' || {w}), 1, 8)) AS UBIGINT) % 8 AS BIGINT)"
)


@query(
    "sketch_cms_topk",
    oracle=f"""
    WITH toks AS (
      SELECT u.wd FROM documents, LATERAL unnest(string_split(text, ' ')) u(wd)
      WHERE u.wd <> ''
    ),
    cells AS (
      SELECT j.j AS j, {_CMS_COL_SQL.format(j="j.j", w="wd")} AS col,
             CAST(count(*) AS BIGINT) AS cnt
      FROM toks, range({_CMS_D}) j(j)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT wd, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM toks GROUP BY wd
      ORDER BY exact_cnt DESC, wd LIMIT {_CMS_TOPK}
    ),
    probes AS (
      SELECT e.wd, e.exact_cnt, j.j AS j,
             {_CMS_COL_SQL.format(j="j.j", w="e.wd")} AS col
      FROM exact e, range({_CMS_D}) j(j)
    )
    SELECT p.wd AS token, p.exact_cnt,
           CAST(min(c.cnt) AS BIGINT) AS cms_est,
           CAST(min(c.cnt) - p.exact_cnt AS BIGINT) AS overestimate
    FROM probes p JOIN cells c ON p.j = c.j AND p.col = c.col
    GROUP BY p.wd, p.exact_cnt
    """,
)
def sketch_cms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over corpus tokens, evaluated on the
    exact top-{_CMS_TOPK}: every token increments one counter per hash row
    (d = {_CMS_D} salted md5 hashes into w = {_CMS_W} columns), the
    estimate is the MIN across its row counters — a one-sided estimator
    (cms_est >= exact always; the ``overestimate`` column is the collision
    error, >= 0 by construction, which the test suite pins).

    Pure BIGINT end to end — the sketch, the exact counts, and the error
    are all integers; nothing rides a float grid.

    Scale shape at 100 TB: the sketch is the fixed d x w cell table
    regardless of corpus size — counters are additive (map-side combine
    does almost all the work; the shuffle moves <= 512 rows per partial),
    mergeable across shards/days by cell-wise sum, exactly how heavy-hitter
    monitoring ships. The exact top-k groupBy is the labeled ground-truth
    baseline (full token shuffle), present for the same reason
    knn_bruteforce is."""
    docs = load(spark, sf_dir, "documents")
    # one parquet file -> one input partition: the d x N md5 fan-out is
    # this query's whole cost, and it would run on a single task (23x at
    # 10x data in the r11 driver bench — parallelism frozen at 1 while
    # the token count grew). Spread the DOCS (cheaper to shuffle than
    # tokens) before the explode, the word_shingles guard: at 100 TB the
    # scan already has thousands of splits and the condition is false.
    parallelism = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < parallelism:
        docs = docs.repartition(parallelism)
    toks = (
        docs.select(F.explode(F.split("text", " ")).alias("wd"))
        .filter(F.col("wd") != "")
    )
    fan = toks.select(
        "wd", F.explode(F.expr(f"sequence(0, {_CMS_D - 1})")).alias("j")
    )
    cells = (
        fan.select("j", F.expr(_CMS_COL_SPARK.format(j="j", w="wd")).alias("col"))
        .groupBy("j", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    exact = (
        toks.groupBy("wd")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "wd")
        .limit(_CMS_TOPK)
    )
    probes = exact.select(
        "wd",
        "exact_cnt",
        F.explode(F.expr(f"sequence(0, {_CMS_D - 1})")).alias("j"),
    ).withColumn("col", F.expr(_CMS_COL_SPARK.format(j="j", w="wd")))
    return (
        probes.join(F.broadcast(cells), ["j", "col"])
        .groupBy(F.col("wd").alias("token"), "exact_cnt")
        .agg(
            F.min("cnt").cast("long").alias("cms_est"),
            (F.min("cnt") - F.col("exact_cnt").cast("long"))
            .cast("long")
            .alias("overestimate"),
        )
    )


# ---------------------------------------------------------------------------
# sketch_histogram_quantiles
# ---------------------------------------------------------------------------

_HQ_BIN_CENTS = 256          # fixed histogram bin width (2.56 value units)
_HQ_PCTS = (50, 95, 99)


@query(
    "sketch_histogram_quantiles",
    oracle=f"""
    WITH cents AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS c FROM events
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cents),
    hist AS (
      SELECT c // {_HQ_BIN_CENTS} AS bin, CAST(count(*) AS BIGINT) AS cnt
      FROM cents GROUP BY 1
    ),
    cum AS (
      SELECT bin, sum(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM hist
    ),
    pcts AS (SELECT unnest([{", ".join(str(p) for p in _HQ_PCTS)}]) AS pct),
    ranks AS (
      SELECT pct, (pct * n.n + 99) // 100 AS rk FROM pcts CROSS JOIN n
    ),
    est AS (
      SELECT r.pct, r.rk,
             min(c.bin) AS est_bin
      FROM ranks r JOIN cum c ON c.cum >= r.rk
      GROUP BY r.pct, r.rk
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c, event_id) AS rank FROM cents
    )
    SELECT CAST(e.pct AS BIGINT) AS pct,
           (SELECT n FROM n) AS n,
           x.c AS exact_cents,
           (e.est_bin + 1) * {_HQ_BIN_CENTS} - 1 AS est_hi_cents,
           (e.est_bin + 1) * {_HQ_BIN_CENTS} - 1 - x.c AS err_cents
    FROM est e JOIN ranked x ON x.rank = e.rk
    """,
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a fixed-width HISTOGRAM sketch — the third
    of the classic sketch trio (HLL cardinality, CMS frequency, histogram
    quantiles): integer-cent values bucket into {_HQ_BIN_CENTS}-cent bins
    (one map-side-combined groupBy collapsing any corpus to a few hundred
    rows), a cumulative window walks the tiny histogram, and each
    percentile's estimate is the UPPER EDGE of the first bin whose
    cumulative count reaches ceil(p*n/100) — a one-sided estimator
    (est >= exact, error bounded by the bin width), evaluated against the
    exact rank-order statistic riding along as the labeled baseline.

    Engineered around the plan fence: the percentile list rides INSIDE the
    histogram rows (explode + filter + groupBy min — no non-equi join, so
    no BroadcastNestedLoopJoin), and n / rank thresholds are driver
    scalars (documented BNLJ avoidance; the oracle uses scalar subqueries
    and an explicit tiny cross join for the same numbers).

    Scale shape at 100 TB: the histogram is additive fixed-size state like
    the CMS grid — mergeable across partitions/shards/days by cell-wise
    sum, the standard way distributed engines (and parquet column stats)
    approximate quantiles; the exact baseline pays the full sort that
    production avoids (same labeled-baseline status as knn_bruteforce) —
    but even the baseline ranks DISTRIBUTED (value-range prefix groups +
    broadcast cumulative offsets, the q_layout dist_bucket shape; since
    round 9 no corpus-sized single-partition window remains anywhere in
    the registry)."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        "event_id", F.expr("cast(round(value * 100) as bigint)").alias("c")
    )
    # driver scalars (documented BNLJ avoidance): n feeds the rank
    # formula, the observed cent range sizes the ~64 prefix groups of the
    # distributed exact rank below (event_id range feeds the degenerate-
    # range fallback)
    n, c_min, c_max, e_min, e_max = cents.agg(
        F.count(F.lit(1)),
        F.min("c"),
        F.max("c"),
        F.min("event_id"),
        F.max("event_id"),
    ).first()
    ranks = {p: (p * n + 99) // 100 for p in _HQ_PCTS}

    hist = cents.groupBy(
        F.expr(f"c div {_HQ_BIN_CENTS}").alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    # percentile thresholds ride along each histogram row (map-only
    # explode), so "first bin reaching the rank" is filter + groupBy min —
    # no non-equi join anywhere in the plan
    rk_pairs = ", ".join(
        f"struct({p}L as pct, {rk}L as rk)" for p, rk in ranks.items()
    )
    est = (
        cum.select(
            "bin", "cum", F.explode(F.expr(f"array({rk_pairs})")).alias("pr")
        )
        .filter(F.col("cum") >= F.col("pr.rk"))
        .groupBy(F.col("pr.pct").alias("pct"), F.col("pr.rk").alias("rk"))
        .agg(F.min("bin").alias("est_bin"))
    )
    # exact rank WITHOUT a single-partition window (the q_layout
    # dist_bucket shape): prefix-group by leading value range (monotone
    # in the (c, event_id) order, so groups are contiguous rank ranges),
    # rank within each group in parallel, add broadcast cumulative
    # offsets — bit-identical to the oracle's plain global row_number.
    # Degenerate-range guard (r9 advice): a constant or range-concentrated
    # value column makes the range-based key collapse to a handful of
    # groups — i.e. the corpus-sized single-partition window this rewrite
    # exists to avoid. When the cent range yields < 8 value groups, extend
    # the prefix key with the TIE-BREAK column's own range: the sort order
    # is (c, event_id), so (c, event_id-bucket) is still monotone in it and
    # groups stay contiguous rank ranges, ~64-way parallel even when every
    # row holds the same c. (An approx-quantile fallback would NOT cover
    # the constant-column worst case — all its boundaries coincide.)
    rng = (int(c_max) - int(c_min)) if n else 0
    base = int(c_min) if n else 0
    if rng >= 64:
        g_expr = f"(c - {base}) div {max(rng // 64, 1)}"
    else:
        e_div = max((int(e_max) - int(e_min) + 64) // 64, 1) if n else 1
        e_base = int(e_min) if n else 0
        g_expr = (
            f"(c - {base}) * 64 + ((event_id - {e_base}) div {e_div})"
        )
    from purldb_spark.conf import shuffle_partitions

    n_part = shuffle_partitions(spark)
    with_g = cents.withColumn("_g", F.expr(g_expr)).repartition(
        n_part, "_g"
    )
    offs = (
        with_g.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_c").over(
                    Window.orderBy("_g").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("_c")
    )
    w_in = Window.partitionBy("_g").orderBy("c", "event_id")
    ranked = (
        with_g.join(F.broadcast(offs), "_g")
        .withColumn("rank", F.row_number().over(w_in) + F.col("_off"))
        .filter(F.col("rank").isin(*ranks.values()))
        .drop("_g", "_off")
    )
    return (
        est.join(ranked, est.rk == ranked.rank)
        .select(
            "pct",
            F.lit(n).cast("long").alias("n"),
            F.col("c").alias("exact_cents"),
            ((F.col("est_bin") + 1) * _HQ_BIN_CENTS - 1).alias("est_hi_cents"),
            ((F.col("est_bin") + 1) * _HQ_BIN_CENTS - 1 - F.col("c")).alias(
                "err_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# sketch_hll_merge_daily
# ---------------------------------------------------------------------------


def _est_sql(regs_cte: str, p: str) -> str:
    """The register->estimate CTE chain (namespaced by ``p``), reused for
    the merged-shards side and the direct side of the merge proof."""
    return f"""
    {p}per_type AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS present,
             CAST(sum(CAST(1 AS BIGINT) << (55 - m)) AS BIGINT) AS s_present
      FROM {regs_cte} GROUP BY event_type
    ),
    {p}est AS (
      SELECT event_type, present,
             {_HLL_M} - present AS zeros,
             s_present + ({_HLL_M} - present) * CAST({_POW55} AS BIGINT) AS s
      FROM {p}per_type
    ),
    {p}raw AS (
      SELECT event_type, zeros,
             CAST(floor({_HLL_NUM} / (1000e0 * CAST(s AS DOUBLE)))
                  AS BIGINT) AS raw_e6
      FROM {p}est
    ),
    {p}final AS (
      SELECT event_type,
             CASE WHEN zeros > 0 AND raw_e6 < {_HLL_LC_CUT}
                  THEN CAST(floor(1000000e0 * 64e0 *
                                  ln(64e0 / CAST(zeros AS DOUBLE))) AS BIGINT)
                  ELSE raw_e6 END AS est_e6
      FROM {p}raw
    )"""


@query(
    "sketch_hll_merge_daily",
    oracle=f"""
    WITH hashed AS (
      SELECT event_type, CAST(ts AS DATE) AS day, {_HV_SQL} AS hv
      FROM events
    ),
    split AS (
      SELECT event_type, day, hv // {_POW54} AS idx, hv % {_POW54} AS rest
      FROM hashed
    ),
    daily AS (
      SELECT event_type, day, idx,
             MAX(CASE WHEN rest = 0 THEN 55
                      ELSE 55 - length(bin(rest)) END) AS m
      FROM split GROUP BY event_type, day, idx
    ),
    merged AS (
      SELECT event_type, idx, MAX(m) AS m FROM daily
      GROUP BY event_type, idx
    ),
    direct AS (
      SELECT event_type, idx,
             MAX(CASE WHEN rest = 0 THEN 55
                      ELSE 55 - length(bin(rest)) END) AS m
      FROM split GROUP BY event_type, idx
    ),
    {_est_sql("merged", "m_")},
    {_est_sql("direct", "d_")}
    SELECT m.event_type,
           CAST((SELECT count(*) FROM daily d2
                 WHERE d2.event_type = m.event_type) AS BIGINT)
             AS n_daily_registers,
           m.est_e6 AS est_merged_e6,
           d.est_e6 AS est_direct_e6,
           m.est_e6 = d.est_e6 AS merge_exact
    FROM m_final m JOIN d_final d ON m.event_type = d.event_type
    """,
)
def sketch_hll_merge_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL merge proof as a first-class query — the production job
    every sketch deployment runs: per-DAY register shards (what a daily
    ingest would persist) MAX-merged into one register table, whose
    estimate must equal the single-pass build over all data. This is the
    lossless-merge property that makes HLL viable at 100 TB (shards merge
    without re-reading raw data); `merge_exact` is TRUE for every group by
    the monoid algebra, and the oracle re-derives both sides relationally
    so the claim is engine-checked, not asserted.

    Scale shape: daily shards are <= types x days x 64 rows; the merge is
    one tiny groupBy; neither side re-shuffles raw events more than once."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "user_id",
    )
    split = ev.select(
        "event_type",
        "day",
        F.expr(f"{_HV_SPARK} div {_POW54}").alias("idx"),
        F.expr(f"{_HV_SPARK} % {_POW54}").alias("rest"),
    )
    rho = "max(case when rest = 0 then 55 else 55 - length(bin(rest)) end)"
    daily = split.groupBy("event_type", "day", "idx").agg(
        F.expr(rho).alias("m")
    ).localCheckpoint(eager=True)  # shard table reused by merge + count
    merged = daily.groupBy("event_type", "idx").agg(F.max("m").alias("m"))
    direct = split.groupBy("event_type", "idx").agg(F.expr(rho).alias("m"))

    m_est = hll_estimate(merged).select(
        "event_type", F.col("hll_est_e6").alias("est_merged_e6")
    )
    d_est = hll_estimate(direct).select(
        "event_type", F.col("hll_est_e6").alias("est_direct_e6")
    )
    n_daily = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_daily_registers")
    )
    return (
        n_daily.join(F.broadcast(m_est), "event_type")
        .join(F.broadcast(d_est), "event_type")
        .select(
            "event_type",
            "n_daily_registers",
            "est_merged_e6",
            "est_direct_e6",
            (F.col("est_merged_e6") == F.col("est_direct_e6")).alias(
                "merge_exact"
            ),
        )
    )


# ---------------------------------------------------------------------------
# sketch_histogram_merge
# ---------------------------------------------------------------------------


@query(
    "sketch_histogram_merge",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    daily AS (
      SELECT day, c // {_HQ_BIN_CENTS} AS bin, CAST(count(*) AS BIGINT) AS cnt
      FROM cents GROUP BY 1, 2
    ),
    merged AS (
      SELECT bin, CAST(sum(cnt) AS BIGINT) AS cnt FROM daily GROUP BY bin
    ),
    direct AS (
      SELECT c // {_HQ_BIN_CENTS} AS bin, CAST(count(*) AS BIGINT) AS cnt
      FROM cents GROUP BY 1
    ),
    mcum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM merged),
    dcum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM direct),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cents),
    ranks AS (
      SELECT CAST(pct AS BIGINT) AS pct,
             (CAST(pct AS BIGINT) * nn.n + 99) // 100 AS rk
      FROM (SELECT unnest([{", ".join(str(p) for p in _HQ_PCTS)}]) AS pct),
           nn
    ),
    mest AS (
      SELECT r.pct, CAST(min(bin) AS BIGINT) AS est_bin
      FROM ranks r JOIN mcum ON mcum.cum >= r.rk GROUP BY r.pct
    ),
    dest AS (
      SELECT r.pct, CAST(min(bin) AS BIGINT) AS est_bin
      FROM ranks r JOIN dcum ON dcum.cum >= r.rk GROUP BY r.pct
    )
    SELECT m.pct,
           CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_daily_shards,
           (m.est_bin + 1) * {_HQ_BIN_CENTS} - 1 AS est_merged_hi_cents,
           (d.est_bin + 1) * {_HQ_BIN_CENTS} - 1 AS est_direct_hi_cents,
           m.est_bin = d.est_bin AS merge_exact
    FROM mest m JOIN dest d ON d.pct = m.pct
    """,
)
def sketch_histogram_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch shard-merge proof — completing the merge-proof
    trio (HLL registers merge by MAX: sketch_hll_merge_daily; KMV merges
    by bottom-k-of-union: streaming/kmv_stream; the fixed-width histogram
    merges by CELL-WISE SUM): daily per-bin count shards summed cell-wise
    must reproduce the direct whole-corpus histogram, and therefore every
    quantile estimate read off it — checked per percentile by the engine
    itself (merge_exact rides in the row). This is the property that lets
    production keep ONLY per-day histogram shards and answer any date
    range by addition — the same reason parquet column stats and
    t-digest-style sketches are additive.

    Scale shape: the shard table is bounded (days x ~hundreds of bins —
    n_daily_shards rides along), the merge is one tiny groupBy, and each
    quantile estimate is a cumulative walk over the bounded histogram
    (explode-threshold, no non-equi join on the Spark side). Nothing
    rescans raw events more than the two labeled groupBys."""
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        F.expr("cast(cast(ts as timestamp) as date)").alias("day"),
        F.expr("cast(round(value * 100) as bigint)").alias("c"),
    )
    n = cents.count()  # driver scalar (documented BNLJ avoidance)
    ranks = {p: (p * n + 99) // 100 for p in _HQ_PCTS}
    daily = (
        cents.groupBy("day", F.expr(f"c div {_HQ_BIN_CENTS}").alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)  # shard table reused by merge + count
    )
    n_shards = daily.count()  # driver scalar
    merged = daily.groupBy("bin").agg(F.sum("cnt").cast("long").alias("cnt"))
    direct = cents.groupBy(
        F.expr(f"c div {_HQ_BIN_CENTS}").alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))

    rk_pairs = ", ".join(
        f"struct({p}L as pct, {rk}L as rk)" for p, rk in ranks.items()
    )

    def est(hist: DataFrame) -> DataFrame:
        cum = hist.withColumn(
            "cum",
            F.sum("cnt").over(
                Window.orderBy("bin").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        return (
            cum.select(
                "bin",
                "cum",
                F.explode(F.expr(f"array({rk_pairs})")).alias("pr"),
            )
            .filter(F.col("cum") >= F.col("pr.rk"))
            .groupBy(F.col("pr.pct").alias("pct"))
            .agg(F.min("bin").cast("long").alias("est_bin"))
        )

    m = est(merged).select("pct", F.col("est_bin").alias("m_bin"))
    d = est(direct).select("pct", F.col("est_bin").alias("d_bin"))
    return (
        m.join(F.broadcast(d), "pct")
        .select(
            "pct",
            F.lit(n_shards).cast("long").alias("n_daily_shards"),
            ((F.col("m_bin") + 1) * _HQ_BIN_CENTS - 1).alias(
                "est_merged_hi_cents"
            ),
            ((F.col("d_bin") + 1) * _HQ_BIN_CENTS - 1).alias(
                "est_direct_hi_cents"
            ),
            (F.col("m_bin") == F.col("d_bin")).alias("merge_exact"),
        )
    )
