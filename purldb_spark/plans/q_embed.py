"""Training-data-pipeline queries, embedding near-dup family (split from the
former q_llm.py so one edit no longer invalidates the whole LLM-ops
inventory's verification hashes at once).

Coverage:
  exact cosine pairs -> dedup_embedding_cosine   (all-pairs ground truth)
  LSH blocking       -> dedup_embedding_blocked  (the 100 TB scale path)
  multiprobe         -> dedup_embedding_multiprobe (recall knob, 4-bit fixture)

The ANN top-k search family lives in q_knn.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.operators.knn import (
    bucket_sql,
    dot_expr,
    dot_sql_duckdb,
    hyperplanes,
    normalize_sql_duckdb,
)
from purldb_spark.operators.scale_params import (
    MIN_PLANES,
    lsh_n_planes,
    lsh_planes_for,
)
from purldb_spark.plans.fixture_cache import unit_embeddings
from purldb_spark.plans.registry import query

_N_BANDS = 8  # independent bands buy back the recall narrower buckets cost

# The ORACLE-WIDTH blocking config: bucket BITS sized ~log2(N) per
# BENCH_scale.md finding 1 (random-pair bucket collisions scale as
# N²·bands/2^bits; the 4-bit layout measured 2.4 s -> 111 s at 10x data).
# Since round 10 the REGISTRY queries size the width from the corpus
# (block_bands below — the coarse_k recipe applied to LSH): this constant
# is the MIN_PLANES-wide layout the static oracle SQL bakes, identical to
# what block_bands returns at every verification scale.
_BLOCK_BANDS = [
    hyperplanes(dim=64, n_planes=MIN_PLANES, seed=100 + b)
    for b in range(_N_BANDS)
]


def block_bands(
    spark: SparkSession, sf_dir: str
) -> tuple[list[list[list[float]]], str]:
    """Corpus-scaled production band layout + its fixture key: width =
    operators/scale_params.lsh_n_planes (max(8, floor(log2 N) - 4)) —
    8 planes at every verification corpus (<= 4095 vectors, where the
    returned bands == _BLOCK_BANDS and the static oracles stay bit-valid),
    10 planes at the 20k-vector sf1 probe, ~log2(N)-4 beyond, so per-band
    bucket occupancy and with it candidate volume stay flat in N. Seeds
    are fixed per band index, so narrower layouts are prefixes of the
    plane sequence, not re-rolls."""
    w = lsh_planes_for(spark, sf_dir)
    if w == MIN_PLANES:
        return _BLOCK_BANDS, f"block{_N_BANDS}x{MIN_PLANES}"
    return (
        [hyperplanes(dim=64, n_planes=w, seed=100 + b) for b in range(_N_BANDS)],
        f"block{_N_BANDS}x{w}",
    )

# The labeled RECALL FIXTURE: 4 bands x 4-bit buckets. Wide buckets give the
# multiprobe demonstration a measurable recall floor (54% single-probe) and
# headroom (96% with 1-flip probes); it is NOT the scale config — see
# _BLOCK_BANDS above and tests/test_dedup_unit.py's recall comparison.
_RECALL_BANDS = [hyperplanes(dim=64, n_planes=4, seed=100 + b) for b in range(4)]


def embedding_blocked_pairs(
    e: DataFrame,
    bands: list[list[list[float]]],
    threshold: float,
    banded: DataFrame | None = None,
) -> DataFrame:
    """LSH-bucket-blocked embedding near-dup pairs, parameterized by band
    layout: each band's hyperplane list gives every vector one (band_idx,
    bucket) key; candidate pairs share a key (ONE equi-join on the banded
    table), then the exact normalized dot product verifies >= threshold.

    Scale rule (measured in tools/scale_probe.py): bucket BITS must grow
    with log(N). A band of k planes makes 2^k buckets, so random-pair
    collisions — and with them candidate volume — scale as N²·bands/2^k;
    holding k fixed while N grows 10x turns a linear plan quadratic. At
    production N use ~log2(N) planes per band and add bands to buy back
    recall."""
    from purldb_spark.operators.knn import banded_keys, normalize_expr

    if "u" in e.columns:  # pre-normalized session fixture
        unit = e.select("vec_id", "u")
    else:
        unit = e.select("vec_id", normalize_expr("embedding").alias("u"))
    if banded is None:
        banded = banded_keys(e, "vec_id", "embedding", bands)
    a = banded.alias("a")
    bb = banded.alias("b")
    cands = (
        a.join(
            bb,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
            "inner",
        )
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .dropDuplicates()
    )
    ua = unit.select(F.col("vec_id").alias("id_a"), F.col("u").alias("u_a"))
    ub = unit.select(F.col("vec_id").alias("id_b"), F.col("u").alias("u_b"))
    return (
        cands.join(ua, "id_a")
        .join(ub, "id_b")
        .withColumn("cosine", dot_expr("u_a", "u_b"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _bands_cte(bands: list[list[list[float]]]) -> str:
    return " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx,"
        f" {bucket_sql('embedding', planes, dialect='duckdb')} AS bucket"
        " FROM embeddings"
        for b, planes in enumerate(bands)
    )


@query(
    "dedup_embedding_blocked",
    oracle=f"""
    WITH unit AS (
      SELECT vec_id, {normalize_sql_duckdb("embedding")} AS u FROM embeddings
    ),
    bands AS (
      {_bands_cte(_BLOCK_BANDS)}
    ),
    cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.bucket = b.bucket
       AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b, {dot_sql_duckdb("ua.u", "ub.u")} AS cosine
    FROM cands c
    JOIN unit ua ON ua.vec_id = c.id_a
    JOIN unit ub ON ub.vec_id = c.id_b
    WHERE {dot_sql_duckdb("ua.u", "ub.u")} >= 0.4
    """,
)
def dedup_embedding_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for embedding near-dup pairs: LSH-bucket blocking at
    the CORPUS-SCALED band width (block_bands — 8 bands x max(8,
    floor(log2 N) - 4) hyperplanes, the coarse_k recipe applied to
    BENCH_scale.md finding 1; the former FIXED 4-bit layout went quadratic
    at 10x data and survives only as the labeled recall fixture
    _RECALL_BANDS), exact cosine verify >= 0.4. At every verification
    scale the formula returns the 8-plane layout the static oracle bakes;
    the sf1 probe runs 10-plane bands through this same code.

    vs dedup_embedding_cosine (the exact all-pairs ground truth): candidate
    generation is O(N · bucket occupancy) instead of O(N²), scores of
    emitted pairs are bit-identical, and recall is tuned by the band count
    exactly like MinHash-LSH. At 100 TB (band_idx, bucket) is the shuffle
    key — uniform by construction (random hyperplanes), no skew. The band
    keys come from the materialized session index (fixture_cache.
    emb_band_index — the production table the indexing pipeline writes)."""
    from purldb_spark.plans.fixture_cache import emb_band_index

    bands, key = block_bands(spark, sf_dir)
    return embedding_blocked_pairs(
        unit_embeddings(spark, sf_dir),
        bands,
        0.4,
        banded=emb_band_index(spark, sf_dir, key, bands),
    )


@query(
    "dedup_embedding_multiprobe",
    oracle=f"""
    WITH unit AS (
      SELECT vec_id, {normalize_sql_duckdb("embedding")} AS u FROM embeddings
    ),
    bands AS (
      {_bands_cte(_BLOCK_BANDS)}
    ),
    probes AS (
      SELECT vec_id, band_idx,
             CASE WHEN j = 0 THEN bucket
                  ELSE xor(bucket, (1 << (j - 1))) END AS bucket
      FROM bands, unnest(generate_series(0, {len(_BLOCK_BANDS[0])})) AS t(j)
    ),
    cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM probes a JOIN bands b
        ON a.band_idx = b.band_idx AND a.bucket = b.bucket
       AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b, {dot_sql_duckdb("ua.u", "ub.u")} AS cosine
    FROM cands c
    JOIN unit ua ON ua.vec_id = c.id_a
    JOIN unit ub ON ub.vec_id = c.id_b
    WHERE {dot_sql_duckdb("ua.u", "ub.u")} >= 0.4
    """,
)
def dedup_embedding_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe over the PRODUCTION corpus-scaled block index (since
    round 10; formerly over the 4-bit _RECALL_BANDS fixture, which remains
    the labeled recall-floor demonstration in tests/test_dedup_unit.py): the
    query side also probes every bucket one sign-flip away
    (operators/knn.py::multiprobe_expand), the index side keeps single
    keys. This is the production combination BENCH_scale.md finding 1
    calls for — bucket bits GROW with log N (block_bands) to keep
    candidate volume linear, and the recall those narrower buckets cost is
    bought back on the query side with probes, not index copies: on the
    4-bit fixture the same mechanism measured 54% -> 96% recall of the
    exact >= 0.4 pair set at sf0.1 with ZERO index growth.

    Both sides read the materialized band-key index (fixture_cache.
    emb_band_index, shared with dedup_embedding_blocked): the probe keys
    are the vector's OWN stored key plus its 1-bit flips — a pure bit
    expression over the index table, so no query-side hyperplane dot
    products (or their bands x planes x dim literal codegen, the bulk of
    this query's former wall time) at all. The probe fan-out is 1 + width
    keys per band — it scales with log N, not with N."""
    from purldb_spark.operators.knn import multiprobe_expand
    from purldb_spark.plans.fixture_cache import emb_band_index

    e = unit_embeddings(spark, sf_dir)
    unit = e.select("vec_id", "u")
    bands, key = block_bands(spark, sf_dir)
    idx = emb_band_index(spark, sf_dir, key, bands)
    a = multiprobe_expand(idx, "vec_id", len(bands[0])).alias("a")
    b = idx.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
            "inner",
        )
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .dropDuplicates()
    )
    ua = unit.select(F.col("vec_id").alias("id_a"), F.col("u").alias("u_a"))
    ub = unit.select(F.col("vec_id").alias("id_b"), F.col("u").alias("u_b"))
    return (
        cands.join(ua, "id_a")
        .join(ub, "id_b")
        .withColumn("cosine", dot_expr("u_a", "u_b"))
        .filter(F.col("cosine") >= 0.4)
        .select("id_a", "id_b", "cosine")
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH unit AS (
      SELECT vec_id, {normalize_sql_duckdb("embedding")} AS u FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {dot_sql_duckdb("a.u", "b.u")} AS cosine
    FROM unit a JOIN unit b ON a.vec_id < b.vec_id
    WHERE {dot_sql_duckdb("a.u", "b.u")} >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: exact all-pairs cosine ≥ 0.4 (the synthetic
    vectors are near-orthogonal, so 0.4 is the planted-similarity tail).

    Vectors are unit-normalized ONCE per session (fixture_cache.
    unit_embeddings), so the O(N²) pair stage is a bare dot product — 3x
    less flops and no per-pair norm recomputation; the oracle mirrors the
    same normalize-then-dot association so doubles stay bit-exact. Brute
    force is the correctness baseline; LSH bucketing (knn_lsh_bucketed) is
    the scale path.

    r16 (guide §3, VERDICT r15 item 1): the i < j pair triangle is an
    EXACT B x B block decomposition — blk = pmod(vec_id, B); a row serves
    as the a-side of cells (blk, q >= blk) and the b-side of cells
    (p <= blk, blk), so every unordered pair lands in EXACTLY ONE cell
    (its sorted block pair) and the join is an equi-join on the cell id:
    broadcast-hash at verification scale, shuffled at production scale,
    never a full-corpus BroadcastNestedLoopJoin (whose broadcast side is
    capped at 8 GB / 512M rows).  B is scale-adaptive
    (scale_params.pair_blocks): each block fits a task's build budget and
    the B(B+1)/2 cells cover the cluster.  Cross-block cells carry no id
    ordering (blocks are mod classes), so the output pair is re-oriented
    with least/greatest; the dot product is bit-symmetric (x*y == y*x
    per IEEE term, same fold order), so cosine is unchanged."""
    from purldb_spark.operators.scale_params import pair_blocks

    e = unit_embeddings(spark, sf_dir).select("vec_id", "u")
    nb = pair_blocks(spark, sf_dir)
    blk = F.pmod(F.col("vec_id"), F.lit(nb)).cast("int")
    a = (
        e.withColumn("_ba", blk)
        .withColumn("_bb", F.explode(F.sequence(F.col("_ba"), F.lit(nb - 1))))
        .select(
            "_ba", "_bb", F.col("vec_id").alias("ia"), F.col("u").alias("u_a")
        )
    )
    b = (
        e.withColumn("_bb", blk)
        .withColumn("_ba", F.explode(F.sequence(F.lit(0), F.col("_bb"))))
        .select(
            "_ba", "_bb", F.col("vec_id").alias("ib"), F.col("u").alias("u_b")
        )
    )
    pairs = a.join(b, ["_ba", "_bb"]).filter(
        (F.col("_ba") != F.col("_bb")) | (F.col("ia") < F.col("ib"))
    )
    return (
        pairs.withColumn("cosine", dot_expr("u_a", "u_b"))
        .filter(F.col("cosine") >= 0.4)
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "cosine",
        )
    )


# ---------------------------------------------------------------------------
# embed_recall_blocked — banding recall of the production layout (r10)
# ---------------------------------------------------------------------------

_ER_PROBE_J = len(_BLOCK_BANDS[0])


@query(
    "embed_recall_blocked",
    oracle=f"""
    WITH unit AS MATERIALIZED (
      SELECT vec_id, {normalize_sql_duckdb("embedding")} AS u FROM embeddings
    ),
    bands AS MATERIALIZED (
      {_bands_cte(_BLOCK_BANDS)}
    ),
    gt AS MATERIALIZED (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM unit a JOIN unit b ON a.vec_id < b.vec_id
      WHERE {dot_sql_duckdb("a.u", "b.u")} >= 0.4
    ),
    scands AS MATERIALIZED (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.bucket = b.bucket
       AND a.vec_id < b.vec_id
    ),
    probes AS (
      SELECT vec_id, band_idx,
             CASE WHEN j = 0 THEN bucket
                  ELSE xor(bucket, (1 << (j - 1))) END AS bucket
      FROM bands, unnest(generate_series(0, {_ER_PROBE_J})) AS t(j)
    ),
    mcands AS MATERIALIZED (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM probes a JOIN bands b
        ON a.band_idx = b.band_idx AND a.bucket = b.bucket
       AND a.vec_id < b.vec_id
    ),
    spairs AS (
      SELECT c.id_a, c.id_b FROM scands c
      JOIN unit ua ON ua.vec_id = c.id_a
      JOIN unit ub ON ub.vec_id = c.id_b
      WHERE {dot_sql_duckdb("ua.u", "ub.u")} >= 0.4
    ),
    mpairs AS (
      SELECT c.id_a, c.id_b FROM mcands c
      JOIN unit ua ON ua.vec_id = c.id_a
      JOIN unit ub ON ub.vec_id = c.id_b
      WHERE {dot_sql_duckdb("ua.u", "ub.u")} >= 0.4
    ),
    marked AS (
      SELECT 'blocked_single_probe' AS method,
             CASE WHEN s.id_a IS NULL THEN 0 ELSE 1 END AS hit
      FROM gt g LEFT JOIN spairs s ON s.id_a = g.id_a AND s.id_b = g.id_b
      UNION ALL
      SELECT 'blocked_multiprobe' AS method,
             CASE WHEN m.id_a IS NULL THEN 0 ELSE 1 END AS hit
      FROM gt g LEFT JOIN mpairs m ON m.id_a = g.id_a AND m.id_b = g.id_b
    ),
    cstats AS (
      SELECT 'blocked_single_probe' AS method,
             CAST(count(*) AS BIGINT) AS n_candidates FROM scands
      UNION ALL
      SELECT 'blocked_multiprobe' AS method,
             CAST(count(*) AS BIGINT) FROM mcands
    ),
    magg AS (
      SELECT method, CAST(COALESCE(sum(hit), 0) AS BIGINT) AS hits,
             CAST(count(*) AS BIGINT) AS possible
      FROM marked GROUP BY method
    )
    -- output cardinality is driven by cstats (always 2 rows), LEFT JOINed
    -- to the marked aggregates: on a degenerate corpus with no GT pairs
    -- `marked` is empty and a gt-driven GROUP BY would emit 0 rows while
    -- the Spark side's global aggs always emit one row per method
    SELECT c.method, c.n_candidates,
           CAST(COALESCE(m.hits, 0) AS BIGINT) AS hits,
           CAST(COALESCE(m.possible, 0) AS BIGINT) AS possible,
           CAST(COALESCE(m.hits, 0) * 1000000
                // (SELECT greatest(count(*), 1) FROM gt) AS BIGINT)
             AS recall_e6,
           CAST(COALESCE(m.hits, 0) * 1000000
                // greatest(c.n_candidates, 1) AS BIGINT)
             AS cand_precision_e6
    FROM cstats c LEFT JOIN magg m ON m.method = c.method
    """,
)
def embed_recall_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding recall of the PRODUCTION embedding layout — the hyperplane
    twin of dedup_recall_eval, and the published number behind the
    finding-1 trade: one row each for single-probe blocking and query-side
    multiprobe (both over the corpus-scaled block index, widths per
    block_bands), marked against the exact all-pairs cosine >= 0.4 ground
    truth (dedup_embedding_cosine's semantics — verified pairs are a true
    subset, so recall isolates pure bucket-split loss) plus candidate
    efficiency (what fraction of candidates survive the exact verify —
    what the verify stage costs per emitted pair).

    This is the dashboard a production near-dup run reads when the width
    formula (lsh_band_plan) picks a wider layout: how much recall the
    narrower buckets cost and how much of it multiprobe buys back at zero
    index growth.

    Scale shape: approx sides are the production banded equi-joins off
    the materialized band index; the GT side is the labeled all-pairs
    baseline (quadratic by construction, sampled in production recall
    monitoring). Counts and ratios on the e6 BIGINT grid; division
    guards keep the empty corpus at zeros."""
    from purldb_spark.operators.knn import multiprobe_expand
    from purldb_spark.plans.fixture_cache import emb_band_index

    bands, key = block_bands(spark, sf_dir)
    idx = emb_band_index(spark, sf_dir, key, bands)
    unit = unit_embeddings(spark, sf_dir).select("vec_id", "u")

    def cand_pairs(a_keys: DataFrame) -> DataFrame:
        a, b = a_keys.alias("a"), idx.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
            )
            .dropDuplicates()
        )

    def verified(cands: DataFrame) -> DataFrame:
        ua = unit.select(F.col("vec_id").alias("id_a"), F.col("u").alias("u_a"))
        ub = unit.select(F.col("vec_id").alias("id_b"), F.col("u").alias("u_b"))
        return (
            cands.join(ua, "id_a")
            .join(ub, "id_b")
            .filter(dot_expr("u_a", "u_b") >= 0.4)
            .select("id_a", "id_b")
        )

    # r15: materialize the three shared pair sets ONCE (guide §5 caching
    # note).  gt is the all-pairs baseline — the most expensive subtree in
    # the query — and was previously re-executed three times (n_gt count +
    # once per method's marked join); each cands set ran twice (count +
    # marked join).  localCheckpoint holds only the pair ids (KBs).
    gt = (
        dedup_embedding_cosine(spark, sf_dir)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_gt = gt.count()  # driver scalar (documented BNLJ avoidance)
    scands = cand_pairs(idx).localCheckpoint(eager=True)
    mcands = cand_pairs(
        multiprobe_expand(idx, "vec_id", len(bands[0]))
    ).localCheckpoint(eager=True)

    def row(method: str, cands: DataFrame) -> DataFrame:
        n_c = cands.count()  # driver scalar
        marked = gt.join(
            verified(cands).withColumn("hit", F.lit(1)),
            ["id_a", "id_b"],
            "left",
        ).select(F.coalesce(F.col("hit"), F.lit(0)).alias("hit"))
        return (
            marked.agg(
                F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("hits"),
                F.count(F.lit(1)).cast("long").alias("possible"),
            )
            .withColumn("method", F.lit(method))
            .withColumn("n_candidates", F.lit(n_c).cast("long"))
            .withColumn(
                "recall_e6",
                F.expr(f"hits * 1000000L div {max(n_gt, 1)}L").cast("long"),
            )
            .withColumn(
                "cand_precision_e6",
                F.expr(f"hits * 1000000L div {max(n_c, 1)}L").cast("long"),
            )
            .select(
                "method",
                "n_candidates",
                "hits",
                "possible",
                "recall_e6",
                "cand_precision_e6",
            )
        )

    return row("blocked_single_probe", scands).unionByName(
        row("blocked_multiprobe", mcands)
    )


# ---------------------------------------------------------------------------
# lsh_band_plan — the corpus-scaled width decision as a queryable dashboard
# ---------------------------------------------------------------------------

from purldb_spark.operators.scale_params import PLANES_SLACK  # noqa: E402

# floor(log2 n) = bit_length - 1; bin() (unpadded binary string) exists in
# BOTH engines, so the width formula is float-free and engine-identical
_PLANES_EXPR = f"greatest({MIN_PLANES}, length(bin(n)) - 1 - {PLANES_SLACK})"


@query(
    "lsh_band_plan",
    oracle=f"""
    WITH s AS (
      SELECT 'embeddings' AS table_name, CAST(count(*) AS BIGINT) AS n
      FROM embeddings
      UNION ALL
      SELECT 'documents' AS table_name, CAST(count(*) AS BIGINT) AS n
      FROM documents
    )
    SELECT table_name, n,
           CAST({_N_BANDS} AS BIGINT) AS n_bands,
           CAST({_PLANES_EXPR} AS BIGINT) AS n_planes,
           CAST((CAST(1 AS BIGINT) << ({_PLANES_EXPR})) AS BIGINT)
             AS buckets_per_band,
           CAST(n * 1000000 // (CAST(1 AS BIGINT) << ({_PLANES_EXPR}))
             AS BIGINT) AS occupancy_e6,
           CAST(n * n // (CAST(1 AS BIGINT) << ({_PLANES_EXPR}))
             AS BIGINT) AS rand_collisions_per_band
    FROM s
    """,
)
def lsh_band_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-layout planning dashboard: for each blockable table, the
    corpus-scaled LSH width the engine will use (operators/scale_params.
    lsh_n_planes = max({MIN_PLANES}, floor(log2 N) - {PLANES_SLACK}),
    computed here as the identical float-free bit-length expression IN the
    plan, so the decision is auditable as data) plus its consequences:
    buckets per band, expected bucket occupancy (N/2^planes, e6-scaled),
    and the random-collision candidate volume per band (N^2/2^planes —
    the quantity BENCH_scale.md finding 1 proves must stay linear in N).

    This is the OPTIMIZE-decision companion to layout_zorder_skipping's
    pruning dashboard: before (re)building a band index at a new corpus
    size, one bounded-agg query shows whether the stored layout's width
    still matches the formula (stale index detection). Scale shape: two
    count(*) aggs, two result rows, zero data movement beyond partial
    counts."""
    from purldb_spark.catalog.tables import load

    def one(t: str) -> DataFrame:
        return (
            load(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select(F.lit(t).alias("table_name"), "n")
        )

    s = one("embeddings").unionByName(one("documents"))
    shl = f"shiftleft(cast(1 as bigint), {_PLANES_EXPR})"
    return s.select(
        "table_name",
        "n",
        F.lit(_N_BANDS).cast("long").alias("n_bands"),
        F.expr(f"cast({_PLANES_EXPR} as bigint)").alias("n_planes"),
        F.expr(f"cast({shl} as bigint)").alias("buckets_per_band"),
        F.expr(f"cast(n * 1000000 div {shl} as bigint)").alias(
            "occupancy_e6"
        ),
        F.expr(f"cast(n * n div {shl} as bigint)").alias(
            "rand_collisions_per_band"
        ),
    )


# ---------------------------------------------------------------------------
# embed_random_projection
# ---------------------------------------------------------------------------

_JL_DIM = 64   # input embedding dimensionality
_JL_OUT = 16   # projected dimensionality (4x compression)


def _jl_sign(r: int, c: int) -> int:
    """Deterministic Rademacher sign for matrix cell (r, c): +-1 from the
    shared md5 convention, identical in the Spark expr, the DuckDB oracle
    and this Python plan-build step (the matrix is baked into both plans
    as literal +/- terms, so there is nothing to keep in sync at run time)."""
    import hashlib

    h = hashlib.md5(f"jl|{r}|{c}".encode()).hexdigest()[:8]
    return 1 if int(h, 16) % 2 == 0 else -1


_JL_SIGNS = [[_jl_sign(r, c) for r in range(_JL_DIM)] for c in range(_JL_OUT)]


def _jl_terms(c: int, fmt: str) -> str:
    """Signed sum of the 64 snapped input elements for output dim c."""
    return " + ".join(
        (fmt.format(r=r) if _JL_SIGNS[c][r] > 0 else f"(- {fmt.format(r=r)})")
        for r in range(_JL_DIM)
    )


_JL_ORACLE = (
    "WITH s AS (SELECT vec_id, "
    + ", ".join(
        f"CAST(floor(1000000.0 * CAST(embedding[{r + 1}] AS DOUBLE))"
        f" AS BIGINT) AS e{r}"
        for r in range(_JL_DIM)
    )
    + " FROM embeddings), p AS (SELECT vec_id, "
    + ", ".join(f"({_jl_terms(c, 'e{r}')}) AS y{c}" for c in range(_JL_OUT))
    + " FROM s) SELECT vec_id, "
    + ", ".join(f"y{c}" for c in range(_JL_OUT))
    + ", ("
    + " + ".join(f"y{c} * y{c}" for c in range(_JL_OUT))
    + ") AS norm_sq FROM p"
)


@query("embed_random_projection", oracle=_JL_ORACLE)
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection, the standard dimensionality
    reduction in front of an ANN index: project the 64-d embeddings to 16-d
    with a deterministic Rademacher (+-1) sign matrix (Achlioptas 2001,
    "Database-friendly random projections" — sign matrices satisfy the JL
    lemma with the same distortion bound as Gaussians and need no floating
    multiplies, each output is a signed sum). Inputs are snapped to the
    repo's 1e-6 integer grid first, so every output coordinate and the
    projected squared norm are exact BIGINT arithmetic — bit-identical in
    both engines by construction rather than by libm luck.

    Scale shape: map-only, zero shuffle, 64 adds per output dim per row —
    at 100 TB this is the cheap pre-step that shrinks every downstream
    LSH/IVF/PQ structure 4x (bucket keys, centroid tables, ADC codes all
    operate on the 16-d output; distances are preserved within the JL
    distortion for the pair thresholds the near-dup family uses).

    The Spark side folds each output dim with zip_with/aggregate over a
    literal sign array instead of a 64-term flat sum: the flat-sum form
    blew the janino 64KB method limit and silently fell back to
    interpreted eval (whole-stage codegen OFF for the whole stage); the
    higher-order form keeps the expression tree ~16 small nodes and the
    stage inside codegen. The DuckDB oracle keeps the unrolled literal
    sums — its vectorized engine has no codegen cliff."""
    from purldb_spark.catalog.tables import load

    e = load(spark, sf_dir, "embeddings")
    snapped = e.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> cast(floor(1000000.0 * cast(x as double)) as bigint))"
        ).alias("es"),
    )
    proj = snapped.select(
        "vec_id",
        *[
            F.expr(
                "aggregate(zip_with(es, array("
                + ", ".join(f"{s}L" for s in _JL_SIGNS[c])
                + "), (x, s) -> x * s), 0L, (acc, v) -> acc + v)"
            ).alias(f"y{c}")
            for c in range(_JL_OUT)
        ],
    )
    return proj.select(
        "vec_id",
        *[f"y{c}" for c in range(_JL_OUT)],
        F.expr(" + ".join(f"y{c} * y{c}" for c in range(_JL_OUT))).alias("norm_sq"),
    )


# ---------------------------------------------------------------------------
# embed_projected_blocked
# ---------------------------------------------------------------------------

_PROJ_N_BANDS = 2   # the 16 JL outputs double as 2 bands x 8 sign bits
_PROJ_BITS = 8


def _proj_bucket_terms(b: int, fmt: str) -> str:
    """8-bit sign bucket for band b: bit i set iff y_{8b+i} > 0."""
    return " + ".join(
        f"(CASE WHEN {fmt.format(c=_PROJ_BITS * b + i)} > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(_PROJ_BITS)
    )


_PROJ_ORACLE = (
    "WITH s AS (SELECT vec_id, "
    + ", ".join(
        f"CAST(floor(1000000.0 * CAST(embedding[{r + 1}] AS DOUBLE))"
        f" AS BIGINT) AS e{r}"
        for r in range(_JL_DIM)
    )
    + " FROM embeddings), p AS (SELECT vec_id, "
    + ", ".join(f"({_jl_terms(c, 'e{r}')}) AS y{c}" for c in range(_JL_OUT))
    + " FROM s), banded AS ("
    + " UNION ALL ".join(
        f"SELECT vec_id, CAST({b} AS BIGINT) AS band_idx,"
        f" CAST({_proj_bucket_terms(b, 'y{c}')} AS BIGINT) AS bucket FROM p"
        for b in range(_PROJ_N_BANDS)
    )
    + """),
    cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.bucket = b.bucket
       AND a.vec_id < b.vec_id
    ),
    unit AS (
      SELECT vec_id, """
    + normalize_sql_duckdb("embedding")
    + """ AS u FROM embeddings
    )
    SELECT c.id_a, c.id_b, """
    + dot_sql_duckdb("ua.u", "ub.u")
    + """ AS cosine
    FROM cands c
    JOIN unit ua ON ua.vec_id = c.id_a
    JOIN unit ub ON ub.vec_id = c.id_b
    WHERE """
    + dot_sql_duckdb("ua.u", "ub.u")
    + " >= 0.4"
)


@query("embed_projected_blocked", oracle=_PROJ_ORACLE)
def embed_projected_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup blocking IN THE PROJECTED SPACE — the composition that
    makes embed_random_projection a working index stage rather than a
    standalone transform: a Rademacher JL projection is itself a
    hyperplane LSH (each output coordinate's sign is a random-hyperplane
    side bit), so the SAME 16 signed sums serve as both the 4x-compressed
    vectors and the blocking keys — {_PROJ_N_BANDS} bands x {_PROJ_BITS}
    sign bits, zero extra hash work. Candidates share a (band, bucket)
    key; the exact cosine on the ORIGINAL 64-d unit vectors verifies
    >= 0.4, so emitted pairs score bit-identically to
    dedup_embedding_cosine (the all-pairs ground truth) and
    dedup_embedding_blocked (the dedicated-hyperplane config this
    composition trades a little recall against for free keys).

    Scale shape: identical to dedup_embedding_blocked — one banded
    equi-join, bucket bits sized ~log2(N) (8 bits here, BENCH_scale.md
    finding 1), uniform keys by construction. The projection itself is
    map-only; at 100 TB the 16-d output is ALSO what IVF/PQ would
    quantize, so one scan feeds compression and blocking together."""
    from purldb_spark.catalog.tables import load

    e = load(spark, sf_dir, "embeddings")
    snapped = e.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> cast(floor(1000000.0 * cast(x as double)) as bigint))"
        ).alias("es"),
    )
    proj = snapped.select(
        "vec_id",
        *[
            F.expr(
                "aggregate(zip_with(es, array("
                + ", ".join(f"{s}L" for s in _JL_SIGNS[c])
                + "), (x, s) -> x * s), 0L, (acc, v) -> acc + v)"
            ).alias(f"y{c}")
            for c in range(_JL_OUT)
        ],
    )
    stack_args = ", ".join(
        f"{b}L, cast({_proj_bucket_terms(b, 'y{c}')} as bigint)"
        for b in range(_PROJ_N_BANDS)
    )
    banded = proj.select(
        "vec_id",
        F.expr(
            f"stack({_PROJ_N_BANDS}, {stack_args}) as (band_idx, bucket)"
        ),
    )
    a = banded.select(
        F.col("vec_id").alias("id_a"), "band_idx", "bucket"
    )
    b = banded.select(
        F.col("vec_id").alias("id_b"), "band_idx", "bucket"
    )
    cands = (
        a.join(b, ["band_idx", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    u = unit_embeddings(spark, sf_dir).select("vec_id", "u")
    return (
        cands.join(
            u.select(F.col("vec_id").alias("id_a"), F.col("u").alias("u_a")),
            "id_a",
        )
        .join(
            u.select(F.col("vec_id").alias("id_b"), F.col("u").alias("u_b")),
            "id_b",
        )
        .withColumn("cosine", dot_expr("u_a", "u_b"))
        .filter(F.col("cosine") >= 0.4)
        .select("id_a", "id_b", "cosine")
    )
