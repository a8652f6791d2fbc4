"""Training-data-pipeline queries, ANN top-k search family (split from the
former q_llm.py so one edit no longer invalidates the whole LLM-ops
inventory's verification hashes at once).

Coverage:
  brute force    -> knn_bruteforce  (exact top-k ground truth, labeled O(N²))
  LSH buckets    -> knn_lsh_bucketed
  IVF cells      -> knn_ivf_cell
  IVF nprobe=2   -> knn_ivf_nprobe2 (the recall knob)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.operators.ivf import (
    cell_expr,
    cell_sql,
    top2_cells_expr,
    top2_cells_sql,
)
from purldb_spark.operators.knn import (
    brute_force_topk,
    bucket_expr,
    bucket_sql,
    cosine_expr,
    cosine_sql_duckdb,
    hyperplanes,
)
from purldb_spark.plans.registry import query


@query(
    "knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_vec_id, embedding AS q_embedding
               FROM embeddings WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.q_vec_id, i.vec_id,
             {cosine_sql_duckdb("q.q_embedding", "i.embedding")} AS cosine,
             row_number() OVER (
               PARTITION BY q.q_vec_id
               ORDER BY {cosine_sql_duckdb("q.q_embedding", "i.embedding")} DESC,
                        i.vec_id
             ) AS rank
      FROM q JOIN embeddings i ON q.q_vec_id <> i.vec_id
    )
    SELECT q_vec_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= 5
    """,
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN baseline: exact top-5 cosine neighbors for each query vector
    (vec_id % 50 == 0) via the blocked-grid equi-join (r16, guide §3 —
    no full-corpus BroadcastNestedLoopJoin) + higher-order-function dot
    products, all JVM-side; the window keeps 5 per query with an id
    tie-break.  Query blocks are sized so one block fits a task's build
    budget (~N/50 anchors at EMBEDDING_ROW_BYTES each)."""
    from purldb_spark.operators.scale_params import corpus_count, side_blocks

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    qb = side_blocks(corpus_count(spark, sf_dir, "embeddings") // 50)
    out = brute_force_topk(q, e, k=5, n_query_blocks=qb)
    return out.withColumn("rank", F.col("rank").cast("long"))


# the ORACLE-width signature layout; the registry query sizes the width
# from the corpus (below) and this constant — returned whenever the
# formula floors at MIN_PLANES, i.e. at every verification scale — is
# what the static oracle bakes
_PLANES = hyperplanes(dim=64, n_planes=8, seed=42)


def _scaled_planes(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """Corpus-scaled signature width (operators/scale_params — r10, the
    same recipe as q_embed.block_bands): fixed seed makes the narrower
    layout a prefix of the wider one, so at every oracle scale this IS
    _PLANES and the static SQL stays bit-valid; the sf1 probe runs 10
    planes (1024 buckets) through this same code."""
    from purldb_spark.operators.scale_params import lsh_planes_for

    w = lsh_planes_for(spark, sf_dir)
    return _PLANES if w == 8 else hyperplanes(dim=64, n_planes=w, seed=42)


@query(
    "knn_lsh_bucketed",
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding,
             {bucket_sql("embedding", _PLANES, dialect="duckdb")} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_vec_id, embedding AS q_embedding, bucket
          FROM bucketed WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.q_vec_id, i.vec_id,
             {cosine_sql_duckdb("q.q_embedding", "i.embedding")} AS cosine,
             row_number() OVER (
               PARTITION BY q.q_vec_id
               ORDER BY {cosine_sql_duckdb("q.q_embedding", "i.embedding")} DESC,
                        i.vec_id
             ) AS rank
      FROM q JOIN bucketed i ON q.bucket = i.bucket AND q.q_vec_id <> i.vec_id
    )
    SELECT q_vec_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= 5
    """,
)
def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: deterministic hyperplanes -> per-vector signature,
    neighbors searched only within the query's bucket (equi-join on the
    bucket key instead of a crossJoin). Signature width is CORPUS-SCALED
    since r10 (_scaled_planes — max(8, floor(log2 N) - 4) bits, so bucket
    occupancy and with it per-query probe work stay flat in N; 8 bits at
    every verification scale, where the static oracle is bit-valid).
    Recall < 1 by construction; raise it with multiple independent bands
    (dedup_embedding_blocked) or query-side multiprobe
    (dedup_embedding_multiprobe) — neither grows this index. At 100 TB
    the bucket is the partition key."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "bucket", bucket_expr("embedding", _scaled_planes(spark, sf_dir))
    )
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("bucket").alias("q_bucket"),
    )
    joined = q.join(
        e, (F.col("q_bucket") == F.col("bucket")) & (F.col("q_vec_id") != F.col("vec_id"))
    )
    scored = joined.withColumn("cosine", cosine_expr("q_embedding", "embedding"))
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("q_vec_id", "vec_id", "cosine", "rank")
    )


@query(
    "knn_ivf_cell",
    oracle=f"""
    WITH cells AS (
      SELECT vec_id, embedding, {cell_sql("embedding")} AS ivf_cell
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_vec_id, embedding AS q_embedding, ivf_cell
          FROM cells WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.q_vec_id, i.vec_id,
             {cosine_sql_duckdb("q.q_embedding", "i.embedding")} AS cosine,
             row_number() OVER (
               PARTITION BY q.q_vec_id
               ORDER BY {cosine_sql_duckdb("q.q_embedding", "i.embedding")} DESC,
                        i.vec_id
             ) AS rank
      FROM q JOIN cells i ON q.ivf_cell = i.ivf_cell AND q.q_vec_id <> i.vec_id
    )
    SELECT q_vec_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= 3
    """,
)
def knn_ivf_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path #2 — IVF partitioning (operators/ivf.py): 8 frozen
    centroids split the space into cells; each query searches only its own
    cell's inverted list (top-3 by cosine). Complements knn_lsh_bucketed;
    at 100 TB `ivf_cell` is the partition key and nprobe>1 raises recall by
    probing adjacent cells."""
    # embedding IS NOT NULL before cell assignment: keeps cell_expr's
    # non-nullable -1 arm unreachable (operators/ivf.py ingest invariant)
    e = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .withColumn("ivf_cell", cell_expr("embedding"))
    )
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("ivf_cell").alias("q_cell"),
    )
    joined = q.join(
        e,
        (F.col("q_cell") == F.col("ivf_cell")) & (F.col("q_vec_id") != F.col("vec_id")),
    )
    scored = joined.withColumn("cosine", cosine_expr("q_embedding", "embedding"))
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("q_vec_id", "vec_id", "cosine", "rank")
    )


@query(
    "knn_ivf_nprobe2",
    oracle=f"""
    WITH cells AS (
      SELECT vec_id, embedding, {cell_sql("embedding")} AS ivf_cell
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_vec_id, embedding AS q_embedding,
                 {top2_cells_sql("embedding")} AS probe_cells
          FROM embeddings WHERE vec_id % 50 = 0),
    probes AS (
      SELECT q_vec_id, q_embedding, unnest(probe_cells) AS probe_cell FROM q
    ),
    scored AS (
      SELECT p.q_vec_id, i.vec_id,
             {cosine_sql_duckdb("p.q_embedding", "i.embedding")} AS cosine,
             row_number() OVER (
               PARTITION BY p.q_vec_id
               ORDER BY {cosine_sql_duckdb("p.q_embedding", "i.embedding")} DESC,
                        i.vec_id
             ) AS rank
      FROM probes p
      JOIN cells i ON p.probe_cell = i.ivf_cell AND p.q_vec_id <> i.vec_id
    )
    SELECT q_vec_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= 3
    """,
)
def knn_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2 (operators/ivf.py::top2_cells_expr): each query
    searches its own cell AND the runner-up centroid's cell, recovering the
    neighbors knn_ivf_cell loses across cell boundaries — the standard IVF
    recall knob, costing one extra inverted-list read per query while index
    layout, partitioning, and storage stay identical. Measured vs exact
    top-3 at sf0.1: recall@3 0.28 (nprobe=1) -> 0.48 (nprobe=2); the low
    absolute numbers are a property of near-random 64-dim vectors split 8
    ways, the doubling is the operator's point."""
    # embedding IS NOT NULL before cell assignment: keeps cell_expr's
    # non-nullable -1 arm unreachable (operators/ivf.py ingest invariant)
    e = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .withColumn("ivf_cell", cell_expr("embedding"))
    )
    q = (
        e.filter(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("q_vec_id"),
            F.col("embedding").alias("q_embedding"),
            # explode_outer: row-identical (top2_cells_expr always yields 1-2
            # cells) but InferFiltersFromGenerate skips outer generates, so the
            # size>0/isnotnull filter cannot re-inline the centroid-dot
            # expression below the projection (r15, see x_cran_html_map)
            F.explode_outer(top2_cells_expr("embedding")).alias("probe_cell"),
        )
    )
    joined = q.join(
        e,
        (F.col("probe_cell") == F.col("ivf_cell"))
        & (F.col("q_vec_id") != F.col("vec_id")),
    )
    scored = joined.withColumn(
        "cosine", cosine_expr("q_embedding", "embedding")
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("q_vec_id", "vec_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# knn_recall_eval
# ---------------------------------------------------------------------------


@query(
    "knn_recall_eval",
    oracle=f"""
    WITH cells AS (
      SELECT vec_id, embedding, {cell_sql("embedding")} AS ivf_cell
      FROM embeddings
    ),
    qv AS (SELECT vec_id AS q_vec_id, embedding AS q_embedding, ivf_cell,
                  {top2_cells_sql("embedding")} AS probe_cells
           FROM cells WHERE vec_id % 50 = 0),
    gt AS (
      SELECT q_vec_id, vec_id FROM (
        SELECT q.q_vec_id, i.vec_id,
               row_number() OVER (
                 PARTITION BY q.q_vec_id
                 ORDER BY {cosine_sql_duckdb("q.q_embedding", "i.embedding")} DESC,
                          i.vec_id
               ) AS rank
        FROM qv q JOIN embeddings i ON q.q_vec_id <> i.vec_id
      ) WHERE rank <= 3
    ),
    a1 AS (
      SELECT q_vec_id, vec_id FROM (
        SELECT q.q_vec_id, i.vec_id,
               row_number() OVER (
                 PARTITION BY q.q_vec_id
                 ORDER BY {cosine_sql_duckdb("q.q_embedding", "i.embedding")} DESC,
                          i.vec_id
               ) AS rank
        FROM qv q JOIN cells i
          ON q.ivf_cell = i.ivf_cell AND q.q_vec_id <> i.vec_id
      ) WHERE rank <= 3
    ),
    a2 AS (
      SELECT q_vec_id, vec_id FROM (
        SELECT p.q_vec_id, i.vec_id,
               row_number() OVER (
                 PARTITION BY p.q_vec_id
                 ORDER BY {cosine_sql_duckdb("p.q_embedding", "i.embedding")} DESC,
                          i.vec_id
               ) AS rank
        FROM (SELECT q_vec_id, q_embedding, unnest(probe_cells) AS probe_cell
              FROM qv) p
        JOIN cells i ON p.probe_cell = i.ivf_cell AND p.q_vec_id <> i.vec_id
      ) WHERE rank <= 3
    ),
    tall AS (
      SELECT 'ivf_nprobe1' AS method, q_vec_id, vec_id FROM a1
      UNION ALL
      SELECT 'ivf_nprobe2' AS method, q_vec_id, vec_id FROM a2
    ),
    marked AS (
      SELECT t.method,
             CASE WHEN g.vec_id IS NULL THEN 0 ELSE 1 END AS in_gt
      FROM tall t LEFT JOIN gt g
        ON t.q_vec_id = g.q_vec_id AND t.vec_id = g.vec_id
    )
    SELECT method,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(in_gt) AS BIGINT) AS hits,
           CAST((SELECT count(*) FROM gt) AS BIGINT) AS possible,
           CAST(sum(in_gt) * 1000000
                // (SELECT greatest(count(*), 1) FROM gt) AS BIGINT)
             AS recall_e6
    FROM marked GROUP BY method
    """,
)
def knn_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation as a first-class query: recall@3 of the two
    IVF configurations against the exact top-3 ground truth, per method —
    the eval row every ANN indexing pipeline publishes next to its index
    build (FAISS's standard recall@k harness, expressed relationally).

    One frame computes ground truth (the labeled-quadratic exact scan over
    the anchor set only — |anchors| x N, not N²), both approximate methods
    re-derive their candidate joins, everything unions into a tall
    (method, pair) frame marked by a left join against the ground-truth
    pairs, and one groupBy(method) yields hits / n_pairs / recall.
    ``possible`` (= count of ground-truth pairs) is collected driver-side
    as a scalar — the documented BNLJ-avoidance pattern (never crossJoin a
    1-row aggregate) — while the oracle uses a scalar subquery for the
    same number.

    Scale shape: the GT scan is anchors x corpus with the anchor side
    broadcast (brute_force_topk's layout) — at 100 TB you hold the anchor
    set at a few thousand sampled queries, which is exactly how production
    recall monitoring samples; the approximate sides stay cell-bounded
    equi-joins. Recall integers ride the e6 grid, so the whole report is
    BIGINT-exact."""
    from purldb_spark.operators.scale_params import corpus_count, side_blocks

    # r15: materialize (vec_id, embedding, ivf_cell) once — the frozen-
    # centroid argmax (8 centroids x 64-dim interpreted dots per row) was
    # re-executed by each of the three subtrees referencing e (q, a1's
    # index side, a2's index side); the table is corpus-small (the index
    # row set, KB-scale here, the stored cell column in production)
    # not-null before cell assignment (operators/ivf.py ingest invariant)
    e = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .withColumn("ivf_cell", cell_expr("embedding"))
        .localCheckpoint(eager=True)
    )
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("ivf_cell").alias("q_cell"),
    )
    gt = (
        brute_force_topk(
            q.select("q_vec_id", "q_embedding"),
            e,
            k=3,
            n_query_blocks=side_blocks(
                corpus_count(spark, sf_dir, "embeddings") // 50
            ),
        )
        .select("q_vec_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    # ``possible`` must be the ACTUAL ground-truth row count, not
    # 3 x anchors: an anchor with fewer than 3 eligible neighbors (tiny or
    # sparse corpus) yields fewer gt rows, and the oracle's
    # (SELECT count(*) FROM gt) already counts that way.  Driver-side
    # scalar off the checkpointed gt (documented BNLJ avoidance).
    possible = gt.count()

    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), F.asc("vec_id"))

    a1 = (
        q.join(
            e,
            (F.col("q_cell") == F.col("ivf_cell"))
            & (F.col("q_vec_id") != F.col("vec_id")),
        )
        .withColumn("cosine", cosine_expr("q_embedding", "embedding"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_vec_id", "vec_id")
    )
    probes = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
        # explode_outer: row-identical (top2_cells_expr always yields 1-2
            # cells) but InferFiltersFromGenerate skips outer generates, so the
            # size>0/isnotnull filter cannot re-inline the centroid-dot
            # expression below the projection (r15, see x_cran_html_map)
            F.explode_outer(top2_cells_expr("embedding")).alias("probe_cell"),
    )
    a2 = (
        probes.join(
            e,
            (F.col("probe_cell") == F.col("ivf_cell"))
            & (F.col("q_vec_id") != F.col("vec_id")),
        )
        .withColumn("cosine", cosine_expr("q_embedding", "embedding"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_vec_id", "vec_id")
    )
    tall = a1.withColumn("method", F.lit("ivf_nprobe1")).unionByName(
        a2.withColumn("method", F.lit("ivf_nprobe2"))
    )
    marked = tall.join(
        gt.withColumn("in_gt", F.lit(1)), ["q_vec_id", "vec_id"], "left"
    ).select("method", F.coalesce(F.col("in_gt"), F.lit(0)).alias("in_gt"))
    return (
        marked.groupBy("method")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("in_gt").cast("long").alias("hits"),
        )
        .withColumn("possible", F.lit(possible).cast("long"))
        .withColumn(
            "recall_e6",
            F.expr(f"hits * 1000000L div {max(possible, 1)}L").cast("long"),
        )
    )
