"""kmeans_minibatch_merge — the mini-batch k-means shard-merge proof as
a first-class query (the trainer-family twin of nb_merge_shards, and
the batch face of the 18th streaming face, streaming/kmeans_stream.py).

Under FROZEN trained centroids, Lloyd's mean update needs only the
per-cell sufficient statistics (n, sum per dim). With coordinates on
the e6 fixed-point grid (x_e6 = floor(v * 1e6) — the integer-inference
discipline of the NB e6 gate), those sums are a commutative monoid
under +: per-SHARD statistics (what a daily ingest or a micro-batch
persists) SUM-merge into EXACTLY the single-pass statistics, without
re-reading any vector. This query computes both sides over a vec_id % 4
sharding and emits merge_exact per (cluster, dim) cell plus the
refreshed centroid coordinate the merged ledger implies (one exact
double division — sum/n — identical in both engines).

The oracle replays the ENTIRE chain relationally: the unrolled-Lloyd
CTE stack (operators/kmeans.kmeans_cells_ctes — the same replay that
verifies kmeans_train) reproduces the trained assignment from raw
embeddings, then the shard/merge/direct arithmetic re-derives both
sides, so neither the shared cell-index fixture nor the quantization
can mask a bug.

At 100 TB: the statistics are one posexplode + one combine-bounded agg
(at most k x dim x partitions rows shuffle); the merge is a k x dim-row
aggregation regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.operators.kmeans import kmeans_cells_ctes
from purldb_spark.plans.fixture_cache import kmeans_cell_index
from purldb_spark.plans.q_cluster import _DIM, _ITERS, _K, coarse_k
from purldb_spark.plans.registry import query

_ORACLE = f"""
WITH {kmeans_cells_ctes("embeddings", "embedding", "vec_id", _K, _ITERS, _DIM)},
ex AS MATERIALIZED (
  SELECT a.vid, a.cluster, t.i AS pos,
         CAST(floor(CAST(e.embedding[CAST(t.i AS INT) + 1] AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS x_e6
  FROM asgF a
  JOIN embeddings e ON e.vec_id = a.vid,
       range({_DIM}) t(i)
),
ss AS (
  SELECT vid % 4 AS shard, cluster, pos,
         sum(x_e6) AS s, count(*) AS n
  FROM ex GROUP BY 1, 2, 3
),
merged AS (
  SELECT cluster, pos,
         CAST(sum(s) AS BIGINT) AS merged_sum_e6,
         CAST(sum(n) AS BIGINT) AS n_merged
  FROM ss GROUP BY 1, 2
),
direct AS (
  SELECT cluster, pos,
         CAST(sum(x_e6) AS BIGINT) AS direct_sum_e6,
         CAST(count(*) AS BIGINT) AS n_vecs
  FROM ex GROUP BY 1, 2
)
SELECT CAST(m.cluster AS BIGINT) AS cluster,
       CAST(m.pos AS BIGINT) AS pos,
       d.n_vecs,
       m.merged_sum_e6,
       d.direct_sum_e6,
       m.merged_sum_e6 = d.direct_sum_e6 AND m.n_merged = d.n_vecs
         AS merge_exact,
       CAST(m.merged_sum_e6 AS DOUBLE) / d.n_vecs AS refreshed_c_e6
FROM merged m
JOIN direct d ON d.cluster = m.cluster AND d.pos = m.pos
"""


@query("kmeans_minibatch_merge", oracle=_ORACLE)
def kmeans_minibatch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard the corpus (vec_id % 4), accumulate per-shard e6
    sufficient statistics under the trained cells, SUM-merge, and prove
    the merge equals the single pass per (cluster, dim) — plus the
    refreshed centroid coordinate the ledger implies (module
    docstring)."""
    k = coarse_k(spark, sf_dir)
    cells = kmeans_cell_index(spark, sf_dir, k, _ITERS)
    e = load(spark, sf_dir, "embeddings")
    ex = (
        e.join(cells, "vec_id")
        .select(
            "vec_id",
            F.col("cell").alias("cluster"),
            F.posexplode("embedding").alias("pos", "v"),
        )
        .select(
            "vec_id",
            "cluster",
            "pos",
            F.floor(F.col("v").cast("double") * 1e6)
            .cast("long")
            .alias("x_e6"),
        )
    )
    ss = ex.groupBy(
        (F.col("vec_id") % 4).alias("shard"), "cluster", "pos"
    ).agg(F.sum("x_e6").alias("s"), F.count(F.lit(1)).alias("n"))
    merged = ss.groupBy("cluster", "pos").agg(
        F.sum("s").cast("long").alias("merged_sum_e6"),
        F.sum("n").cast("long").alias("n_merged"),
    )
    direct = ex.groupBy("cluster", "pos").agg(
        F.sum("x_e6").cast("long").alias("direct_sum_e6"),
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
    )
    return (
        merged.join(direct, ["cluster", "pos"])
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col("pos").cast("long").alias("pos"),
            "n_vecs",
            "merged_sum_e6",
            "direct_sum_e6",
            (
                (F.col("merged_sum_e6") == F.col("direct_sum_e6"))
                & (F.col("n_merged") == F.col("n_vecs"))
            ).alias("merge_exact"),
            (F.col("merged_sum_e6").cast("double") / F.col("n_vecs")).alias(
                "refreshed_c_e6"
            ),
        )
    )
