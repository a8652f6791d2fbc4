"""nb_train — the fifth in-engine trainer family as a registry query:
multinomial Naive Bayes sufficient statistics over hashed-token buckets,
verified against a DuckDB replay of the identical counting.

Like classifier_train, the training label is the frozen quality
teacher's own keep/drop decision (distillation into an 8-bucket
student); UNLIKE the perceptron there is no epoch loop — training IS
one counting aggregation, the most Spark-native trainer shape possible
(reference counterpart: the reference trains nothing in-engine; this
family exists for the 100 TB curation pipeline, where an NB language/
quality prior is the classic first-pass gate).

Output: the dense (class x bucket) statistics table — every value an
integer count, so the oracle (same split/md5-bucket/count chain in
DuckDB) must agree bit-for-bit. The float log-space scoring gate
(operators/nb.py nb_score_expr) applies the artifact map-only, and
tests/test_nb.py pins its argmax against a pure-Python NB.

Scale: one tokenize pass; the (class, bucket) combine is bounded by
C*B rows per partition post-combine; class totals ride the same scan.
Artifact = C*(B+2) ints to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.operators.nb import nb_train
from purldb_spark.operators.perceptron import bucket_expr_sql
from purldb_spark.plans.q_select import _QC_W_SPARK, _QC_W_SQL
from purldb_spark.plans.registry import query

_B = 8  # student buckets (the frozen teacher uses 4096)


def _oracle() -> str:
    return f"""
WITH docs2 AS MATERIALIZED (
  SELECT doc_id, text,
         CASE WHEN CAST(list_sum(list_transform(string_split(text, ' '),
                     w -> {_QC_W_SQL})) AS BIGINT) >= 0
              THEN 1 ELSE 0 END AS label
  FROM documents
),
toks AS MATERIALIZED (
  SELECT label, {bucket_expr_sql("w", _B)} AS bucket
  FROM (SELECT label, unnest(string_split(text, ' ')) AS w FROM docs2)
),
cnt AS (SELECT label, bucket, count(*) AS token_cnt FROM toks GROUP BY 1, 2),
cd AS (SELECT label, count(*) AS class_docs FROM docs2 GROUP BY 1),
ct AS (SELECT label, count(*) AS class_tokens FROM toks GROUP BY 1),
grid AS (
  SELECT c.label, b.bucket
  FROM (VALUES (0), (1)) c(label),
       (VALUES {", ".join(f"({i})" for i in range(_B))}) b(bucket)
)
SELECT CAST(g.label AS BIGINT) AS label,
       CAST(g.bucket AS BIGINT) AS bucket,
       CAST(COALESCE(cnt.token_cnt, 0) AS BIGINT) AS token_cnt,
       CAST(COALESCE(cd.class_docs, 0) AS BIGINT) AS class_docs,
       CAST(COALESCE(ct.class_tokens, 0) AS BIGINT) AS class_tokens
FROM grid g
LEFT JOIN cnt ON cnt.label = g.label AND cnt.bucket = g.bucket
LEFT JOIN cd ON cd.label = g.label
LEFT JOIN ct ON ct.label = g.label
"""


def teacher_labeled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + the frozen teacher's keep/drop decision as an int
    label — the training frame both NB faces and the agreement eval
    share."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.expr(
            f"case when aggregate(split(text, ' '), 0L,"
            f" (acc, w) -> acc + ({_QC_W_SPARK})) >= 0 then 1 else 0 end"
        ).alias("y"),
    )


def trained_nb_stats(
    spark: SparkSession, sf_dir: str, n_buckets: int
) -> list[dict]:
    """The NB sufficient-statistics artifact as driver-side dicts,
    trained ONCE per (session, sf_dir, B) through the model cache — the
    trained_centroids production split; consumers build scoring exprs
    from it (nb_argmax_e6_expr). 2 x (B + 2) integers."""
    from purldb_spark.plans.fixture_runtime import cached_model

    return cached_model(
        spark,
        f"nb_stats:{sf_dir}:{n_buckets}",
        lambda: [
            r.asDict()
            for r in nb_train(
                spark,
                teacher_labeled_docs(spark, sf_dir),
                "y",
                "text",
                n_buckets,
            ).collect()
        ],
    )


@query("nb_train", oracle=_oracle())
def nb_train_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the NB student on the frozen teacher's decisions (module
    docstring); emit the dense sufficient-statistics table."""
    return nb_train(
        spark, teacher_labeled_docs(spark, sf_dir), "y", "text", _B
    )


@query(
    "nb_merge_shards",
    oracle=f"""
WITH docs2 AS MATERIALIZED (
  SELECT doc_id, text,
         CASE WHEN CAST(list_sum(list_transform(string_split(text, ' '),
                     w -> {_QC_W_SQL})) AS BIGINT) >= 0
              THEN 1 ELSE 0 END AS label
  FROM documents
),
toks AS MATERIALIZED (
  SELECT doc_id % 4 AS shard, label, {bucket_expr_sql("w", _B)} AS bucket
  FROM (SELECT doc_id, label, unnest(string_split(text, ' ')) AS w
        FROM docs2)
),
shard_cnt AS (
  SELECT shard, label, bucket, count(*) AS c FROM toks GROUP BY 1, 2, 3
),
merged AS (
  SELECT label, bucket, sum(c) AS merged_cnt FROM shard_cnt GROUP BY 1, 2
),
direct AS (
  SELECT label, bucket, count(*) AS direct_cnt FROM toks GROUP BY 1, 2
),
grid AS (
  SELECT c.label, b.bucket
  FROM (VALUES (0), (1)) c(label),
       (VALUES {", ".join(f"({i})" for i in range(_B))}) b(bucket)
)
SELECT CAST(g.label AS BIGINT) AS label,
       CAST(g.bucket AS BIGINT) AS bucket,
       CAST(COALESCE(m.merged_cnt, 0) AS BIGINT) AS merged_cnt,
       CAST(COALESCE(d.direct_cnt, 0) AS BIGINT) AS direct_cnt,
       COALESCE(m.merged_cnt, 0) = COALESCE(d.direct_cnt, 0) AS merge_exact
FROM grid g
LEFT JOIN merged m ON m.label = g.label AND m.bucket = g.bucket
LEFT JOIN direct d ON d.label = g.label AND d.bucket = g.bucket
""",
)
def nb_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NB merge proof as a first-class query — the sharded/streaming
    trainer path: per-SHARD sufficient statistics (what a daily ingest
    or a micro-batch face persists, streaming/nb_stream.py) SUM-merged
    into one table that must equal the single-pass train. Counts form a
    commutative monoid under +, so shards merge without re-reading raw
    text — the same lossless-merge property the HLL/CMS/histogram
    sketches prove engine-checked (sketch_hll_merge_daily), extended to
    the trainer family. merge_exact is TRUE for every row by the monoid
    algebra; the oracle re-derives both sides relationally."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.expr(
            f"case when aggregate(split(text, ' '), 0L,"
            f" (acc, w) -> acc + ({_QC_W_SPARK})) >= 0 then 1 else 0 end"
        ).alias("y"),
    )
    from purldb_spark.operators.perceptron import bucket_expr_spark

    b = bucket_expr_spark("w", _B)
    toks = docs.select(
        (F.col("doc_id") % 4).alias("shard"),
        F.col("y").alias("label"),
        F.explode(F.split(F.col("text"), " ")).alias("w"),
    ).select("shard", "label", F.expr(b).cast("long").alias("bucket"))
    # r15 (guide §2.4): ONE GROUPING SETS aggregation computes the per-shard
    # counts and the direct (label, bucket) counts in a single tokenize
    # scan — the two count families still come from separate accumulators
    # (the Expand duplicates each token row per grouping set), so the
    # merge proof stays independent: merged is SUM over shard partials,
    # direct counts raw token rows. Previously the corpus-sized toks
    # subtree (split + per-word md5 twice over) executed twice.
    gs = toks.groupingSets(
        [["shard", "label", "bucket"], ["label", "bucket"]],
        "shard",
        "label",
        "bucket",
    ).agg(F.count(F.lit(1)).alias("c"), F.grouping_id().alias("gid"))
    shard_cnt = gs.filter("gid = 0").select("shard", "label", "bucket", "c")
    merged = shard_cnt.groupBy("label", "bucket").agg(
        F.sum("c").cast("long").alias("merged_cnt")
    )
    direct = gs.filter("gid = 4").select(
        "label", "bucket", F.col("c").cast("long").alias("direct_cnt")
    )
    grid = spark.createDataFrame(
        [(c, b_) for c in range(2) for b_ in range(_B)],
        "label long, bucket long",
    )
    return (
        grid.join(merged, ["label", "bucket"], "left")
        .join(direct, ["label", "bucket"], "left")
        .select(
            "label",
            "bucket",
            F.coalesce("merged_cnt", F.lit(0))
            .cast("long")
            .alias("merged_cnt"),
            F.coalesce("direct_cnt", F.lit(0))
            .cast("long")
            .alias("direct_cnt"),
            (
                F.coalesce("merged_cnt", F.lit(0))
                == F.coalesce("direct_cnt", F.lit(0))
            ).alias("merge_exact"),
        )
    )
