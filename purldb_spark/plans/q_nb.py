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


@query("nb_train", oracle=_oracle())
def nb_train_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the NB student on the frozen teacher's decisions (module
    docstring); emit the dense sufficient-statistics table."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.expr(
            f"case when aggregate(split(text, ' '), 0L,"
            f" (acc, w) -> acc + ({_QC_W_SPARK})) >= 0 then 1 else 0 end"
        ).alias("y"),
    )
    return nb_train(spark, docs, "y", "text", _B)
