"""classifier_train — an in-engine TRAINED text classifier (batch
perceptron over hashed-token features), verified against a DuckDB
replay of the identical integer update chain.

select_quality_classifier ships a FROZEN linear model (its weights are
md5-derived stand-ins, documented as such because no trained artifact
exists in the sandbox). This query closes that loop in-engine: it
TRAINS a linear model distributedly — operators/perceptron.py, batch
perceptron updates, one map-side-combined aggregation per epoch, the
weights riding into the next epoch's plan as literals — using the
frozen model's own keep/drop decision as the training label, i.e. a
distillation of the frozen scorer into an 8-bucket student. All
arithmetic is INTEGER (counts, dot products, updates), so no
fixed-point grid is needed for cross-engine exactness: the oracle
unrolls the same epochs as a CTE chain (the kmeans_cells_ctes pattern)
and must reproduce every weight and mistake count bit-for-bit.

Output: one row per epoch — post-update weights w0..w{B-1}, wb (bias),
and n_mis (mistakes under the PRE-update weights). Deterministic: batch
updates sum over all misclassified rows, so row order cannot matter
(the reason perceptron, not row-sequential SGD, is the in-engine
shape).

Scale: per epoch ONE aggregation over the corpus shipping B+2 integers
to the driver; features are a map-only projection. Linear, shuffle-free
but for the final combine — the same contract as lloyd_step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.operators.perceptron import (
    bucket_expr_sql,
    bucket_expr_spark,
    perceptron_fit,
)
from purldb_spark.plans.q_select import _QC_W_SPARK, _QC_W_SQL
from purldb_spark.plans.registry import query

_B = 8  # feature buckets (student model; the frozen teacher uses 4096)
_EPOCHS = 4


def epoch_ctes() -> tuple[list[str], list[str]]:
    """The perceptron training replay as SQL building blocks — a
    ``feats`` CTE plus one ``e<t>`` CTE per epoch unrolling the exact
    integer update chain. Returns (cte_parts, final_weight_exprs) so
    q_classifier's own oracle AND the agreement eval's
    (plans/q_agreement.py) share one replay of the trainer."""
    dims = [f"x{i}" for i in range(_B)] + ["xb"]
    feat_cols = ",\n         ".join(
        f"CAST(len(list_filter(string_split(text, ' '),"
        f" w -> {bucket_expr_sql('w', _B)} = {i})) AS BIGINT) AS x{i}"
        for i in range(_B)
    )
    parts = [
        f"""
feats AS MATERIALIZED (
  SELECT doc_id,
         {feat_cols},
         CAST(1 AS BIGINT) AS xb,
         CASE WHEN CAST(list_sum(list_transform(string_split(text, ' '),
                     w -> {_QC_W_SQL})) AS BIGINT) >= 0
              THEN 1 ELSE -1 END AS y
  FROM documents
)"""
    ]
    prev_w = ["CAST(0 AS BIGINT)"] * len(dims)
    for t in range(1, _EPOCHS + 1):
        dot = " + ".join(f"({prev_w[i]}) * {d}" for i, d in enumerate(dims))
        upd = ",\n         ".join(
            f"({prev_w[i]}) + sum(CASE WHEN y * ({dot}) <= 0"
            f" THEN y * {d} ELSE 0 END) AS w{i}"
            for i, d in enumerate(dims)
        )
        src = "feats" if t == 1 else f"feats, e{t - 1}"
        group = "" if t == 1 else "\n  GROUP BY " + ", ".join(
            f"e{t - 1}.w{i}" for i in range(len(dims))
        )
        parts.append(
            f"""
e{t} AS MATERIALIZED (
  SELECT {upd},
         sum(CASE WHEN y * ({dot}) <= 0 THEN 1 ELSE 0 END) AS n_mis
  FROM {src}{group}
)"""
        )
        prev_w = [f"e{t}.w{i}" for i in range(len(dims))]
    return parts, prev_w


def _oracle() -> str:
    dims = [f"x{i}" for i in range(_B)] + ["xb"]
    parts, _final = epoch_ctes()
    selects = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS epoch, "
        + ", ".join(
            f"CAST(w{i} AS BIGINT) AS {'wb' if d == 'xb' else 'w' + str(i)}"
            for i, d in enumerate(dims)
        )
        + f", CAST(n_mis AS BIGINT) AS n_mis FROM e{t}"
        for t in range(1, _EPOCHS + 1)
    )
    return "WITH " + ",".join(parts) + "\n" + selects


def perceptron_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The THIN integer feature table (doc_id, x0..x{B-1}, xb, y) the
    perceptron trains on — features + teacher label in ONE map-only
    projection (no self-join), materialized once per (session, sf_dir)
    and shared by classifier_train and classifier_agreement_eval
    (fixture_runtime.cached_fixture; prebuilt by fixture_warmup). In
    production this is the featurized table the curation pipeline
    writes next to the corpus; epochs then iterate 11 longs/row (~1% of
    the text they derive from), not raw text. Oracles re-derive the
    features relationally from raw documents (epoch_ctes' feats CTE),
    so the cache can never mask a featurization bug."""
    from purldb_spark.plans.fixture_runtime import cached_fixture

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        b = bucket_expr_spark("w", _B)
        return docs.select(
            "doc_id",
            *[
                F.expr(f"size(filter(split(text, ' '), w -> {b} = {i}))")
                .cast("long")
                .alias(f"x{i}")
                for i in range(_B)
            ],
            F.lit(1).cast("long").alias("xb"),
            F.expr(
                f"case when aggregate(split(text, ' '), 0L,"
                f" (acc, w) -> acc + ({_QC_W_SPARK})) >= 0 then 1 else -1"
                f" end"
            )
            .cast("long")
            .alias("y"),
        ).localCheckpoint(eager=True)

    return cached_fixture(spark, f"perceptron_feats:{sf_dir}", build)


def perceptron_history(spark: SparkSession, sf_dir: str) -> list[dict]:
    """The per-epoch weight/mistake history, trained ONCE per (session,
    sf_dir) through the driver-side model cache — the same production
    split as trained_centroids / trained_pq_codebooks: the training
    pipeline fits and persists the artifact, queries consume it.
    classifier_train materializes the history view; the agreement eval
    reads the final weights. The artifact is epochs x (B + 2) ints."""
    from purldb_spark.plans.fixture_runtime import cached_model

    return cached_model(
        spark,
        f"perceptron_hist:{sf_dir}:{_B}:{_EPOCHS}",
        lambda: perceptron_fit(
            perceptron_feats(spark, sf_dir), "y", _B, _EPOCHS
        ),
    )


@query("classifier_train", oracle=_oracle())
def classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the 8-bucket perceptron student on the frozen teacher's
    decisions (module docstring); emit the per-epoch weight/mistake
    history — the model artifact plus its training curve (trained once
    per session via perceptron_history; the oracle re-derives every
    epoch from raw documents, so the cache can never mask a bug)."""
    hist = perceptron_history(spark, sf_dir)
    rows = [
        (
            int(h["epoch"]),
            *[int(x) for x in h["w"]],
            int(h["n_mis"]),
        )
        for h in hist
    ]
    cols = (
        "epoch long, "
        + ", ".join(f"w{i} long" for i in range(_B))
        + ", wb long, n_mis long"
    )
    return spark.createDataFrame(rows, cols)
