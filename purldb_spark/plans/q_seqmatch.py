"""F5 with EXACT SequenceMatcher.ratio semantics — the reference's
tie-break (matchcode/models.py:339-366) ranks candidates by
(size_difference, 1 - SequenceMatcher.ratio) and keeps the best;
`f5_rank_tiebreak` (q_match.py) substitutes levenshtein to stay
SQL-expressible, THIS query runs the stdlib-exact ratio via the
Arrow-batched UDF (functions/seqmatch.py).

No DuckDB oracle — SequenceMatcher.ratio is not SQL-expressible; the
driver records the weaker rows-only check. Exact parity is instead
proven by tests/test_seqmatch.py, which replays the reference's
ranking loop in plain Python (difflib over the collected fixture)
and compares winners row by row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from purldb_spark.catalog.tables import load
from purldb_spark.functions.seqmatch import seqmatch_ratio
from purldb_spark.plans.registry import query


def _tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-size-diff candidate tier per query doc (the step-4 rank
    input): every same-lang candidate, filtered to the smallest
    |Δn_chars| — small by construction, so the exact per-lang join is
    fine for this parity face (the banded version lives in f5)."""
    docs = load(spark, sf_dir, "documents")
    q = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("q_doc_id"),
        "lang",
        F.col("n_chars").alias("q_chars"),
        F.substring("text", 1, 24).alias("q_head"),
    )
    idx = docs.select(
        F.col("doc_id").alias("cand_doc_id"),
        "lang",
        F.col("n_chars").alias("i_chars"),
        F.substring("text", 1, 24).alias("i_head"),
    )
    sized = (
        q.join(idx, "lang")
        .filter(F.col("q_doc_id") != F.col("cand_doc_id"))
        .select(
            "q_doc_id",
            "cand_doc_id",
            F.abs(F.col("q_chars") - F.col("i_chars")).alias("size_diff"),
            "q_head",
            "i_head",
        )
        .withColumn(
            "min_size_diff", F.min("size_diff").over(W.partitionBy("q_doc_id"))
        )
    )
    return sized.filter(F.col("size_diff") == F.col("min_size_diff"))


@query("f5_seqmatch_rank")
def f5_seqmatch_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-exact F5: rank the min-size tier by
    1 - SequenceMatcher.ratio (higher ratio wins), tie-break on
    candidate id, keep the best per query (matchcode/models.py:347-366).
    The UDF touches only the tier rows — Arrow traffic is O(queries)."""
    scored = _tier(spark, sf_dir).withColumn(
        "name_ratio", seqmatch_ratio(F.col("q_head"), F.col("i_head"))
    )
    w = W.partitionBy("q_doc_id").orderBy(
        (1 - F.col("name_ratio")).asc(), F.col("cand_doc_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "q_doc_id",
            "cand_doc_id",
            F.col("size_diff").cast("long").alias("size_diff"),
            F.round("name_ratio", 6).alias("name_ratio"),
        )
    )
