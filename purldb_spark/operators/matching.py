"""The match engine — SURVEY §2.7 F8 + §2.3 J4/J6/J7.

The reference matches an uploaded codebase against its index with a cascade
of matchers, cheap to expensive, where every stage tags what it matched so
later stages only see the remainder (matchcode/pipelines/matching.py:46-62,
matchcode/match.py:49-64). Each matcher is a per-resource loop issuing SQL
against Postgres.

Here the cascade is a set-oriented DataFrame pipeline: every stage is ONE
join over the full remaining query set, and "tagging" is a left-anti join
feeding the next stage. At 100 TB this is the difference between O(resources)
round-trips and a handful of shuffles; the banding join keeps the
approximate stage O(candidates) instead of O(N²).
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from purldb_spark.functions.fingerprints import (
    CHUNK_COLS,
    COUNT_RANGE_RATIO,
    HAMMING_THRESHOLD,
    count_gate,
    hamming128,
)


def exact_fingerprint_match(
    query: DataFrame, index: DataFrame, on: list[str]
) -> DataFrame:
    """J7: exact match — every chunk (and count) equal
    (matchcode/models.py:247-255). Query columns must be prefixed q_*."""
    cond = reduce(
        lambda a, b: a & b, (query["q_" + c] == index[c] for c in on)
    )
    return query.join(index, cond, "inner")


def banded_candidates(
    query: DataFrame,
    index: DataFrame,
    query_count: str = "q_element_count",
    index_count: str = "element_count",
    ratio: float = COUNT_RANGE_RATIO,
) -> DataFrame:
    """J6: LSH-banding candidate generation (matchcode/models.py:258-265) —
    a candidate is any index row agreeing with the query on AT LEAST ONE of
    the four 32-bit chunks, with the ±5% element-count gate applied inside
    each branch. Implemented as a union of 4 equi-joins so each branch is a
    plain hash join on an int key; the dedup keys are carried explicitly.

    Never write this as crossJoin+hamming: the banding IS the index
    (SURVEY §4)."""
    branches = []
    for c in CHUNK_COLS:
        branches.append(
            query.join(index, query["q_" + c] == index[c], "inner").filter(
                count_gate(F.col(query_count), F.col(index_count), ratio)
            )
        )
    return reduce(lambda a, b: a.unionByName(b), branches).dropDuplicates()


def hamming_matches(
    candidates: DataFrame, threshold: int = HAMMING_THRESHOLD
) -> DataFrame:
    """F3 applied to banded candidates: keep hd < threshold, attach hd and
    similarity = (128-hd)/128."""
    hd = hamming128(
        tuple(F.col("q_" + c) for c in CHUNK_COLS),
        tuple(F.col(c) for c in CHUNK_COLS),
    )
    return (
        candidates.withColumn("hamming", hd)
        .filter(F.col("hamming") < threshold)
        .withColumn(
            "similarity", (F.lit(128) - F.col("hamming")).cast("double") / 128.0
        )
    )


def cascade(
    query: DataFrame,
    stages: list[tuple[str, Callable[[DataFrame], DataFrame]]],
    query_key: str,
) -> DataFrame:
    """F8: the matcher cascade. Each stage maps the REMAINING query rows to
    matches (must preserve `query_key` and add its own match columns); rows
    matched by stage i are anti-joined out before stage i+1. Returns the
    union of all matches with a `match_type` column (the reference's
    matched_to_purldb_* tags, matchcode/match.py:92-190)."""
    remaining = query
    results: list[DataFrame] = []
    for name, stage in stages:
        matches = stage(remaining).withColumn("match_type", F.lit(name))
        results.append(matches)
        remaining = remaining.join(
            matches.select(query_key).dropDuplicates(), query_key, "left_anti"
        )
    return reduce(lambda a, b: a.unionByName(b), results)
