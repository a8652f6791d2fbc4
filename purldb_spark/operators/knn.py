"""Similarity search over embedding columns (array<float>).

Not in the reference (purldb has no vector search); added as a first-class
training-data-pipeline operator per the build brief. Two paths:

- brute-force cosine top-k: exact baseline. O(Q×N) dot products, all inside
  Catalyst's higher-order functions (zip_with/aggregate) — JVM-side, no UDF,
  no Python. Right answer for small query sets or reranking.
- hyperplane-LSH bucketing: the scale path. Deterministic random
  hyperplanes (seeded at plan-build time, embedded as literals) give each
  vector a b-bit signature; candidates share a bucket, so the join is an
  equi-join on the bucket key and cost is O(N) + per-bucket work. Recall is
  tunable via bands of independent signatures (standard LSH); at 100 TB the
  bucket key is also the natural partition/cluster key so probes touch one
  partition.

Floating-point discipline: all arithmetic is double (floats cast up), folds
run in index order, so results compare bit-exact against the DuckDB oracle's
list_reduce formulation.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a: str, b: str) -> Column:
    """Exact-order double cosine between two array<float> columns."""
    return F.expr(_cosine_sql_spark(a, b))


def normalize_expr(v: str) -> Column:
    """Unit-normalize an array<float> -> array<double>. Precomputing this
    once per vector turns per-pair cosine into a bare dot product — O(N)
    norms instead of O(N²) (the dominant cost of all-pairs similarity)."""
    norm = (
        f"sqrt(aggregate({v}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))"
    )
    return F.expr(f"transform({v}, x -> cast(x as double) / {norm})")


def normalize_sql_duckdb(v: str) -> str:
    norm = (
        f"sqrt(list_reduce(list_transform({v},"
        f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))"
    )
    return f"list_transform({v}, x -> CAST(x AS DOUBLE) / {norm})"


def dot_expr(a: str, b: str) -> Column:
    """Plain dot product of two array<double> columns (use on normalized
    vectors)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    )


def dot_sql_duckdb(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}),"
        f" p -> p[1] * p[2]), (acc, x) -> acc + x)"
    )


def _cosine_sql_spark(a: str, b: str) -> str:
    dot = (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        f" 0D, (acc, v) -> acc + v)"
    )
    norm = (
        "sqrt(aggregate({v}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))"
    )
    return f"{dot} / ({norm.format(v=a)} * {norm.format(v=b)})"


def cosine_sql_duckdb(a: str, b: str) -> str:
    """Same cosine, DuckDB dialect. list_reduce folds left from the first
    element; Spark's aggregate folds left from 0.0 — IEEE-identical since
    0 + x == x exactly."""
    dot = (
        f"list_reduce(list_transform(list_zip({a}, {b}),"
        f" p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
    )
    norm = (
        "sqrt(list_reduce(list_transform({v},"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))"
    )
    return f"{dot} / ({norm.format(v=a)} * {norm.format(v=b)})"


def brute_force_topk(
    queries: DataFrame,
    index: DataFrame,
    k: int,
    q_id: str = "q_vec_id",
    i_id: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (desc), tie-broken on the
    index id. queries: (q_vec_id, q_embedding); index: (vec_id, embedding)."""
    joined = queries.crossJoin(index).filter(F.col(q_id) != F.col(i_id))
    scored = joined.withColumn("cosine", cosine_expr("q_embedding", "embedding"))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(i_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, i_id, "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (literal constants in the
    plan, identical on every engine)."""
    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]
        for _ in range(n_planes)
    ]


def bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """b-bit LSH bucket id: bit j = sign(dot(vec, plane_j)) >= 0."""
    return F.expr(bucket_sql(vec_col, planes, dialect="spark"))


def bucket_sql(vec_col: str, planes: list[list[float]], dialect: str) -> str:
    bits = []
    for j, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"{x}D" for x in plane) + ")"
        if dialect == "spark":
            dot = (
                f"aggregate(zip_with({vec_col}, {arr},"
                f" (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"
            )
        else:
            arr = "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in plane) + "]"
            dot = (
                f"list_reduce(list_transform(list_zip({vec_col}, {arr}),"
                f" p -> CAST(p[1] AS DOUBLE) * p[2]), (acc, x) -> acc + x)"
            )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def multiprobe_keys(
    e: DataFrame,
    id_col: str,
    vec_col: str,
    bands: list[list[list[float]]],
) -> DataFrame:
    """QUERY-side multiprobe key table: for each band, the vector's own
    bucket plus every bucket at Hamming distance 1 (one plane's sign
    flipped) — (id, band_idx, bucket), (1 + bits) rows per band.

    Multiprobe is the recall knob that does NOT grow the index: the index
    side keeps exactly one key per band (see BENCH_scale.md finding 1 —
    bucket bits must grow with log N, which cuts per-band recall; probing
    adjacent buckets buys it back on the query side only, so index size,
    shuffle key distribution, and storage stay unchanged)."""
    rows = []
    for b, planes in enumerate(bands):
        base = bucket_expr(vec_col, planes)
        probes = F.array(
            base, *[base.bitwiseXOR(F.lit(1 << j)) for j in range(len(planes))]
        )
        rows.append(
            e.select(
                F.col(id_col),
                F.lit(b).alias("band_idx"),
                F.explode(probes).alias("bucket"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def index_keys(
    e: DataFrame,
    id_col: str,
    vec_col: str,
    bands: list[list[list[float]]],
) -> DataFrame:
    """INDEX-side key table: exactly one (band_idx, bucket) per band."""
    rows = [
        e.select(
            F.col(id_col),
            F.lit(b).alias("band_idx"),
            bucket_expr(vec_col, planes).alias("bucket"),
        )
        for b, planes in enumerate(bands)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
