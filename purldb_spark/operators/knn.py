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


def grid_cross_pairs(
    queries: DataFrame,
    index: DataFrame,
    q_id: str = "q_vec_id",
    i_id: str = "vec_id",
    n_query_blocks: int = 2,
) -> DataFrame:
    """Every (query, index) pair exactly once, as a blocked-grid EQUI-join
    instead of a crossJoin (guide §3): queries get a block id
    qb = pmod(q_id, Qb); index rows ib = pmod(i_id, Ib); each side is
    exploded across the other side's block axis so cell (qb, ib) holds
    exactly the pairs {q: qb(q)} x {i: ib(i)}.  The join key is the cell
    id, so the planner picks broadcast-hash at verification scale and a
    shuffled join at production scale — a BroadcastNestedLoopJoin (which
    MUST broadcast one full side, capped at 8 GB / 512M rows) never
    appears.  Qb is sized by the caller so one query block fits a task's
    build budget (scale_params.side_blocks); Ib tops up cell count to
    2 x shuffle partitions so a shuffled cell join spreads (guide §2.5).

    Shuffle volume is Q x Ib + N x Qb rows; compute stays the inherent
    O(Q x N) scoring of an exact baseline."""
    from purldb_spark.conf import shuffle_partitions

    n_part = shuffle_partitions(index.sparkSession)
    qb = max(2, int(n_query_blocks))
    ib = max(2, -(-2 * n_part // qb))
    qrep = (
        queries.withColumn("_qb", F.pmod(F.col(q_id), F.lit(qb)).cast("int"))
        .withColumn("_ib", F.explode(F.sequence(F.lit(0), F.lit(ib - 1))))
        # spread the replicated query side over the cell key: anchors come
        # off a single-file scan (1 partition), and when the planner builds
        # the index side the STREAM side's partitioning is what the whole
        # O(Q·N) scoring pass inherits (measured serial without this)
        .repartition(n_part, "_qb", "_ib")
    )
    irep = index.withColumn(
        "_ib", F.pmod(F.col(i_id), F.lit(ib)).cast("int")
    ).withColumn("_qb", F.explode(F.sequence(F.lit(0), F.lit(qb - 1))))
    return qrep.join(irep, ["_qb", "_ib"]).drop("_qb", "_ib")


def brute_force_topk(
    queries: DataFrame,
    index: DataFrame,
    k: int,
    q_id: str = "q_vec_id",
    i_id: str = "vec_id",
    n_query_blocks: int = 2,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (desc), tie-broken on the
    index id. queries: (q_vec_id, q_embedding); index: (vec_id, embedding).

    r16: the pair space is a blocked grid equi-join (grid_cross_pairs) —
    no full-corpus BroadcastNestedLoopJoin.  The INDEX side is spread
    across the cluster first — the single-file parquet scan otherwise
    runs the whole O(Q·N) score pass on one task."""
    from purldb_spark.conf import shuffle_partitions

    n_part = shuffle_partitions(index.sparkSession)
    joined = grid_cross_pairs(
        queries,
        index.repartition(n_part, i_id),
        q_id,
        i_id,
        n_query_blocks,
    ).filter(F.col(q_id) != F.col(i_id))
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


def banded_keys(
    e: DataFrame,
    id_col: str,
    vec_col: str,
    bands: list[list[list[float]]],
) -> DataFrame:
    """(id, band_idx, bucket) LSH key table in ONE projection: the whole
    plane matrix is a single literal array<array<double>>, the per-plane
    sign bits one higher-order transform over it, and the per-band buckets
    are packed from the bit vector and exploded. Equivalent to a band-count
    union of bucket_expr projections, but one scan and one compact codegen
    unit — the unrolled-union shape made Catalyst compile
    bands x planes x dim literal terms and measured ~2x slower wall-clock
    at the 8x8 production config."""
    k = len(bands[0])
    if any(len(b) != k for b in bands):
        raise ValueError("all bands must have the same plane count")
    mat = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{x}D" for x in p) + ")"
            for band in bands
            for p in band
        )
        + ")"
    )
    bits = (
        f"transform({mat}, p -> CASE WHEN aggregate(zip_with({vec_col}, p,"
        " (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v) >= 0"
        " THEN 1 ELSE 0 END)"
    )
    with_bits = e.select(F.col(id_col), F.expr(bits).alias("_bits"))
    # bit j of band b is plane b*k+j; bucket packing matches bucket_sql
    # (bit j contributes 1 << j)
    keys = (
        f"transform(sequence(0, {len(bands) - 1}), b -> struct("
        "cast(b AS INT) AS band_idx,"
        f" aggregate(sequence(0, {k - 1}), 0, (acc, j) ->"
        f" acc + element_at(_bits, b * {k} + j + 1) * shiftleft(1, j))"
        " AS bucket))"
    )
    return (
        with_bits.select(F.col(id_col), F.explode(F.expr(keys)).alias("_k"))
        .select(
            F.col(id_col),
            F.col("_k.band_idx").alias("band_idx"),
            F.col("_k.bucket").alias("bucket"),
        )
    )


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
    base = banded_keys(e, id_col, vec_col, bands)
    return multiprobe_expand(base, id_col, len(bands[0]))


def multiprobe_expand(keys: DataFrame, id_col: str, n_bits: int) -> DataFrame:
    """Expand a stored (id, band_idx, bucket) key table to its multiprobe
    set (own bucket + every 1-bit flip) — a pure bit expression, so probe
    keys can be derived from a materialized band index without recomputing
    any hyperplane dot products."""
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_bits)],
    )
    return keys.select(
        F.col(id_col), F.col("band_idx"), F.explode(probes).alias("bucket")
    )


def index_keys(
    e: DataFrame,
    id_col: str,
    vec_col: str,
    bands: list[list[list[float]]],
) -> DataFrame:
    """INDEX-side key table: exactly one (band_idx, bucket) per band."""
    return banded_keys(e, id_col, vec_col, bands)
