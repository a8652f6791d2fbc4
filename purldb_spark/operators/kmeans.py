"""Distributed Lloyd k-means over an embedding column — the trainer behind
the IVF index (operators/ivf.py ships 8 frozen centroids and notes "a
trained k-means would drop in the same way"; this is that trainer).

Execution model is the classic scalable one (same shape Spark MLlib uses):
centroids live on the driver (k x dim doubles — tiny), each Lloyd iteration
is

  * assignment: map-only — the centroids are broadcast as plan literals and
    every row computes argmin squared-L2 over k literal arrays inside
    whole-stage codegen (no join, no shuffle);
  * update: posexplode(vec) -> groupBy(cluster, pos) -> exact-decimal mean —
    partial (map-side) aggregation reduces the shuffle to k*dim rows per
    partition regardless of data size, then k*dim values are collected to
    the driver to become the next iteration's literals.

At 100 TB the per-iteration cost is one scan + a k*dim-row shuffle; that is
the textbook MLlib/ML k-means cost model. Init here is deterministic
hash-order sampling (md5 of the id) so the DuckDB oracle can replay it;
at real scale you would swap in k-means|| oversampling — only the init
changes, the iteration plan is identical.

Determinism contract (what makes an exact-hash oracle possible):

  * squared-L2 distance is a left-to-right fold over zip_with — identical
    double arithmetic in Spark (`aggregate(..., 0D, +)`) and DuckDB
    (`list_reduce`, which folds from the first element; 0+x == x in IEEE);
  * argmin ties break to the lowest cluster id on both engines
    (array_position-of-min vs ORDER BY dist, cluster);
  * per-cluster means fix every element to a 1e-12 grid FIRST
    (floor(x * 1e12) as BIGINT — double multiply and floor are identical
    IEEE ops on both engines), sum exactly as integers, and divide as
    doubles. A straight DECIMAL cast is NOT portable here: Spark rounds
    double->decimal HALF_UP and DuckDB HALF_EVEN, and across 32k element
    casts one tie showed up (1 ulp at scale 12) and flipped assignments;
  * a cluster that loses all members keeps its previous centroid.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(30,12)"


def _lit_array(c: list[float]) -> str:
    return "array(" + ", ".join(f"{float(x)!r}D" for x in c) + ")"


def sqdist_spark(vec_col: str, c: list[float]) -> str:
    """Squared L2 distance of an array<float> column to a literal centroid,
    as a Spark SQL expression (deterministic left fold)."""
    return (
        f"aggregate(zip_with({vec_col}, {_lit_array(c)},"
        " (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),"
        " 0D, (acc, v) -> acc + v)"
    )


def sqdist_cols_spark(a: str, b: str) -> str:
    """Squared L2 between two array columns (deterministic left fold) —
    the exact-re-rank metric of the PQ refinement step."""
    return (
        f"aggregate(zip_with({a}, {b},"
        " (x, y) -> (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))),"
        " 0D, (acc, v) -> acc + v)"
    )


def sqdist_cols_duckdb(a: str, b: str) -> str:
    """DuckDB twin of sqdist_cols_spark (same left fold, bit-identical)."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}),"
        " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
        " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),"
        " (acc, x) -> acc + x)"
    )


def assign_expr(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """1-based argmin cluster id over literal centroids (first-min ties).

    The distance array is bound to a lambda variable via a 1-element
    ``transform`` so the k folds are evaluated ONCE per row —
    ``array_position(dists, array_min(dists))`` textually duplicates the
    whole dists tree, and codegen subexpression elimination skips
    lambda-bearing (interpreted HOF) expressions, so the naive form paid
    the k distance folds twice (measured 1.7x on the PQ encode)."""
    dists = (
        "array(" + ", ".join(sqdist_spark(vec_col, c) for c in centroids) + ")"
    )
    return F.expr(
        f"transform(array({dists}), d -> array_position(d, array_min(d)))[0]"
    ).cast("long")


def probe_cells_expr(
    vec_col: str, centroids: list[list[float]], nprobe: int
) -> F.Column:
    """Array of the ``nprobe`` nearest 1-based cluster ids over literal
    centroids — the multiprobe generalization of assign_expr (nprobe=1
    yields exactly the assignment, same arithmetic, same lowest-id ties).

    Map-only: the centroids are plan literals like every assignment in
    this module, the struct array_sort orders lexicographically by
    (distance, cell) — identical to the oracle's ``ORDER BY dist,
    cluster`` row_number — and the whole selection runs inside
    whole-stage codegen with no join at all (a broadcast cross join here
    would be a BroadcastNestedLoopJoin, the plan shape the registry
    fences off)."""
    structs = ", ".join(
        f"struct({sqdist_spark(vec_col, c)} as d, {ci + 1}L as cell)"
        for ci, c in enumerate(centroids)
    )
    return F.expr(
        f"transform(slice(array_sort(array({structs})), 1, {int(nprobe)}),"
        " s -> s.cell)"
    )


def init_centroids(
    df: DataFrame, vec_col: str, id_col: str, k: int
) -> list[list[float]]:
    """Deterministic init: the k rows with the smallest md5('km' || id),
    in hash order (an unbiased-but-replayable sample; swap for k-means||
    at real scale)."""
    rows = (
        df.select(
            F.col(vec_col).alias("_v"),
            F.md5(
                F.concat(F.lit("km"), F.col(id_col).cast("string"))
            ).alias("_h"),
            F.col(id_col).alias("_id"),
        )
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r["_v"]] for r in rows]


def lloyd_step(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> list[list[float]]:
    """One Lloyd iteration: returns the next centroid list (driver-side
    k x dim doubles). Missing clusters keep their previous centroid."""
    assigned = df.select(
        assign_expr(vec_col, centroids).alias("cluster"),
        F.col(vec_col).alias("_v"),
    )
    # fixed-point grid sum: exact integer arithmetic, associative, and the
    # grid snap (double multiply + floor) is bit-identical across engines.
    # BIGINT headroom: |elem| <= ~4 -> |scaled| <= 4e12, overflow needs
    # ~2e6 T rows per cluster; at that scale widen to decimal sums.
    means = (
        assigned.select("cluster", F.posexplode("_v").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("val").cast("double") * F.lit(1000000000000.0)
                    ).cast("long")
                ).cast("double")
                / F.lit(1000000000000.0)
                / F.count("val").cast("double")
            ).alias("mv")
        )
        .collect()
    )
    nxt = [list(c) for c in centroids]
    seen: dict[int, dict[int, float]] = {}
    for r in means:
        seen.setdefault(int(r["cluster"]), {})[int(r["pos"])] = float(r["mv"])
    for cl, by_pos in seen.items():
        for pos, v in by_pos.items():
            nxt[cl - 1][pos] = v
    return nxt


def kmeans_fit(
    df: DataFrame, vec_col: str, id_col: str, k: int, iters: int
) -> list[list[float]]:
    """Run ``iters`` Lloyd iterations; returns the trained centroids."""
    cents = init_centroids(df, vec_col, id_col, k)
    for _ in range(iters):
        cents = lloyd_step(df, vec_col, cents)
    return cents


def kmeans_assign(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Train on ``df`` (or take pre-trained ``centroids``) then return
    (id, cluster, cluster_size) under the final assignment — the
    materialized output an indexing pipeline would write next to the
    corpus (IVF cell ids)."""
    cents = centroids or kmeans_fit(df, vec_col, id_col, k, iters)
    assigned = df.select(
        F.col(id_col),
        assign_expr(vec_col, cents).alias("cluster"),
    )
    sizes = assigned.groupBy("cluster").agg(
        F.count("*").alias("cluster_size")
    )
    return assigned.join(F.broadcast(sizes), "cluster").select(
        id_col, "cluster", "cluster_size"
    )


# --------------------------------------------------------------------------
# DuckDB oracle generation: the SAME init / assignment / exact-mean rules,
# unrolled iteration by iteration (SQL has no driver loop).
# --------------------------------------------------------------------------

def _sqdist_duckdb(vec_expr: str, cent_expr: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({vec_expr}, {cent_expr}),"
        " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
        " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),"
        " (acc, x) -> acc + x)"
    )


def kmeans_cells_ctes(
    table: str,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int,
    dim: int,
    prefix: str = "",
) -> str:
    """The comma-joined CTE definitions of the unrolled Lloyd oracle, ending
    in ``{prefix}asgF(vid, cluster)`` — the trained cell assignment. Shared
    by kmeans_oracle_sql and any oracle that composes the trained cells into
    a downstream index (knn_trained_ivfpq_refine probes them). ``prefix``
    namespaces every CTE so several independent trainings can coexist in
    one oracle (pq_train unrolls one chain per PQ subspace)."""
    dist = _sqdist_duckdb(f"e.{vec_col}", "c.cv")
    parts = [
        f"""
    cent0 AS (
      SELECT cluster, cv FROM (
        SELECT row_number() OVER (
                 ORDER BY md5('km' || CAST({id_col} AS VARCHAR)), {id_col}
               ) AS cluster,
               list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS cv
        FROM {table}
      ) WHERE cluster <= {k}
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""
    rank{i} AS (
      SELECT e.{id_col} AS vid, e.{vec_col} AS v, c.cluster,
             row_number() OVER (
               PARTITION BY e.{id_col} ORDER BY {dist}, c.cluster
             ) AS rn
      FROM {table} e, cent{i - 1} c
    ),
    asg{i} AS (
      SELECT vid, v, CAST(cluster AS BIGINT) AS cluster
      FROM rank{i} WHERE rn = 1
    ),
    mean{i} AS (
      SELECT cluster, t.i AS pos,
             CAST(SUM(CAST(floor(CAST(v[CAST(t.i AS INT) + 1] AS DOUBLE)
                                 * 1000000000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000000000.0
               / CAST(COUNT(*) AS DOUBLE) AS mv
      FROM asg{i}, range({dim}) t(i)
      GROUP BY cluster, t.i
    ),
    cent{i} AS (
      SELECT p.cluster, COALESCE(n.cv, p.cv) AS cv
      FROM cent{i - 1} p
      LEFT JOIN (
        SELECT cluster, list(mv ORDER BY pos) AS cv FROM mean{i}
        GROUP BY cluster
      ) n ON n.cluster = p.cluster
    )""")
    # the OUTPUT assignment uses the post-iteration centroids (cent{iters}),
    # exactly like kmeans_assign: fit returns cent{iters}, then assigns
    parts.append(f"""
    rankF AS (
      SELECT e.{id_col} AS vid, c.cluster,
             row_number() OVER (
               PARTITION BY e.{id_col} ORDER BY {dist}, c.cluster
             ) AS rn
      FROM {table} e, cent{iters} c
    ),
    asgF AS (
      SELECT vid, CAST(cluster AS BIGINT) AS cluster FROM rankF WHERE rn = 1
    )""")
    body = ",".join(parts)
    if prefix:
        # rename the CTE identifiers only: centN/rankN/asgN/meanN (+ F) are
        # never column or table aliases inside the generated SQL
        body = re.sub(r"\b(cent|rank|asg|mean)(\d+|F)\b", rf"{prefix}\1\2", body)
    return body


def kmeans_oracle_sql(
    table: str, vec_col: str, id_col: str, k: int, iters: int, dim: int
) -> str:
    """Unrolled Lloyd SQL: cent0 = hash-order init; per iteration an
    assignment (cross join vs k centroid rows, row_number ties to lowest
    cluster) and an exact-decimal mean update with COALESCE keep-old."""
    body = kmeans_cells_ctes(table, vec_col, id_col, k, iters, dim)
    return f"""
    WITH{body}
    SELECT a.vid AS {id_col}, a.cluster,
           s.cluster_size
    FROM asgF a
    JOIN (
      SELECT cluster, COUNT(*) AS cluster_size FROM asgF
      GROUP BY cluster
    ) s ON s.cluster = a.cluster
    """
