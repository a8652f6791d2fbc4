"""IVF (inverted-file) partitioning for embedding search — the second ANN
scale path from the brief ("an IVF or LSH-bucketed variant"; LSH lives in
operators/knn.py).

Eight fixed centroids (sampled once from the corpus, frozen as plan
literals — a trained k-means would drop in the same way) partition the
vector space into cells; every vector is assigned to its max-dot-product
cell, and a query searches only its own cell. At 100 TB the cell id is the
table's partition key, so a probe reads one partition; recall is tuned by
probing the p nearest cells (nprobe) exactly as in FAISS-style IVF.

Cell assignment is argmax over the centroid dot products, computed as
`array_position(dots, array_max(dots))` — identical double arithmetic on
both engines, so assignments (and the oracle comparison) are deterministic.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CENTROIDS_FILE = os.path.join(os.path.dirname(__file__), "ivf_centroids.json")

with open(_CENTROIDS_FILE) as _f:
    CENTROIDS: list[list[float]] = json.load(_f)


def _dot_spark(vec_col: str, c: list[float]) -> str:
    arr = "array(" + ", ".join(f"{x}D" for x in c) + ")"
    return (
        f"aggregate(zip_with({vec_col}, {arr},"
        f" (x, y) -> cast(x as double) * y), 0D, (acc, v) -> acc + v)"
    )


def _dot_duckdb(vec_col: str, c: list[float]) -> str:
    # scientific notation parses directly as DOUBLE; a plain decimal
    # literal goes through DECIMAL first and can land 1 ulp off
    arr = "[" + ", ".join(f"{float(x):.17e}" for x in c) + "]"
    return (
        f"list_reduce(list_transform(list_zip({vec_col}, {arr}),"
        f" p -> CAST(p[1] AS DOUBLE) * p[2]), (acc, x) -> acc + x)"
    )


def cell_expr(vec_col: str) -> Column:
    """1-based IVF cell id for an array<float> column (Spark side).

    The dot array is lambda-bound via a 1-element ``transform`` so the
    centroid dot folds run once per row (see kmeans.assign_expr).

    The coalesce makes the column NON-NULLABLE (r15: when the cell is a
    join key, InferFiltersFromConstraints adds ``isnotnull(<key>)`` for
    nullable keys only, and pushing that inferred filter below the
    projection re-inlined this whole centroid-dot expression a second
    time per row on both join sides).

    INGEST INVARIANT (r16, VERDICT r15 item 4): the -1 arm must be
    UNREACHABLE — every caller filters ``<vec_col> IS NOT NULL`` before
    assigning cells (a vector with no embedding has no cell).  Without
    that filter a NULL vector would get cell -1 instead of the nullable
    key's NULL, and two null-vector rows would MATCH in an equi-join on
    the cell — a silent semantic change on dirty data at scale.
    tests/test_ivf_null_hardening.py pins the invariant."""
    dots = "array(" + ", ".join(_dot_spark(vec_col, c) for c in CENTROIDS) + ")"
    return F.coalesce(
        F.expr(
            f"transform(array({dots}), d -> array_position(d, array_max(d)))[0]"
        ).cast("int"),
        F.lit(-1),
    )


def cell_sql(vec_col: str) -> str:
    """Same cell id, DuckDB dialect (list_position of the max dot)."""
    dots = "[" + ", ".join(_dot_duckdb(vec_col, c) for c in CENTROIDS) + "]"
    return f"CAST(list_position({dots}, list_aggregate({dots}, 'max')) AS INTEGER)"


def assign_cells(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("ivf_cell", cell_expr(vec_col))


def top2_cells_expr(vec_col: str) -> Column:
    """array<int> of the query's 1-2 nearest cells (nprobe=2): the argmax
    cell plus the cell of the strictly-second-highest centroid dot (absent
    when all dots tie). Probing the runner-up cell is the IVF recall knob —
    neighbors that fall just across a cell boundary are found without
    touching index layout or partitioning (FAISS-style nprobe)."""
    dots = "array(" + ", ".join(_dot_spark(vec_col, c) for c in CENTROIDS) + ")"
    # bind the dot array (and its max) once via 1-element transforms: the
    # naive form repeated the full centroid-dot fold array five times and
    # codegen CSE skips lambda-bearing expressions (see kmeans.assign_expr)
    inner = (
        "transform(array(array_max(ds)), mx ->"
        " transform(array_distinct(filter(array("
        "array_position(ds, mx),"
        " array_position(ds, array_max(filter(ds, x -> x < mx)))"
        "), x -> x is not null)), x -> cast(x as int)))[0]"
    )
    return F.expr(f"transform(array({dots}), ds -> {inner})[0]")


def top2_cells_sql(vec_col: str) -> str:
    """DuckDB twin of top2_cells_expr (list order may differ — callers
    unnest, so only SET equality matters)."""
    dots = "[" + ", ".join(_dot_duckdb(vec_col, c) for c in CENTROIDS) + "]"
    mx = f"list_aggregate({dots}, 'max')"
    c1 = f"list_position({dots}, {mx})"
    m2 = f"list_aggregate(list_filter({dots}, x -> x < {mx}), 'max')"
    c2 = f"list_position({dots}, {m2})"
    return (
        f"list_transform(list_distinct(list_filter([{c1}, {c2}],"
        f" x -> x IS NOT NULL)), x -> CAST(x AS INTEGER))"
    )


def maxdot_expr(vec_col: str) -> Column:
    """The winning centroid dot product itself (how central a vector sits
    in its cell) — SemDeDup's keep-priority: among near-duplicates the one
    LEAST similar to its centroid is kept (Abbas et al. 2023, SemDeDup)."""
    dots = "array(" + ", ".join(_dot_spark(vec_col, c) for c in CENTROIDS) + ")"
    return F.expr(f"array_max({dots})")


def maxdot_sql(vec_col: str) -> str:
    dots = "[" + ", ".join(_dot_duckdb(vec_col, c) for c in CENTROIDS) + "]"
    return f"list_aggregate({dots}, 'max')"
