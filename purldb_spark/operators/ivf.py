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
    arr = "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in c) + "]"
    return (
        f"list_reduce(list_transform(list_zip({vec_col}, {arr}),"
        f" p -> CAST(p[1] AS DOUBLE) * p[2]), (acc, x) -> acc + x)"
    )


def cell_expr(vec_col: str) -> Column:
    """1-based IVF cell id for an array<float> column (Spark side)."""
    dots = "array(" + ", ".join(_dot_spark(vec_col, c) for c in CENTROIDS) + ")"
    return F.expr(f"array_position({dots}, array_max({dots}))").cast("int")


def cell_sql(vec_col: str) -> str:
    """Same cell id, DuckDB dialect (list_position of the max dot)."""
    dots = "[" + ", ".join(_dot_duckdb(vec_col, c) for c in CENTROIDS) + "]"
    return f"CAST(list_position({dots}, list_aggregate({dots}, 'max')) AS INTEGER)"


def assign_cells(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("ivf_cell", cell_expr(vec_col))
