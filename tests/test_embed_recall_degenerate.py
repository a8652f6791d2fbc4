"""Regression test for the ADVICE-r10 embed_recall_blocked oracle fix:
on a degenerate corpus with NO ground-truth pairs (no cosine >= 0.4),
both engines must emit the same 2 zero rows — the old oracle derived its
output cardinality from the gt CTE and emitted 0 rows while the Spark
side's global aggregates always emit one row per method."""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture()
def degenerate_sf(spark, tmp_path):
    """An sf dir whose embeddings are mutually (near-)orthogonal 64-dim
    vectors: every cross cosine is ~0, far below the 0.4 gate."""
    dim = 64
    rows = []
    for i in range(12):
        v = [0.0] * dim
        v[i] = 1.0  # one-hot basis vectors: exactly orthogonal
        rows.append((i, v))
    sf = str(tmp_path / "sf_degenerate")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").coalesce(
        1
    ).write.parquet(sf + "/embeddings.parquet")
    return sf


def test_both_engines_emit_two_zero_rows(spark, degenerate_sf):
    from purldb_spark.plans.registry import ORACLES, QUERIES, load_inventory

    load_inventory()
    sp = (
        QUERIES["embed_recall_blocked"](spark, degenerate_sf)
        .toPandas()
        .sort_values("method")
    )
    assert len(sp) == 2
    assert set(sp["method"]) == {"blocked_single_probe", "blocked_multiprobe"}
    assert (sp["hits"] == 0).all() and (sp["possible"] == 0).all()
    assert (sp["recall_e6"] == 0).all() and (sp["cand_precision_e6"] == 0).all()

    con = duckdb.connect()
    # Spark wrote a parquet DIRECTORY; DuckDB reads it via the part glob
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{degenerate_sf}/embeddings.parquet/*.parquet'"
    )
    du = con.execute(ORACLES["embed_recall_blocked"]).fetchdf().sort_values(
        "method"
    )
    assert len(du) == 2
    cols = sorted(sp.columns)
    assert sorted(du.columns) == cols
    assert sorted(map(repr, sp[cols].itertuples(index=False))) == sorted(
        map(repr, du[cols].itertuples(index=False))
    )
