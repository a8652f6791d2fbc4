"""r16 focused test (VERDICT r15 item 4): NULL embeddings cannot reach
cell_expr's non-nullable -1 arm.

cell_expr's coalesce(..., -1) exists so the IVF cell join key is
non-nullable (r15: stops InferFiltersFromConstraints re-inlining the
centroid-dot argmax below the join).  The r15 verdict flagged the scale
landmine: on dirty data a NULL vector would get cell -1 — and two
vectorless rows would MATCH each other in the equi-join — where the old
nullable key silently dropped them.  r16 adds an explicit
``embedding IS NOT NULL`` filter at every cell-assignment ingest site, so
the -1 arm is unreachable by construction.

The pin: adding a NULL-embedding row to a corpus changes NOTHING in the
cell-joined query outputs (identical rows with and without the dirty row).
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

CLEAN_SF = "/root/testdata/sf0.001"

QUERIES_UNDER_TEST = [
    "knn_ivf_cell",
    "knn_ivf_nprobe2",
    "dedup_semantic",
    "knn_ivfpq",
]


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory):
    """sf0.001 with one extra embeddings row whose vector is NULL."""
    root = tmp_path_factory.mktemp("dirty_sf")
    for name in ("embeddings", "documents"):
        shutil.copy(f"{CLEAN_SF}/{name}.parquet", root / f"{name}.parquet")
    t = pq.read_table(root / "embeddings.parquet")
    fields = [
        pa.field(f.name, f.type, nullable=True) for f in t.schema
    ]
    schema = pa.schema(fields)
    t = t.cast(schema)
    null_row = pa.table(
        {
            f.name: pa.array(
                [999_999 if f.name == "vec_id" else None], type=f.type
            )
            for f in schema
        },
        schema=schema,
    )
    pq.write_table(
        pa.concat_tables([t, null_row]), root / "embeddings.parquet"
    )
    return str(root)


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_null_embedding_row_changes_nothing(spark, name, dirty_sf):
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    clean = sorted(
        map(repr, QUERIES[name](spark, CLEAN_SF).collect())
    )
    dirty = sorted(
        map(repr, QUERIES[name](spark, dirty_sf).collect())
    )
    assert clean == dirty, (
        f"{name}: a NULL-embedding row leaked into the cell join "
        "(cell_expr's -1 arm must be unreachable)"
    )
    assert clean  # non-degenerate: the queries emit rows at sf0.001
