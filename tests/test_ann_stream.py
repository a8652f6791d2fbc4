"""Streaming ANN index maintenance: micro-batched add-after-train —
batch-equivalence of the streamed index, replay idempotence, and probe
parity with the batch fully-trained query's coarse stage."""

from __future__ import annotations

from purldb_spark.plans.fixture_cache import (
    kmeans_cell_index,
    trained_centroids,
    trained_pq_code_index,
    trained_pq_codebooks,
)
from purldb_spark.streaming.ann_stream import (
    ann_index_sink,
    codes_path,
    index_batch,
    probe_index,
)
from tests.conftest import SF_SMOKE

_K, _ITERS = 8, 3
_M, _KSUB, _PQI = 8, 16, 2


def _model(spark):
    cents = trained_centroids(spark, SF_SMOKE, _K, _ITERS)
    books = trained_pq_codebooks(spark, SF_SMOKE, _M, _KSUB, _PQI)
    return cents, books


def test_streamed_index_equals_batch_rebuild(spark, tmp_path):
    """Feeding the corpus through foreachBatch micro-batches yields the
    SAME (vec_id, cell, codes) rows as the batch fixtures compute."""
    cents, books = _model(spark)
    src = str(tmp_path / "incoming")
    idx_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    half = vecs.count() // 2
    vecs.filter(f"vec_id < {half}").write.mode("append").parquet(src)

    def drain():
        q = (
            spark.readStream.schema(vecs.schema)
            .parquet(src)
            .writeStream.foreachBatch(
                ann_index_sink(spark, cents, books, idx_dir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    vecs.filter(f"vec_id >= {half}").write.mode("append").parquet(src)
    drain()

    streamed = {
        r["vec_id"]: (r["cell"], tuple(r[f"c{i}"] for i in range(_M)))
        for r in spark.read.parquet(codes_path(idx_dir)).collect()
    }
    cells = {
        r["vec_id"]: r["cell"]
        for r in kmeans_cell_index(spark, SF_SMOKE, _K, _ITERS).collect()
    }
    codes: dict[int, dict[int, int]] = {}
    for r in trained_pq_code_index(
        spark, SF_SMOKE, _M, _KSUB, _PQI
    ).collect():
        codes.setdefault(r["vec_id"], {})[r["subspace"]] = r["cluster"] - 1
    assert set(streamed) == set(cells)
    for v, (cell, cs) in streamed.items():
        assert cell == cells[v], v
        assert cs == tuple(codes[v][s] for s in range(_M)), v


def test_index_batch_replay_is_idempotent(spark, tmp_path):
    cents, books = _model(spark)
    idx_dir = str(tmp_path / "index")
    vecs = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(20)
    )
    index_batch(spark, vecs, cents, books, idx_dir)
    snap = sorted(map(tuple, spark.read.parquet(codes_path(idx_dir)).collect()))
    index_batch(spark, vecs, cents, books, idx_dir)  # crash-and-replay
    assert sorted(map(tuple, spark.read.parquet(codes_path(idx_dir)).collect())) == snap


def test_probe_over_streamed_index_matches_cell_semantics(spark, tmp_path):
    """Every probe result shares the query's trained cell, ranks follow
    exact distance, and the top-1 equals a driver-side argmin over the
    query's cell members."""
    cents, books = _model(spark)
    idx_dir = str(tmp_path / "index")
    vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    index_batch(spark, vecs, cents, books, idx_dir)

    queries = vecs.filter("vec_id % 25 = 0")
    out = probe_index(spark, idx_dir, queries, vecs, cents, k=2).collect()
    assert out
    cells = {
        r["vec_id"]: r["cell"]
        for r in spark.read.parquet(codes_path(idx_dir)).collect()
    }
    emb = {r["vec_id"]: list(r["embedding"]) for r in vecs.collect()}
    by_q: dict[int, list] = {}
    for r in out:
        assert cells[r["vec_id"]] == cells[r["q_vec_id"]]
        by_q.setdefault(r["q_vec_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        for a, b in zip(rs, rs[1:]):
            assert (a["exact_d"], a["vec_id"]) < (b["exact_d"], b["vec_id"])
        # driver-recomputed argmin over the cell
        best = min(
            (
                (
                    sum(
                        (float(x) - float(y)) ** 2
                        for x, y in zip(emb[qid], emb[v])
                    ),
                    v,
                )
                for v, c in cells.items()
                if c == cells[qid] and v != qid
            ),
        )
        assert rs[0]["vec_id"] == best[1], qid


def test_ann_compaction_preserves_probe_and_retention_drops(spark, tmp_path):
    """r13: the ANN codes table gets the generation protocol — a
    mid-stream compaction (cell-clustered rewrite + pointer swap)
    changes no probe result; retention drops a vector from the index
    (FAISS remove_ids as maintenance); post-compaction appends land in
    the live generation."""
    from purldb_spark.streaming.compact_stream import (
        compact_ann_index,
        prune_generations,
    )

    cents, books = _model(spark)
    vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    half1 = vecs.filter("vec_id % 2 = 0")
    half2 = vecs.filter("vec_id % 2 = 1")
    idx_dir = str(tmp_path / "annidx")

    index_batch(spark, half1, cents, books, idx_dir)
    queries = vecs.limit(5)
    before = sorted(
        map(tuple, probe_index(spark, idx_dir, queries, vecs, cents).collect())
    )
    gen = compact_ann_index(spark, idx_dir)
    assert gen == 1
    prune_generations(idx_dir)
    after = sorted(
        map(tuple, probe_index(spark, idx_dir, queries, vecs, cents).collect())
    )
    assert after == before

    # post-compaction append lands in the generation and is probed
    index_batch(spark, half2, cents, books, idx_dir)
    n_all = spark.read.parquet(codes_path(idx_dir)).count()
    assert n_all == vecs.count()

    # retention: drop the odd vectors again; probe shortlist loses them
    compact_ann_index(spark, idx_dir, retained_vecs=half1.select("vec_id"))
    kept = {
        r.vec_id
        for r in spark.read.parquet(codes_path(idx_dir))
        .select("vec_id")
        .collect()
    }
    assert kept == {r.vec_id for r in half1.select("vec_id").collect()}
