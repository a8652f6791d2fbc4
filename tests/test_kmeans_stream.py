"""Mini-batch k-means streaming face (streaming/kmeans_stream.py, the
18th face): per-epoch e6 sufficient-statistics shards SUM-merge to the
exact single-pass statistics (the integer-sums monoid), through a REAL
availableNow stream; the refreshed centroids are one quantized Lloyd
step from the merged ledger; compaction preserves both the model and
the replay contract."""

from __future__ import annotations

import math

from purldb_spark.streaming.kmeans_stream import (
    batch_cell_stats,
    compact_kmeans_shards,
    current_kmeans_stats,
    kmeans_sink,
    refreshed_centroids,
    train_kmeans_batch,
)

SCHEMA = "vec_id long, embedding array<float>"

CENTS = [[0.0, 0.0], [10.0, 10.0]]

_VECS = [
    (0, [0.5, -0.25]),
    (1, [1.0, 0.75]),
    (2, [9.0, 11.0]),
    (3, [10.5, 9.5]),
    (4, [-0.5, 0.125]),
    (5, [11.0, 10.0]),
]


def _stats_rows(df):
    return sorted((r.cluster, r.pos, r.n, r.sum_e6) for r in df.collect())


def test_streamed_shards_equal_single_pass_stats(spark, tmp_path):
    src = str(tmp_path / "incoming")
    stats_dir = str(tmp_path / "stats")
    ckpt = str(tmp_path / "ckpt")
    sink = kmeans_sink(spark, stats_dir, "embedding", CENTS)

    def drain():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for lo, hi in ((0, 2), (2, 5), (5, 6)):
        spark.createDataFrame(_VECS[lo:hi], SCHEMA).write.mode(
            "append"
        ).parquet(src)
        drain()

    streamed = current_kmeans_stats(spark, stats_dir)
    direct = batch_cell_stats(
        spark.createDataFrame(_VECS, SCHEMA), "embedding", CENTS
    )
    assert _stats_rows(streamed) == _stats_rows(direct)

    # refreshed centroids = quantized mean of each cell's members
    ref = refreshed_centroids(spark, stats_dir, CENTS)
    def e6_mean(vals):
        return sum(math.floor(v * 1e6) for v in vals) / 1e6 / len(vals)
    assert ref[0][0] == e6_mean([0.5, 1.0, -0.5])
    assert ref[0][1] == e6_mean([-0.25, 0.75, 0.125])
    assert ref[1][0] == e6_mean([9.0, 10.5, 11.0])
    assert ref[1][1] == e6_mean([11.0, 9.5, 10.0])
    # the e6-quantized step sits within 1e-6 of the exact float mean
    assert abs(ref[0][0] - (0.5 + 1.0 - 0.5) / 3) < 1e-6


def test_replayed_epoch_rewrites_identical_shard(spark, tmp_path):
    stats_dir = str(tmp_path / "stats")
    b = spark.createDataFrame(_VECS[:3], SCHEMA)
    train_kmeans_batch(spark, b, "embedding", CENTS, stats_dir, epoch_id=7)
    before = _stats_rows(current_kmeans_stats(spark, stats_dir))
    train_kmeans_batch(spark, b, "embedding", CENTS, stats_dir, epoch_id=7)
    assert _stats_rows(current_kmeans_stats(spark, stats_dir)) == before


def test_empty_cluster_keeps_frozen_centroid(spark, tmp_path):
    stats_dir = str(tmp_path / "stats")
    only_cell1 = spark.createDataFrame(_VECS[:2], SCHEMA)  # near [0,0]
    train_kmeans_batch(
        spark, only_cell1, "embedding", CENTS, stats_dir, epoch_id=0
    )
    ref = refreshed_centroids(spark, stats_dir, CENTS)
    assert ref[1] == CENTS[1]  # cluster 2 saw no members: keep-old
    assert ref[0] != CENTS[0]


def test_compaction_preserves_stats_and_replay_contract(spark, tmp_path):
    import os

    stats_dir = str(tmp_path / "stats")
    for ep, (lo, hi) in enumerate(((0, 2), (2, 4), (4, 6))):
        train_kmeans_batch(
            spark,
            spark.createDataFrame(_VECS[lo:hi], SCHEMA),
            "embedding",
            CENTS,
            stats_dir,
            epoch_id=ep,
        )
    before = _stats_rows(current_kmeans_stats(spark, stats_dir))
    gen = compact_kmeans_shards(spark, stats_dir)
    assert gen == 1
    assert _stats_rows(current_kmeans_stats(spark, stats_dir)) == before
    # the newest epoch keeps its OWN partition: a replay must overwrite
    # it, not double-count
    train_kmeans_batch(
        spark,
        spark.createDataFrame(_VECS[4:6], SCHEMA),
        "embedding",
        CENTS,
        stats_dir,
        epoch_id=2,
    )
    assert _stats_rows(current_kmeans_stats(spark, stats_dir)) == before
    shards = os.path.join(stats_dir, "gen=1", "shards")
    assert sorted(os.listdir(shards))[-1] == "batch=2"
    # second compaction folds again
    train_kmeans_batch(
        spark,
        spark.createDataFrame(_VECS[0:1], SCHEMA),
        "embedding",
        CENTS,
        stats_dir,
        epoch_id=3,
    )
    assert compact_kmeans_shards(spark, stats_dir) == 2


def test_compaction_noop_below_two_shards(spark, tmp_path):
    stats_dir = str(tmp_path / "stats")
    assert compact_kmeans_shards(spark, stats_dir) is None
    train_kmeans_batch(
        spark,
        spark.createDataFrame(_VECS[:2], SCHEMA),
        "embedding",
        CENTS,
        stats_dir,
        epoch_id=0,
    )
    assert compact_kmeans_shards(spark, stats_dir) is None
