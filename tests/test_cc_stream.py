"""Incremental connected-components maintenance (streaming/cc_stream.py):
streamed labels == one-shot batch CC regardless of pair arrival order,
cross-batch merges converge to the global component minimum, untouched
components are carried forward unrecomputed, replay is idempotent."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.operators.dedup import connected_components
from purldb_spark.streaming.cc_stream import (
    cc_sink,
    current_labels,
    merge_pairs_batch,
)

SCHEMA = T.StructType(
    [T.StructField("doc_a", T.LongType()), T.StructField("doc_b", T.LongType())]
)

# batch 1 creates components {5,7} and {10,12}; batch 2 bridges them via
# 7-10 (merged min = 5) and opens a new one {20,21}; batch 3 attaches 1
# to the merged component, dropping its min to 1 — a 3-hop cross-batch
# label cascade — and leaves {20,21} untouched
BATCH1 = [(5, 7), (10, 12)]
BATCH2 = [(7, 10), (20, 21)]
BATCH3 = [(1, 12)]


def _labels(spark, labels_dir):
    df = current_labels(spark, labels_dir)
    return {(r.node, r.label) for r in df.collect()} if df is not None else set()


def _batch_cc(spark, pairs):
    df = spark.createDataFrame(pairs, SCHEMA)
    return {
        (r.node, r.label)
        for r in connected_components(df, "doc_a", "doc_b").collect()
    }


def test_streamed_equals_batch_cc_with_cross_batch_merges(spark, tmp_path):
    labels_dir = str(tmp_path / "labels")
    for epoch, batch in enumerate([BATCH1, BATCH2, BATCH3]):
        merge_pairs_batch(
            spark, spark.createDataFrame(batch, SCHEMA), labels_dir, epoch
        )
        assert _labels(spark, labels_dir) == _batch_cc(
            spark, [p for b in [BATCH1, BATCH2, BATCH3][: epoch + 1] for p in b]
        )
    # the merged component's label is the global min across three batches
    final = dict(_labels(spark, labels_dir))
    assert final[12] == 1 and final[5] == 1 and final[7] == 1
    assert final[20] == 20 and final[21] == 20


def test_replay_is_idempotent_and_heals_partial_snapshot(spark, tmp_path):
    import os

    labels_dir = str(tmp_path / "labels")
    merge_pairs_batch(
        spark, spark.createDataFrame(BATCH1, SCHEMA), labels_dir, 0
    )
    merge_pairs_batch(
        spark, spark.createDataFrame(BATCH2, SCHEMA), labels_dir, 1
    )
    want = _labels(spark, labels_dir)

    # simulate a crash mid-write of epoch 1's snapshot: clobber it with a
    # partial row set, then replay epoch 1 — the body reads strictly
    # below its own epoch, so it recomputes from epoch 0 and heals
    partial = spark.createDataFrame([(5, 5)], "node long, label long")
    partial.write.mode("overwrite").parquet(
        os.path.join(labels_dir, "batch=1")
    )
    merge_pairs_batch(
        spark, spark.createDataFrame(BATCH2, SCHEMA), labels_dir, 1
    )
    assert _labels(spark, labels_dir) == want


def test_untouched_components_carry_forward_via_stream(spark, tmp_path):
    """Drain through a real availableNow stream; the {20,21} component is
    untouched by batch 3 and must survive relabeling byte-identical."""
    src = str(tmp_path / "incoming")
    labels_dir = str(tmp_path / "labels")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(cc_sink(spark, labels_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for batch in (BATCH1, BATCH2, BATCH3):
        spark.createDataFrame(batch, SCHEMA).write.mode("append").parquet(src)
        drain()
    assert _labels(spark, labels_dir) == _batch_cc(
        spark, BATCH1 + BATCH2 + BATCH3
    )


def test_internal_edge_into_giant_component_relabels_nothing(spark, tmp_path):
    """The mega-component hazard: one batch edge INTERNAL to a large
    pre-existing component must be dropped before the affected subgraph is
    built (novel_pairs -> empty), so relabel work is zero — not O(giant
    component) — and the snapshot is carried forward unchanged."""
    from purldb_spark.streaming.cc_stream import novel_pairs

    labels_dir = str(tmp_path / "labels")
    # a 500-node chain: one big component labeled 0
    chain = [(i, i + 1) for i in range(500)]
    merge_pairs_batch(spark, spark.createDataFrame(chain, SCHEMA), labels_dir, 0)
    before = _labels(spark, labels_dir)
    assert {lab for _, lab in before} == {0}

    internal = spark.createDataFrame([(17, 433)], SCHEMA)
    prior = current_labels(spark, labels_dir)
    # the relabel subgraph's seed edge set is EMPTY for internal edges
    assert novel_pairs(internal, prior).count() == 0

    merge_pairs_batch(spark, internal, labels_dir, 1)
    assert _labels(spark, labels_dir) == before


def test_novel_pairs_keeps_merging_and_unlabeled_edges(spark):
    prior = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 10), (11, 10)], "node long, label long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 10), (10, 99)], SCHEMA
    )  # internal / cross-component / half-unlabeled
    from purldb_spark.streaming.cc_stream import novel_pairs

    got = {(r.doc_a, r.doc_b) for r in novel_pairs(pairs, prior).collect()}
    assert got == {(2, 10), (10, 99)}


def test_prune_epochs_keeps_latest_committed(spark, tmp_path):
    import os

    from purldb_spark.streaming.cc_stream import latest_epoch, prune_epochs

    labels_dir = str(tmp_path / "labels")
    for epoch, batch in enumerate([BATCH1, BATCH2, BATCH3]):
        merge_pairs_batch(
            spark, spark.createDataFrame(batch, SCHEMA), labels_dir, epoch
        )
    want = _labels(spark, labels_dir)
    removed = prune_epochs(labels_dir, keep=2)
    assert removed == [os.path.join(labels_dir, "batch=0")]
    assert latest_epoch(labels_dir) == 2
    assert _labels(spark, labels_dir) == want
    # replay of the latest epoch still finds its predecessor (keep >= 2)
    merge_pairs_batch(
        spark, spark.createDataFrame(BATCH3, SCHEMA), labels_dir, 2
    )
    assert _labels(spark, labels_dir) == want


def test_mega_component_merge_defers_and_flushes(spark, tmp_path):
    """max_component routing: an edge that would relabel a component
    bigger than the cap is deferred (labels untouched, per-batch bound
    O(batch x cap)); flush_deferred folds it in with one uncapped pass
    and the result equals batch CC over everything. Small merges stay
    inline; a replayed capped batch overwrites its deferral partition."""
    from purldb_spark.streaming.cc_stream import flush_deferred

    labels_dir = str(tmp_path / "labels")
    deferred_dir = str(tmp_path / "deferred")
    chain = [(i, i + 1) for i in range(500)]  # giant component, label 0
    merge_pairs_batch(spark, spark.createDataFrame(chain, SCHEMA), labels_dir, 0)
    merge_pairs_batch(
        spark, spark.createDataFrame([(900, 901)], SCHEMA), labels_dir, 1
    )
    before = _labels(spark, labels_dir)

    # batch 2: (17, 900) bridges giant+small -> DEFERRED under cap=100;
    # (950, 951) is a fresh singleton edge -> merged inline
    merge_pairs_batch(
        spark,
        spark.createDataFrame([(17, 900), (950, 951)], SCHEMA),
        labels_dir,
        2,
        max_component=100,
        deferred_dir=deferred_dir,
    )
    after = dict(_labels(spark, labels_dir))
    assert after[900] == 900 and after[901] == 900  # NOT yet merged
    assert after[950] == 950 and after[951] == 950  # inline merge landed
    assert after[17] == 0
    import os

    assert os.path.isdir(os.path.join(deferred_dir, "batch=2"))

    # replay of the capped batch: deferral partition overwritten, labels
    # unchanged (novel_pairs drops the already-merged inline edge)
    merge_pairs_batch(
        spark,
        spark.createDataFrame([(17, 900), (950, 951)], SCHEMA),
        labels_dir,
        2,
        max_component=100,
        deferred_dir=deferred_dir,
    )
    assert dict(_labels(spark, labels_dir)) == after

    # flush folds the deferred bridge in; result == batch CC over all
    assert flush_deferred(spark, labels_dir, deferred_dir, 100) == 1
    want = _batch_cc(
        spark, chain + [(900, 901), (17, 900), (950, 951)]
    )
    assert _labels(spark, labels_dir) == want
    # crash-idempotence: a second flush is a no-op with nothing pending
    assert flush_deferred(spark, labels_dir, deferred_dir, 101) == 0
    assert _labels(spark, labels_dir) == want


def test_randomized_arrival_orders_converge_to_batch_cc(spark, tmp_path):
    """Deterministic-seed randomized pin: random edge sets, random batch
    splits, random caps — after every batch (and a final flush when a
    cap deferred anything) the labels equal batch CC over the edges
    applied so far. This is the convergent-monotone claim exercised
    beyond hand-picked topologies."""
    import random

    from purldb_spark.streaming.cc_stream import flush_deferred

    for seed in (11, 23):
        rng = random.Random(seed)
        nodes = list(range(30))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(25)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        rng.shuffle(edges)
        cut1, cut2 = sorted(rng.sample(range(1, len(edges)), 2))
        batches = [edges[:cut1], edges[cut1:cut2], edges[cut2:]]
        cap = rng.choice([None, 5])

        labels_dir = str(tmp_path / f"labels{seed}")
        deferred_dir = str(tmp_path / f"deferred{seed}")
        for epoch, batch in enumerate(batches):
            merge_pairs_batch(
                spark,
                spark.createDataFrame(batch, SCHEMA),
                labels_dir,
                epoch,
                max_component=cap,
                deferred_dir=deferred_dir if cap else None,
            )
        if cap:
            # each flush needs a FRESH epoch above every prior one (a
            # reused epoch would read strictly below itself and discard
            # the previous flush's snapshot)
            ep = 100
            while flush_deferred(spark, labels_dir, deferred_dir, ep):
                ep += 1
        assert _labels(spark, labels_dir) == _batch_cc(spark, edges)
