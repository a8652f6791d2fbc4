"""Incremental SimHash dedup (streaming/simhash_stream.py): streamed
pair detection equals the batch wide_near_pairs math, replay is
idempotent, and the index stores the banded 120-bit layout."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from purldb_spark.operators.simhash_wide import wide_near_pairs
from purldb_spark.streaming.simhash_stream import (
    batch_fingerprints,
    index_simhash_batch,
    simhash_sink,
)

SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)

# a LONG document so one changed word flips few of the 120 vote bits:
# per-bit vote margins grow ~sqrt(#shingles), so at 600 words the 3
# changed shingles land hamming 2 (measured) — inside the <=3 pigeonhole
WORDS = " ".join(f"w{i}" for i in range(600))
NEAR = " ".join("zz" if i == 300 else f"w{i}" for i in range(600))
FAR = (
    "entirely different content about spark streaming state stores and "
    "checkpoint lineage with no shared vocabulary at all whatsoever in "
    "any window of this text stream pipeline run today tomorrow"
)


def _pairs(spark, pairs_dir):
    if not os.path.isdir(pairs_dir):
        return set()
    return {
        (r.new_id, r.index_id, r.hamming)
        for r in spark.read.parquet(pairs_dir).collect()
    }


def test_streamed_equals_batch_and_replay_idempotent(spark, tmp_path):
    index_dir = str(tmp_path / "simindex")
    pairs_dir = str(tmp_path / "simpairs")

    all_docs = spark.createDataFrame(
        [(1, WORDS), (9, FAR)] + [(2, NEAR)], SCHEMA
    )
    batch_pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in wide_near_pairs(
            batch_fingerprints(all_docs), "doc_id"
        ).collect()
    }
    # precondition: the synthetic near-dup is within the hamming budget
    assert any(a == 1 and b == 2 for a, b, _ in batch_pairs)

    index_simhash_batch(
        spark, spark.createDataFrame([(1, WORDS), (9, FAR)], SCHEMA),
        index_dir, pairs_dir,
    )
    assert _pairs(spark, pairs_dir) == set()  # no prior index
    index_simhash_batch(
        spark, spark.createDataFrame([(2, NEAR)], SCHEMA),
        index_dir, pairs_dir,
    )
    got = _pairs(spark, pairs_dir)
    # streamed pairs == batch pairs (orientation: new vs stored)
    assert {(min(a, b), max(a, b), h) for a, b, h in got} == {
        (min(a, b), max(a, b), h) for a, b, h in batch_pairs
    }

    # replay appends nothing (index rows or decisions)
    n_bands = spark.read.parquet(index_dir + "/simbands").count()
    index_simhash_batch(
        spark, spark.createDataFrame([(2, NEAR)], SCHEMA),
        index_dir, pairs_dir,
    )
    assert spark.read.parquet(index_dir + "/simbands").count() == n_bands
    assert _pairs(spark, pairs_dir) == got
    # banded layout: 4 rows per doc, fingerprint inlined
    assert n_bands == 3 * 4


def test_sink_drains_through_a_real_stream(spark, tmp_path):
    src = str(tmp_path / "in")
    index_dir = str(tmp_path / "simindex")
    pairs_dir = str(tmp_path / "simpairs")
    ckpt = str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(simhash_sink(spark, index_dir, pairs_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for batch in ([(1, WORDS), (9, FAR)], [(2, NEAR)]):
        spark.createDataFrame(batch, SCHEMA).write.mode("append").parquet(src)
        drain()
    assert {(a, b) for a, b, _ in _pairs(spark, pairs_dir)} == {(2, 1)}


def test_within_batch_near_dups_pair_in_same_epoch(spark, tmp_path):
    """r12 ADVICE: docs arriving in the SAME micro-batch must still pair
    — before the in-batch self-join, both got indexed and the
    replay/seen anti-joins made the miss permanent. Orientation matches
    the cross-batch shape: new_id = larger doc id (as if the smaller had
    been indexed first)."""
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")

    # near-dup pair AND an unrelated doc, all in one batch
    index_simhash_batch(
        spark,
        spark.createDataFrame([(1, WORDS), (2, NEAR), (9, FAR)], SCHEMA),
        index_dir,
        pairs_dir,
    )
    got = _pairs(spark, pairs_dir)
    assert any(a == 2 and b == 1 for a, b, _ in got), got
    assert not any(9 in (a, b) for a, b, _ in got)

    # replay of the same batch appends nothing (docs already indexed)
    index_simhash_batch(
        spark,
        spark.createDataFrame([(1, WORDS), (2, NEAR), (9, FAR)], SCHEMA),
        index_dir,
        pairs_dir,
    )
    assert _pairs(spark, pairs_dir) == got

    # and a later cross-batch arrival still pairs against the index
    index_simhash_batch(
        spark,
        spark.createDataFrame([(3, NEAR)], SCHEMA),
        index_dir,
        pairs_dir,
    )
    got2 = _pairs(spark, pairs_dir)
    assert any(a == 3 and b in (1, 2) for a, b, _ in got2)


def test_compaction_mid_stream_preserves_pairs_and_prunes(spark, tmp_path):
    """The compaction face the module docstring promised (r13,
    compact_stream.compact_simhash_index): batch -> compact -> batch
    detects the same pairs as the uncompacted stream; reads/appends
    resolve through the generation pointer; pruning removes the legacy
    layout without touching the live generation."""
    import os

    from purldb_spark.streaming.compact_stream import (
        compact_simhash_index,
        prune_generations,
        table_path,
    )

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")

    index_simhash_batch(
        spark,
        spark.createDataFrame([(1, WORDS), (9, FAR)], SCHEMA),
        index_dir,
        pairs_dir,
    )
    gen = compact_simhash_index(spark, index_dir)
    assert gen == 1
    assert table_path(index_dir, "simbands").endswith("gen=1/simbands")
    removed = prune_generations(index_dir)
    assert any(p.endswith("simbands") for p in removed)  # legacy flat dir

    # post-compaction batch probes (and appends to) the new generation
    index_simhash_batch(
        spark, spark.createDataFrame([(2, NEAR)], SCHEMA), index_dir, pairs_dir
    )
    assert {(a, b) for a, b, _ in _pairs(spark, pairs_dir)} == {(2, 1)}
    rows = spark.read.parquet(table_path(index_dir, "simbands"))
    assert rows.select("doc_id").distinct().count() == 3


def test_compaction_retention_forgets_evicted_docs(spark, tmp_path):
    """TTL semi-join: an evicted doc's fingerprints leave the index, so
    a later near-dup of it pairs against nothing (the forget-the-window
    contract), while retained docs keep pairing."""
    from purldb_spark.streaming.compact_stream import compact_simhash_index

    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")

    index_simhash_batch(
        spark,
        spark.createDataFrame([(1, WORDS), (9, FAR)], SCHEMA),
        index_dir,
        pairs_dir,
    )
    retained = spark.createDataFrame([(9,)], "doc_id long")
    compact_simhash_index(spark, index_dir, retained_docs=retained)

    index_simhash_batch(
        spark, spark.createDataFrame([(2, NEAR)], SCHEMA), index_dir, pairs_dir
    )
    # doc 1 was evicted: its near-dup 2 finds no partner
    assert _pairs(spark, pairs_dir) == set()
