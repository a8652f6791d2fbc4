"""Capstone: the multimodal column feeds similarity search end-to-end —
binary blobs stream through REAL decode (media_stream), REAL feature
extraction (embed_media), and the trained ANN index (ann_stream), then a
query blob retrieves its visual/acoustic near-neighbour by cell probe.
Everything rides the faces the individual suites pin; this test pins the
COMPOSITION: one foreachBatch body maintaining both the stats ledger and
the feature index, replay-idempotent end to end."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.multimodal.binaryops import embed_media, encode_bmp, encode_wav
from purldb_spark.operators.kmeans import kmeans_fit
from purldb_spark.streaming.ann_stream import index_batch, probe_index
from purldb_spark.streaming.media_stream import index_media_batch

SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _corpus():
    rows = []
    # two visual families: dark-blue images (ids 1-4) and bright-red
    # (ids 5-8), plus loud vs quiet audio (ids 11-14 / 15-18)
    for i in range(1, 5):
        rows.append((i, "image/bmp", bytearray(encode_bmp(6, 4, (200, 10 + i, 10)))))
    for i in range(5, 9):
        rows.append((i, "image/bmp", bytearray(encode_bmp(6, 4, (10, 10 + i, 220)))))
    for i in range(11, 15):
        rows.append(
            (i, "audio/wav",
             bytearray(encode_wav(8000, 1, 16, [20000 + 100 * i, -20000] * 30)))
        )
    for i in range(15, 19):
        rows.append(
            (i, "audio/wav",
             bytearray(encode_wav(8000, 1, 16, [500 + 10 * i, -500] * 30)))
        )
    return rows


def _features(spark, rows):
    return embed_media(spark.createDataFrame(rows, SCHEMA)).select(
        F.col("media_id").alias("vec_id"), "embedding"
    )


from pyspark.sql import functions as F  # noqa: E402


def test_blobs_to_similarity_search(spark, tmp_path):
    stats_dir = str(tmp_path / "stats")
    idx_dir = str(tmp_path / "annidx")
    rows = _corpus()

    # train the coarse quantizer on the corpus features (the offline
    # training job; 4 cells over 16 dims, 16-dim PQ in 8 subspaces)
    feats = _features(spark, rows)
    cents = kmeans_fit(feats, "embedding", "vec_id", 4, 4)
    books = [
        kmeans_fit(
            feats.select(
                "vec_id",
                F.expr(f"slice(embedding, {si * 2 + 1}, 2)").alias("sub"),
            ),
            "sub",
            "vec_id",
            4,
            2,
        )
        for si in range(8)
    ]

    # stream the blobs in two micro-batches through ONE body: stats
    # ledger + feature index
    def body(batch_rows):
        batch = spark.createDataFrame(batch_rows, SCHEMA)
        index_media_batch(spark, batch, stats_dir)
        index_batch(spark, _features(spark, batch_rows), cents, books, idx_dir)

    body(rows[:8])
    body(rows[8:])
    body(rows[8:])  # replayed epoch: both sinks append nothing

    assert spark.read.parquet(stats_dir).count() == len(rows)

    # query: a NEW dark-blue image retrieves a dark-blue neighbour, a
    # NEW quiet wav retrieves a quiet one — similarity in REAL feature
    # space, probed through the trained cells
    q_rows = [
        (100, "image/bmp", bytearray(encode_bmp(6, 4, (205, 12, 12)))),
        (200, "audio/wav",
         bytearray(encode_wav(8000, 1, 16, [600, -510] * 30))),
    ]
    queries = _features(spark, q_rows)
    vectors = _features(spark, rows + q_rows)
    got = probe_index(spark, idx_dir, queries, vectors, cents, k=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_vec_id, []).append(r.vec_id)
    assert by_q[100] and all(v in range(1, 5) for v in by_q[100]), by_q
    assert by_q[200] and all(v in range(15, 19) for v in by_q[200]), by_q


def test_pair_alignment_qa_flag_quality(spark):
    """The alignment flag must be PERFECT on the synthetic construction:
    every corrupted pair flagged (the +64 channel shift provably leaves
    the text's 250-wide e3 cell, so a corrupted pair can never retrieve
    itself) and every clean pair aligned at distance 0 (solid colors
    decode exactly; its own image is in the cell at L1 = 0, and the id
    tie-break cannot displace it unless another doc carries the
    identical triple — absent at this scale)."""
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    rows = QUERIES["mm_pair_alignment_qa"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.corrupted == (r.pair_id % 17 == 3)
        assert r.aligned == (not r.corrupted)
        if r.aligned:
            assert r.retrieved_id == r.pair_id and r.dist_e3 == 0
        else:
            assert r.retrieved_id != r.pair_id
