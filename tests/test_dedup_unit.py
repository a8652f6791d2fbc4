"""Dedup operator unit tests: incremental LSH flow and empty/degenerate
inputs (the edges the oracle queries' fixed datasets don't hit)."""

from __future__ import annotations

from pyspark.sql import functions as F

from purldb_spark.operators.dedup import (
    incremental_lsh_dedup,
    lsh_candidate_pairs,
    minhash_bands,
    simhash,
    simhash_near_pairs,
    verify_jaccard,
    word_shingles,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "the quick brown fox jumps over the lazy cat today"),  # near-dup of 1
    (3, "completely different words about spark query engines here now"),
]


def test_incremental_dedup_finds_near_dup_against_index(spark):
    corpus = spark.createDataFrame(DOCS, ["doc_id", "text"])
    sh = word_shingles(corpus, "doc_id", "text", n=3)
    index_bands = minhash_bands(
        sh.filter(F.col("doc_id").isin(1, 3)), "doc_id"
    )  # docs 1,3 already indexed
    new_bands = minhash_bands(sh.filter(F.col("doc_id") == 2), "doc_id")

    cands = incremental_lsh_dedup(new_bands, index_bands, "doc_id")
    pairs = {(r.new_id, r.index_id) for r in cands.collect()}
    assert (2, 1) in pairs  # near-dup found against the index
    assert (2, 3) not in pairs  # unrelated doc shares no band

    verified = verify_jaccard(
        cands.withColumnRenamed("new_id", "id_a").withColumnRenamed(
            "index_id", "id_b"
        ),
        sh,
        "doc_id",
        threshold=0.5,
    )
    rows = verified.collect()
    assert len(rows) == 1 and rows[0].id_a == 2 and rows[0].id_b == 1
    assert rows[0].jaccard >= 0.6  # 6 shared of 8+8-6 shingles


def test_empty_inputs_produce_empty_outputs(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    sh = word_shingles(empty, "doc_id", "text")
    assert sh.count() == 0
    bands = minhash_bands(sh, "doc_id")
    assert bands.count() == 0
    assert lsh_candidate_pairs(bands, "doc_id").count() == 0
    sim = simhash(
        spark.createDataFrame([], "doc_id long, tok string"), "doc_id"
    )
    assert sim.count() == 0
    assert simhash_near_pairs(sim, "doc_id").count() == 0


def test_short_documents_are_skipped_not_crashed(spark):
    # docs shorter than the shingle width would hit Spark's backward
    # sequence() — the guard drops them
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "a much longer document with enough words here")],
        ["doc_id", "text"],
    )
    sh = word_shingles(docs, "doc_id", "text", n=3)
    ids = {r.doc_id for r in sh.select("doc_id").distinct().collect()}
    assert ids == {2}


def test_connected_components_deep_chain(spark):
    from purldb_spark.operators.dedup import connected_components

    # a 9-node path: diameter 8 — propagation must still converge within
    # the default iteration cap
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)] + [(20, 21)], ["a", "b"]
    )
    got = {
        r["node"]: r["label"]
        for r in connected_components(edges, "a", "b").collect()
    }
    assert all(got[n] == 1 for n in range(1, 10))
    assert got[20] == 20 and got[21] == 20


def test_connected_components_early_exit(spark):
    from purldb_spark.operators.dedup import connected_components

    # a 5-clique (the near-dup shape): neighbor-min resolves every label
    # in wave 1, wave 2 observes zero changes and breaks — far under the
    # max_iter=10 safety bound
    edges = spark.createDataFrame(
        [(i, j) for i in range(1, 6) for j in range(i + 1, 6)], ["a", "b"]
    )
    stats: dict = {}
    got = {
        r["node"]: r["label"]
        for r in connected_components(edges, "a", "b", stats=stats).collect()
    }
    assert got == {n: 1 for n in range(1, 6)}
    assert stats["waves"] <= 3

    # the deep chain from the test above needs more waves but still exits
    # before the bound
    chain = spark.createDataFrame([(i, i + 1) for i in range(1, 9)], ["a", "b"])
    stats2: dict = {}
    connected_components(chain, "a", "b", stats=stats2).collect()
    assert stats2["waves"] < 10


def test_contamination_overlap_counts(spark):
    from purldb_spark.operators.dedup import contamination_overlap

    corpus = spark.createDataFrame(
        [(1, "a b"), (1, "b c"), (2, "x y")], ["doc_id", "sh"]
    )
    bench = spark.createDataFrame([("a b",), ("a b",), ("q r",)], ["sh"])
    rows = contamination_overlap(corpus, bench).collect()
    # doc 2 has no benchmark hit and is absent; bench dup rows don't
    # double-count
    assert len(rows) == 1
    r = rows[0]
    assert r["doc_id"] == 1 and r["overlap"] == 1 and r["n_shingles"] == 2
    assert abs(r["contamination"] - 0.5) < 1e-12


def test_multiprobe_superset_of_single_probe(spark):
    """Multiprobe candidates strictly extend single-probe candidates AT THE
    SAME band layout: the base bucket is always probed, so every
    single-probe pair survives, and 1-flip probes add pairs split by
    exactly one plane. Checked at BOTH the production corpus-scaled layout
    (the registry pair — since r10 dedup_embedding_multiprobe probes the
    same block index dedup_embedding_blocked reads) and the labeled 4-bit
    recall fixture (_RECALL_BANDS via the raw operators, which also
    exercises operators/knn.multiprobe_keys end to end)."""
    from pyspark.sql import functions as F

    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.knn import banded_keys, multiprobe_keys
    from purldb_spark.plans.q_embed import _RECALL_BANDS
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    sf = "/root/testdata/sf0.01"
    single = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["dedup_embedding_blocked"](spark, sf).collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["dedup_embedding_multiprobe"](spark, sf).collect()
    }
    assert single <= multi
    assert len(multi) > len(single)

    # the 4-bit recall fixture, via the raw key operators (candidate KEY
    # pairs, before any cosine verify)
    e = load(spark, sf, "embeddings")
    base = banded_keys(e, "vec_id", "embedding", _RECALL_BANDS)

    def key_pairs(q):
        a, b = q.alias("a"), base.alias("b")
        return {
            (r["ia"], r["ib"])
            for r in a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(
                F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib")
            )
            .distinct()
            .collect()
        }

    s4 = key_pairs(base)
    m4 = key_pairs(multiprobe_keys(e, "vec_id", "embedding", _RECALL_BANDS))
    assert s4 <= m4
    assert len(m4) > len(s4)


def test_blocked_production_layout_bounds_candidates(spark):
    """BENCH_scale finding 1 regression fence: the registry
    dedup_embedding_blocked must carry the log2(N)-sized bucket layout
    (>= 8 planes/band), because 4-bit buckets measured quadratic (2.4 s ->
    111 s at 10x data). Checks the config directly plus that every emitted
    pair passes the exact-cosine verify against the brute-force pair set."""
    from purldb_spark.plans.q_embed import _BLOCK_BANDS
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    assert all(len(band) >= 8 for band in _BLOCK_BANDS)
    sf = "/root/testdata/sf0.01"
    blocked = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["dedup_embedding_blocked"](spark, sf).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["dedup_embedding_cosine"](spark, sf).collect()
    }
    assert blocked <= exact  # no false positives: verify stage is exact


def test_ivf_nprobe2_improves_recall(spark):
    """Probing the runner-up cell recovers cross-boundary neighbors: the
    nprobe=2 result hits at least as many exact top-3 pairs as nprobe=1."""
    from pyspark.sql import functions as F

    from purldb_spark.operators.knn import brute_force_topk
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    sf = "/root/testdata/sf0.01"
    e = spark.read.parquet(sf + "/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
    )
    exact = {
        (r["q_vec_id"], r["vec_id"])
        for r in brute_force_topk(
            q, e, k=3, q_id="q_vec_id", i_id="vec_id"
        ).collect()
    }
    one = {
        (r["q_vec_id"], r["vec_id"])
        for r in QUERIES["knn_ivf_cell"](spark, sf).collect()
    }
    two = {
        (r["q_vec_id"], r["vec_id"])
        for r in QUERIES["knn_ivf_nprobe2"](spark, sf).collect()
    }
    assert len(two & exact) >= len(one & exact)
    assert len(two) >= len(one)


def test_jl_projection_separates_near_dups_from_random_pairs(spark):
    """JL lemma smoke at k=16: single-pair distortion is coarse (eps ~
    sqrt(ln n / k)), so don't assert a per-pair bound — assert the
    property blocking actually needs: true near-dup pairs (exact 64-d
    cosine >= 0.4) keep a systematically higher PROJECTED cosine than
    random pairs. A broken sign matrix (constant, rank-deficient) erases
    this separation."""
    import math

    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    sf = "/root/testdata/sf0.01"
    rows = QUERIES["embed_random_projection"](spark, sf).collect()
    ys = {r["vec_id"]: [r[f"y{c}"] for c in range(16)] for r in rows}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        return num / den

    dup_pairs = [
        (r["id_a"], r["id_b"])
        for r in QUERIES["dedup_embedding_cosine"](spark, sf).collect()
    ]
    assert dup_pairs
    dup_cos = [cos(ys[a], ys[b]) for a, b in dup_pairs]
    ids = sorted(ys)
    rand_cos = [
        cos(ys[ids[i]], ys[ids[i + 1]]) for i in range(0, len(ids) - 1, 2)
    ]
    mean_dup = sum(dup_cos) / len(dup_cos)
    mean_rand = sum(rand_cos) / len(rand_cos)
    assert mean_dup > mean_rand + 0.2
    # and most near-dup pairs individually stay above the random mean
    above = sum(1 for c in dup_cos if c > mean_rand)
    assert above / len(dup_cos) > 0.8


def test_projected_blocking_is_subset_of_exact_pairs(spark):
    """Every pair the JL-sign blocking emits must appear in the exact
    all-pairs >= 0.4 set with an identical score (blocking changes recall,
    never precision or scores)."""
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    sf = "/root/testdata/sf0.01"
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in QUERIES["dedup_embedding_cosine"](spark, sf).collect()
    }
    blocked = QUERIES["embed_projected_blocked"](spark, sf).collect()
    assert blocked  # the config must surface at least one pair at sf0.01
    for r in blocked:
        assert exact[(r["id_a"], r["id_b"])] == r["cosine"]


def test_dedup_recall_eval_consistent_with_registry_queries(spark):
    """recall numerator equals the intersection of the standalone LSH and
    exact-jaccard registry outputs; verified-LSH pairs are a subset of the
    ground truth (shared threshold), so candidate precision <= recall
    denominator logic holds."""
    from purldb_spark.plans.registry import QUERIES, load_inventory
    from tests.conftest import SF_SMOKE

    load_inventory()
    row = QUERIES["dedup_recall_eval"](spark, SF_SMOKE).collect()[0]
    lsh = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
    }
    gt = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    }
    assert lsh <= gt  # same verify threshold: banding only loses pairs
    assert row["hits"] == len(lsh & gt) == len(lsh)
    assert row["possible"] == len(gt)
    assert 0 < row["hits"] <= row["n_candidates"]
    assert row["recall_e6"] == row["hits"] * 1_000_000 // max(len(gt), 1)
    assert (
        row["cand_precision_e6"]
        == row["hits"] * 1_000_000 // max(row["n_candidates"], 1)
    )
