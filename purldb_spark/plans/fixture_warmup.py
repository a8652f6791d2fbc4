"""Prebuild every session-scoped fixture (plans/fixture_cache.py) and the
trained-tokenizer artifact, returning the wall-clock cost.

In production each of these is a materialized table maintained by its
indexing/training pipeline — fingerprint indexes, band indexes, cluster
labels, normalized embeddings, trained centroids, PQ codes, the BPE
vocabulary (reference counterpart for the match-side state:
matchcode/models.py:247-265 precomputes fingerprint tables the API only
reads). Benchmarks and plan audits therefore build them ONCE up front and
report the cost as its own metric, so per-query numbers measure the read
path a serving cluster actually runs — and so the measured shuffle bytes
of whichever query happens to touch a fixture first aren't polluted by
the build (a 30 MB bucketed-table write once masqueraded as shuffle in
j1_fk_join_bucketed's plan-audit row).

NOT imported by any plans/q_*.py module (queries build fixtures lazily on
first touch), so this module is outside every query's hash closure.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession


def prebuild_fixtures(spark: SparkSession, sf_dir: str) -> float:
    """Materialize all shared fixtures for ``sf_dir``; returns seconds."""
    from purldb_spark.plans.fixture_cache import (
        bucketed_orderkey_tables,
        capped_posting,
        dir_fingerprint_index,
        doc_fingerprint_base,
        doc_shingles,
        dup_clusters,
        emb_band_index,
        ivf_cell_index,
        kmeans_cell_index,
        minhash_band_index,
        near_dup_pairs,
        pq_code_index,
        simhash_fingerprints,
        trained_centroids,
        residual_code_index,
        trained_pq_code_index,
        trained_pq_codebooks,
        unit_embeddings,
    )
    from purldb_spark.plans.q_bpe import bpe_trained_words
    from purldb_spark.plans.q_embed import _BLOCK_BANDS, _RECALL_BANDS
    from purldb_spark.plans.q_select import _tfidf_postings, _trigram_lm

    t0 = time.perf_counter()
    doc_fingerprint_base(spark, sf_dir).count()
    dir_fingerprint_index(spark, sf_dir, "content").count()
    dir_fingerprint_index(spark, sf_dir, "structure").count()
    near_dup_pairs(spark, sf_dir).count()
    doc_shingles(spark, sf_dir).count()
    minhash_band_index(spark, sf_dir).count()
    simhash_fingerprints(spark, sf_dir).count()
    capped_posting(spark, sf_dir, 16).count()
    dup_clusters(spark, sf_dir).count()
    unit_embeddings(spark, sf_dir).count()
    emb_band_index(spark, sf_dir, "block8x8", _BLOCK_BANDS).count()
    emb_band_index(spark, sf_dir, "recall4", _RECALL_BANDS).count()
    # coarse k is corpus-scaled (q_cluster.coarse_k — BENCH_scale finding
    # 4's remedy); prebuild at the SAME k the registry queries will request
    from purldb_spark.plans.q_cluster import coarse_k

    k_coarse = coarse_k(spark, sf_dir)
    trained_centroids(spark, sf_dir, k_coarse, 3)
    kmeans_cell_index(spark, sf_dir, k_coarse, 3).count()
    pq_code_index(spark, sf_dir).count()
    ivf_cell_index(spark, sf_dir).count()
    bucketed_orderkey_tables(spark, sf_dir)
    _trigram_lm(spark, sf_dir)[0].count()
    _tfidf_postings(spark, sf_dir).count()
    # the trained-tokenizer artifact (12 greedy merge iterations = 12
    # driver-argmax jobs) is the training pipeline's output, not per-query
    # work — bpe_encode_stats/pack_bpe_budget measure the encode/pack path
    bpe_trained_words(spark, sf_dir).count()
    # the trained PQ codebooks (8 independent sub-quantizer k-means fits)
    # and the code table encoded under them are likewise training-pipeline
    # artifacts
    trained_pq_codebooks(spark, sf_dir, 8, 16, 2)
    trained_pq_code_index(spark, sf_dir, 8, 16, 2).count()
    # the IVFADC artifacts (residual frame + residual-trained codebooks +
    # residual codes) — builds residual_frame and trained_residual_codebooks
    # transitively
    residual_code_index(spark, sf_dir, k_coarse, 3, 8, 16, 2).count()
    return round(time.perf_counter() - t0, 4)
