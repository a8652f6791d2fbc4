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


def prebuild_fixtures_timed(
    spark: SparkSession, sf_dir: str
) -> dict[str, float]:
    """Per-artifact wall seconds for the prebuild (the trim audit's
    instrument — PLANS.md ledger); ``prebuild_fixtures`` returns the sum."""
    import time as _time

    out: dict[str, float] = {}
    t_all = _time.perf_counter()

    def step(name: str, fn) -> None:
        t0 = _time.perf_counter()
        fn()
        out[name] = round(_time.perf_counter() - t0, 2)

    _prebuild_steps(spark, sf_dir, step)
    out["TOTAL"] = round(_time.perf_counter() - t_all, 2)
    return out


def prebuild_fixtures(spark: SparkSession, sf_dir: str) -> float:
    """Materialize all shared fixtures for ``sf_dir``; returns seconds."""
    return prebuild_fixtures_timed(spark, sf_dir)["TOTAL"]


def _prebuild_steps(spark: SparkSession, sf_dir: str, step) -> None:
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
    from purldb_spark.plans.q_embed import block_bands
    from purldb_spark.plans.q_select import _tfidf_postings, _trigram_lm

    step("doc_fingerprint_base", lambda: doc_fingerprint_base(spark, sf_dir).count())
    step("dir_fp_content", lambda: dir_fingerprint_index(spark, sf_dir, "content").count())
    step("dir_fp_structure", lambda: dir_fingerprint_index(spark, sf_dir, "structure").count())
    step("near_dup_pairs", lambda: near_dup_pairs(spark, sf_dir).count())
    step("doc_shingles", lambda: doc_shingles(spark, sf_dir).count())
    step("minhash_band_index", lambda: minhash_band_index(spark, sf_dir).count())
    step("simhash_fingerprints", lambda: simhash_fingerprints(spark, sf_dir).count())
    step("capped_posting", lambda: capped_posting(spark, sf_dir, 16).count())
    step("dup_clusters", lambda: dup_clusters(spark, sf_dir).count())
    step("unit_embeddings", lambda: unit_embeddings(spark, sf_dir).count())
    # band width is corpus-scaled since r10 (q_embed.block_bands — the
    # coarse_k recipe applied to LSH); prebuild the SAME layout the
    # registry queries will request.  The former "recall4" prebuild is
    # gone: since multiprobe re-pointed at the block index, the 4-bit
    # _RECALL_BANDS layout is a test-only fixture built by its tests.
    _bb, _bb_key = block_bands(spark, sf_dir)
    step("emb_band_index", lambda: emb_band_index(spark, sf_dir, _bb_key, _bb).count())
    # coarse k is corpus-scaled (q_cluster.coarse_k — BENCH_scale finding
    # 4's remedy); prebuild at the SAME k the registry queries will request
    from purldb_spark.plans.q_cluster import coarse_k

    k_coarse = coarse_k(spark, sf_dir)
    step("trained_centroids", lambda: trained_centroids(spark, sf_dir, k_coarse, 3))
    step("kmeans_cell_index", lambda: kmeans_cell_index(spark, sf_dir, k_coarse, 3).count())
    step("pq_code_index", lambda: pq_code_index(spark, sf_dir).count())
    step("ivf_cell_index", lambda: ivf_cell_index(spark, sf_dir).count())
    step("bucketed_orderkey_tables", lambda: bucketed_orderkey_tables(spark, sf_dir))
    step("trigram_lm", lambda: _trigram_lm(spark, sf_dir)[0].count())
    step("tfidf_postings", lambda: _tfidf_postings(spark, sf_dir).count())
    # the trained-tokenizer artifact (12 greedy merge iterations = 12
    # driver-argmax jobs) is the training pipeline's output, not per-query
    # work — bpe_encode_stats/pack_bpe_budget measure the encode/pack path
    step("bpe_trained_words", lambda: bpe_trained_words(spark, sf_dir).count())
    # the trained PQ codebooks (8 independent sub-quantizer k-means fits)
    # and the code table encoded under them are likewise training-pipeline
    # artifacts
    step("trained_pq_codebooks", lambda: trained_pq_codebooks(spark, sf_dir, 8, 16, 2))
    step("trained_pq_code_index", lambda: trained_pq_code_index(spark, sf_dir, 8, 16, 2).count())
    # the IVFADC artifacts (residual frame + residual-trained codebooks +
    # residual codes) — builds residual_frame and trained_residual_codebooks
    # transitively
    step("residual_code_index", lambda: residual_code_index(spark, sf_dir, k_coarse, 3, 8, 16, 2).count())
