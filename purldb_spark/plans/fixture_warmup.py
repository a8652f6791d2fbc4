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

Since round 10 the prebuild submits INDEPENDENT artifact chains
concurrently (ThreadPoolExecutor -> concurrent Spark job submission):
sequential submission left local[32] underfilled by every individual
sub-second stage and had crept 42 -> 51 -> 66 s over rounds 7-9 as trained
artifacts accumulated. Dependency chains stay sequential WITHIN a thread
(kmeans -> residual frame -> residual codebooks -> residual codes; shingle
family after doc_shingles); cross-chain shared keys (unit_embeddings)
are safe since the per-key single-builder locks
(fixture_runtime._get_or_build) — a second chain touching a key under
construction waits for the one build instead of racing it, and the
stale-session eviction scan is atomic under the cache lock. This is also the honest cluster shape: each chain is an
independent indexing-pipeline job.

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
    instrument — PLANS.md ledger). Artifact times are thread-local build
    elapsed and OVERLAP since r10's concurrent submission, so their sum
    exceeds TOTAL (the true wall time ``prebuild_fixtures`` returns)."""
    out: dict[str, float] = {}
    t_all = time.perf_counter()

    def step(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        out[name] = round(time.perf_counter() - t0, 2)

    _prebuild_steps(spark, sf_dir, step)
    out["TOTAL"] = round(time.perf_counter() - t_all, 2)
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
    from purldb_spark.plans.q_cc_plan import _prior_labels
    from purldb_spark.plans.q_classifier import (
        perceptron_feats,
        perceptron_history,
    )
    from purldb_spark.plans.q_nb import _B as _NB_B
    from purldb_spark.plans.q_nb import trained_nb_stats
    from purldb_spark.plans.q_cluster import _exact_l2_gt, coarse_k
    from purldb_spark.plans.q_embed import block_bands
    from purldb_spark.plans.q_match import _query_df
    from purldb_spark.plans.q_select import _tfidf_postings, _trigram_lm

    # corpus-scaled parameters resolved up front (one count() each,
    # memoized): coarse k (q_cluster.coarse_k, BENCH_scale finding 4) and
    # the LSH band width (q_embed.block_bands, finding 1 — r10; the former
    # "recall4" prebuild is gone: multiprobe re-pointed at the block
    # index, so the 4-bit _RECALL_BANDS layout is test-only now).
    k_coarse = coarse_k(spark, sf_dir)
    _bb, _bb_key = block_bands(spark, sf_dir)

    # Independent chains, submitted concurrently. Within a chain, later
    # artifacts read earlier ones through the session cache; across
    # chains, no key is shared.
    chains: list[list[tuple[str, object]]] = [
        [
            ("doc_fingerprint_base", lambda: doc_fingerprint_base(spark, sf_dir).count()),
            ("dir_fp_content", lambda: dir_fingerprint_index(spark, sf_dir, "content").count()),
            ("dir_fp_structure", lambda: dir_fingerprint_index(spark, sf_dir, "structure").count()),
            # match-cascade query frame (depends on the fingerprint base;
            # surfaced by the r14 lazy-build ledger: 0.11 s was landing on
            # match_cascade's bench row)
            ("match_query", lambda: _query_df(spark, sf_dir).count()),
        ],
        [
            ("doc_shingles", lambda: doc_shingles(spark, sf_dir).count()),
            ("minhash_band_index", lambda: minhash_band_index(spark, sf_dir).count()),
            ("simhash_fingerprints", lambda: simhash_fingerprints(spark, sf_dir).count()),
            ("capped_posting", lambda: capped_posting(spark, sf_dir, 16).count()),
        ],
        [
            ("near_dup_pairs", lambda: near_dup_pairs(spark, sf_dir).count()),
            ("dup_clusters", lambda: dup_clusters(spark, sf_dir).count()),
            # CC-stream prior-label snapshot (depends on near_dup_pairs;
            # r14 ledger: 1.85 s was landing on cc_deferral_plan's row)
            ("cc_plan_prior_labels", lambda: _prior_labels(spark, sf_dir).count()),
        ],
        # the trained-IVF chain is the critical path: centroids -> cell
        # index -> residual frame/codebooks/codes (residual_code_index
        # builds residual_frame and trained_residual_codebooks
        # transitively)
        [
            ("trained_centroids", lambda: trained_centroids(spark, sf_dir, k_coarse, 3)),
            ("kmeans_cell_index", lambda: kmeans_cell_index(spark, sf_dir, k_coarse, 3).count()),
            ("residual_code_index", lambda: residual_code_index(spark, sf_dir, k_coarse, 3, 8, 16, 2).count()),
        ],
        # trained PQ codebooks (8 sub-quantizer k-means fits) + the code
        # table encoded under them — training-pipeline artifacts
        [
            ("trained_pq_codebooks", lambda: trained_pq_codebooks(spark, sf_dir, 8, 16, 2)),
            ("trained_pq_code_index", lambda: trained_pq_code_index(spark, sf_dir, 8, 16, 2).count()),
        ],
        # the frozen-centroid baseline index pair
        [
            ("pq_code_index", lambda: pq_code_index(spark, sf_dir).count()),
            ("ivf_cell_index", lambda: ivf_cell_index(spark, sf_dir).count()),
            # exact-L2 ground truth shared by the recall harnesses (r14
            # ledger: 0.40 s was landing on knn_recall_fully_trained)
            ("exact_l2_gt", lambda: _exact_l2_gt(spark, sf_dir).count()),
        ],
        # unit_embeddings heads the band chain (r13): since the per-key
        # build locks (fixture_runtime._get_or_build) made concurrent
        # same-key requests single-builder and the eviction scan atomic,
        # the old serial-first step only serialized ~6 s of wall that the
        # document-side chains can hide; other embedding chains block on
        # its key lock exactly as long as they must.
        [
            ("unit_embeddings", lambda: unit_embeddings(spark, sf_dir).count()),
            ("emb_band_index", lambda: emb_band_index(spark, sf_dir, _bb_key, _bb).count()),
        ],
        [
            ("bucketed_orderkey_tables", lambda: bucketed_orderkey_tables(spark, sf_dir)),
        ],
        [
            ("trigram_lm", lambda: _trigram_lm(spark, sf_dir)[0].count()),
            ("tfidf_postings", lambda: _tfidf_postings(spark, sf_dir).count()),
        ],
        # the trained-tokenizer artifact (12 greedy merge iterations = 12
        # driver-argmax jobs) — bpe_encode_stats/pack_bpe_budget measure
        # the encode/pack path, not this training cost
        [
            ("bpe_trained_words", lambda: bpe_trained_words(spark, sf_dir).count()),
        ],
        # the perceptron's thin integer feature table + the two trained
        # text-classifier artifacts (r15: classifier_train and
        # classifier_agreement_eval consume them like trained_centroids)
        [
            ("perceptron_feats", lambda: perceptron_feats(spark, sf_dir).count()),
            ("perceptron_history", lambda: perceptron_history(spark, sf_dir)),
            ("nb_stats", lambda: trained_nb_stats(spark, sf_dir, _NB_B)),
        ],
    ]

    import concurrent.futures as cf

    def run_chain(chain: list[tuple[str, object]]) -> None:
        for name, fn in chain:
            step(name, fn)

    with cf.ThreadPoolExecutor(max_workers=len(chains)) as ex:
        futs = [ex.submit(run_chain, c) for c in chains]
        for f in futs:
            f.result()  # re-raise any build failure
