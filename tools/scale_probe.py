"""Order-of-magnitude scale probe: sf0.1 -> sf1 (10x) for the dedup/match
flagship families.

Builds a local sf1 slice of `documents` / `embeddings` (10 salted copies of
sf0.1 — texts word-salted per copy so shingle sets across copies are
disjoint and the near-dup pair structure is exactly 10 disjoint copies of
the sf0.1 structure; embeddings cyclically dimension-shifted per copy so
within-copy geometry is preserved and cross-copy cosines decorrelate), then
runs the banded/bucketed flagship queries at both scales and records wall
seconds + shuffle read/write bytes (from the local Spark UI REST API) into
BENCH_scale.md.

The two labeled all-pairs baselines (knn_bruteforce,
dedup_embedding_cosine) are intentionally excluded from the sf1 run: they
are ground-truth fixtures whose cost is quadratic by construction — the
blocked/bucketed twins are the scale path and are probed instead.

Usage:  python tools/scale_probe.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(HERE, ".scale", "sf1")
COPIES = 10

PROBES = [
    # name, expected scaling note
    ("dedup_exact", "hash groupBy — linear"),
    ("dedup_minhash_lsh", "banded equi-join — linear in pairs"),
    ("dedup_incremental", "batch vs band index — linear"),
    ("dedup_simhash", "120-bit/30-bit pigeonhole bands through the registry path (r11, operators/simhash_wide) — linear; width history: 32/8-bit was 9.5x at 10x, 60/15-bit saturates ~10^5-10^6 docs"),
    ("dedup_ngram_jaccard_capped", "df-capped inverted index — linear"),
    ("dedup_ngram_jaccard", "uncapped inverted index — sum(df^2)"),
    ("dedup_cluster_cc", "CC over the shared pair fixture — O(log d) waves"),
    ("dedup_cluster_keep_best", "closure + argmax over pair fixture — linear"),
    ("decontam_ngram_overlap", "broadcast benchmark shingles — linear"),
    ("emb_blocked_8x8", "LSH 8 bands x 8-bit buckets, cos>=0.55 — linear"),
    ("knn_lsh_bucketed", "bucket equi-join — linear"),
    ("knn_ivf_cell", "frozen-centroid cells — linear"),
    ("text_quality", "pure column exprs — linear"),
    ("text_winnow_fingerprint", "rolling-hash windows — linear"),
    ("match_cascade_full", "BAH128 agg + banded join — linear"),
    ("x_bah128_dir_content", "one 128-col aggregation — linear"),
    ("sample_stratified", "map-only md5 threshold — linear"),
    ("pack_sequences", "16-shard window cumsum — linear"),
    ("shuffle_global", "sharded rank + broadcast offsets — linear"),
    ("corpus_curate_pipeline", "gates + sample + pack over pair fixture — linear"),
    ("kmeans_train", "cell-index view: sizes agg + broadcast join — linear"),
    ("kmeans_minibatch_merge", "e6 sufficient-stats shard merge proof: posexplode + two combine-bounded aggs (k x dim x partitions shuffle) — linear"),
    ("kmeans_fit_cold", "Lloyd trainer, no cache — scan + k*dim-row shuffle per iteration"),
    ("pq_encode_cold", "PQ index build (8x16 argmin encode), no cache — map-only linear"),
    ("semantic_tau055", "SemDeDup cell equi-join, tau=0.55 deep tail — largest-cell bound"),
    ("knn_trained_ivfpq_refine", "train+probe+refine, corpus-scaled k since r9 — linear probe, k-proportional training"),
    ("knn_trained_pq_kscaled", "cold-path probe of the k~N/250 law the registry now ships (no session cache)"),
    ("text_boilerplate_scrub", "percentile-DF boilerplate scrub — linear"),
    ("text_tfidf_neighbors", "df-capped idf inverted index — sum min(df,cap)^2"),
    ("text_repeated_span_scrub", "dup-gram shuffle join — linear in duplication"),
    ("select_dsir", "histogram agg + map-only literal-array score — linear"),
    ("select_perplexity_buckets", "trigram-LM broadcast join + per-lang tercile sort — linear (N log N sort)"),
    ("select_quality_classifier", "hashed linear model, map-only fold — linear, zero shuffle"),
    ("bpe_train", "warm artifact read (token-frequency view)"),
    ("bpe_fit_cold", "pair loop over vocab-bounded word table — corpus only in the first scan"),
    ("bpe_encode_stats", "corpus x vocab equi-join + per-doc agg — linear"),
    ("dedup_bloom", "<= m-row bit table broadcast + map-side probe — linear"),
    ("pack_bpe_budget", "encode join + shard-window cumsum — linear"),
    ("select_domain_cap", "source-partitioned rank + TakeOrdered budget — linear"),
    ("text_chunk_overlap", "map-only sequence+slice chunking — linear"),
    ("select_unimax_budget", "agg to language granularity + tiny-frame waterfilling windows — linear"),
    ("embed_random_projection", "JL sign folds — map-only, zero shuffle, linear"),
    ("embed_projected_blocked", "JL sign bits as 2x8-bit band keys + exact verify — linear"),
    ("select_gopher_rules", "3 map-only gates + doc_id-keyed word groupBy — O(tokens)"),
    ("j13_skew_salted_join", "salted hot-key join, 8x dim explode — linear, largest reducer bounded"),
    ("mix_temperature_sampling", "agg to language granularity + tiny-frame windows — linear"),
    ("corpus_funnel_report", "one corpus pass, md5 window is the only shuffle — linear"),
    ("knn_hard_negatives", "cell-bounded equi-join + per-anchor window — corpus-scaled k since r9 keeps expected cell size constant"),
    ("knn_recall_eval", "GT side is anchors(N/50) x N — super-linear BY CONSTRUCTION here; production pins the anchor sample, making the GT scan linear"),
    ("pq_train", "per-subspace ksub*subdim-row shuffles + map-only encode — linear"),
    ("bpe_fertility_by_lang", "encode join + lang agg — linear"),
    ("knn_recall_fully_trained", "production-config recall: approx side cell-bound at corpus-scaled k x nprobe, GT side anchors(N/50) x N by construction (recall VALUES per scale: finding 5)"),
    ("ann_index_stats", "k-row agg off the cell index + tiny-frame windows — linear"),
    ("dedup_recall_eval", "banded equi-join approx side + sum(df^2) GT side (labeled ground-truth cost, sampled in production)"),
    ("knn_fully_trained_ivfpq", "cell equi-join x 8-subspace explode + 128-row broadcast codebook — corpus-scaled k since r9 AND nprobe=isqrt(k) + 10/probe reorder depth since r11; table ratio is probe-anchor volume (queries ∝ N via the %50 sample) x per-query work — the operator claim is PER QUERY: 24.5 -> 41.5 ms/query at 10x corpus (1.7x, ~sqrt(250N) by design; production query volume is workload-pinned)"),
    ("j14_asof_join", "union+tag, ONE window per user (disjoint users per copy: 10x partitions, same partition size) — linear"),
    ("j15_interval_bin_join", "bin-explode broadcast equi-join + exact re-check; dim side scale-invariant — linear"),
    ("sketch_hll_distinct", "register state fixed at types x 64 (map-side combined MAX); exact baseline pays the distinct shuffle — linear"),
    ("sketch_cms_topk", "fixed d x w additive counter table + labeled exact top-k groupBy — linear"),
    ("sketch_histogram_quantiles", "fixed-width additive histogram + cum walk; exact-rank baseline pays a DISTRIBUTED full sort (prefix-group rank, r9) — linear (N log N baseline)"),
    ("dedup_ngram_prefix", "prefix-filtered exact jaccard — candidates from rarest-first prefixes only"),
    ("dedup_plan_choice", "per-slice decision statistics + argmin as data — two key-count aggs + one rank window, linear"),
    ("dedup_dispatch_run", "the dispatcher executing its per-slice choice — stats + the chosen exact plan per slice"),
    ("mm_png_roundtrip", "PNG encode/decode inside Arrow batches — map-only, linear"),
    ("mm_jpeg_roundtrip", "baseline JPEG huffman+IDCT decode inside Arrow batches — map-only, linear"),
    ("mm_resize_roundtrip", "NN resample roundtrip — map-only, linear"),
    ("mm_wav_windows", "frame-aligned WAV window slice + per-window decode — map-only, linear"),
    ("mm_embed_ann_search", "decode->features->grid-cell probe->L1 re-rank — cell-bounded"),
    ("mm_pair_alignment_qa", "paired-data QA by cross-modal retrieval: map-only encode/decode/feature + ONE cell equi-join + per-pair window — cell-bounded"),
    ("nb_train", "one (class x bucket) counting agg — linear scan, bounded shuffle"),
    ("nb_train_wide", "the same counting agg at B=4096 (the teacher's width) — B widens the combine key space only, never the scan"),
    ("knn_residual_ivfpq", "residual-coded IVFADC probe, per-probe query residuals — same cell-equi-join cost model as knn_fully_trained_ivfpq (anchors ∝ N in the probe; per query 28 -> 39.8 ms at 10x corpus = 1.4x), corpus-scaled k since r9 + nprobe=isqrt(k) since r11"),
    ("knn_recall_residual", "IVFADC recall eval — approx side cell-bound at corpus-scaled k, GT side anchors(N/50) x N by construction (recall VALUES per scale: finding 5)"),
    ("sketch_hll_merge_daily", "daily register shards (types x days x 64) MAX-merged vs direct — two bounded groupBys over one scan each — linear"),
    ("sample_weighted_per_group", "map-only ES keys + per-language top-k window — linear, one group shuffle"),
    ("layout_zorder_skipping", "distributed exact-rank bucketing (prefix groups + broadcast offsets, shuffle-wide sorts) + 3x64 envelope agg — N log N; single-run numbers here are cold-start noisy for this 3-sort query — the r12 A/B (min-of-3, one session) measured 5.65 s sf0.1 / 7.61 s sf1 = 1.3x at 10x after the independent-pipelines fix (old chained code: 10.73 s sf1)"),
    ("sketch_kmv_intersect", "two-phase salted bottom-k + k-row pair merges; labeled exact baselines pay the per-pair distinct shuffle — linear"),
    ("split_leakage_safe", "cluster-hash assignment join + doc-keyed pair accounting over materialized dedup state — linear"),
    ("emb_blocked_kscaled", "the r10 registry layout COLD: q_embed.block_bands width (8 planes at sf0.1, 10 at sf1 — the formula ENGAGES here), cos>=0.55 deep tail — linear"),
    ("sketch_histogram_merge", "daily bin shards summed == direct histogram + per-pct merge proof — two bounded groupBys"),
    ("lsh_band_plan", "two count(*) aggs + the width formula as data (reports n_planes 8 -> 10/11 at sf1) — constant output"),
    ("text_chunk_windows", "map-only explode(sequence) chunking, zero shuffle — linear"),
    ("chunk_shared_across_docs", "chunk fan-out + ONE md5 hash-groupBy (map-side combined) — linear"),
    ("cc_deferral_plan", "label/size equi-joins on the batch slice + 3-cap literal explode — O(batch); prior labels read from the session fixture like the stream reads its snapshot"),
    ("mm_bmp_roundtrip", "mapInPandas BMP encode+decode, map-only Arrow batches, zero shuffle — linear"),
    ("mm_wav_roundtrip", "mapInPandas WAV encode+decode, map-only Arrow batches, zero shuffle — linear"),
    ("classifier_train", "perceptron epochs over the materialized integer feature table — one map-side-combined agg per epoch, 10 ints to driver"),
    ("mm_mp4_meta", "full ISO-BMFF encode+box-walk inside Arrow batches — map-only, zero shuffle, linear"),
    ("mm_mp4_frame_sample", "sync-sample extraction off resolved stsc/stco/stsz tables — map-only, zero shuffle, linear"),
    ("mm_mp3_meta", "mp3 frame walk (ID3 skip/resync/Xing) inside Arrow batches — map-only, zero shuffle, linear"),
    ("mm_shot_segmentation", "keyframe extraction + ONE media_id window chain + shot rollup — bounded fanout, linear"),
    ("dedup_video_shots", "shot chain + map-side-combined signature groupBy — exact-dedup shape, linear"),
    ("mm_clip_caption_pairs", "shots x tx3g captions interval-overlap per media — bounded grain, linear"),
    ("shot_incremental_fold", "3-epoch sequential fold == direct chain (order-sensitive proof)"),
    ("mm_audio_segments", "VAD chain over decoded windows — map-only decode + ONE media window, linear"),
    ("mm_mp3_tags", "ID3v2.4 frame extraction inside Arrow batches — map-only, zero shuffle, linear"),
    ("mm_fmp4_fragments", "fragmented-MP4 (moof/traf/trun) walk + sample extraction — map-only, linear"),
    ("mm_png_adam7_roundtrip", "Adam7 interlaced PNG encode+deinterlace — map-only, linear"),
    ("mm_bmp16_roundtrip", "16-bit RGB555 BMP decode — map-only, linear"),
    ("mm_bmp_rle_roundtrip", "BI_RLE8 run-length decode + palette expansion — map-only, linear"),
    ("mm_wav24_float_roundtrip", "24-bit packed PCM + IEEE-float WAV decode — map-only, linear"),
    ("mm_png16_roundtrip", "16-bit-depth + gray+alpha PNG decode (2-byte-bpp filters) — map-only, linear"),
    ("mm_png_sub8_roundtrip", "1/2/4-bit packed-sample PNG decode (gray + paletted) — map-only, linear"),
    ("mm_mp4_audio_meta", "soun-trak AudioSampleEntry walk + sample volume — map-only, linear"),
]


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF1, exist_ok=True)
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    parts = []
    for k in range(COPIES):
        if k == 0:
            salted = docs
        else:
            # word-level salt: copy-k text shares no shingle with any other
            # copy, so global shingle document-frequencies are preserved per
            # copy and near-dup pairs never cross copies
            salted = docs.select(
                F.col("doc_id"),
                F.concat_ws(
                    " ",
                    F.expr(
                        f"transform(split(text, ' '), w -> concat(w, '_{k}'))"
                    ),
                ).alias("text"),
                "lang",
                "source",
            )
        parts.append(
            salted.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                "text",
                "lang",
                "source",
                F.length("text").alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # many output files so the sf1 scan parallelizes like a real dataset
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
    eparts = []
    for k in range(COPIES):
        if k == 0:
            shifted = emb
        else:
            # per-copy Rademacher sign flip: (s∘x)·(s∘y) = x·y, so every
            # within-copy cosine is preserved EXACTLY, while cross-copy
            # dot products become sign-randomized sums that decorrelate
            # (the cyclic-shift salt tried first kept cross-copy cosines
            # high — the generator's dimensions are not exchangeable)
            shifted = emb.select(
                "vec_id",
                F.expr(
                    "transform(embedding, (v, i) ->"
                    f" v * CAST(1 - 2 * pmod(hash(i, {k}), 2) AS FLOAT))"
                ).alias("embedding"),
                "label",
            )
        eparts.append(
            shifted.select(
                (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.repartition(16).write.mode("overwrite").parquet(
        os.path.join(SF1, "embeddings.parquet")
    )

    # `part` feeds the synthetic BAH128 directory tree (q_halohash) — scale
    # it the same way: shifted keys, salted names (new leaf files/dirs)
    part = spark.read.parquet(os.path.join(SF01, "part.parquet"))
    pparts = []
    for k in range(COPIES):
        salted = part.withColumn(
            "p_partkey", F.col("p_partkey") + F.lit(k * 10_000_000)
        )
        if k > 0:
            salted = salted.withColumn(
                "p_name", F.concat(F.col("p_name"), F.lit(f" c{k}"))
            )
        pparts.append(salted)
    pout = pparts[0]
    for p in pparts[1:]:
        pout = pout.unionByName(p)
    pout.repartition(8).write.mode("overwrite").parquet(
        os.path.join(SF1, "part.parquet")
    )

    # `events` feeds the as-of join and the HLL sketch: per-copy users are
    # DISJOINT (user_id + k*1000) so the as-of window partitions stay the
    # same size (10x partitions, not 10x rows per partition — the linear
    # case) and distinct-user counts genuinely grow 10x for the sketch
    ev = spark.read.parquet(os.path.join(SF01, "events.parquet"))
    evparts = [
        ev.select(
            (F.col("event_id") + F.lit(k * 10_000_000)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * 1000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(COPIES)
    ]
    evout = evparts[0]
    for p in evparts[1:]:
        evout = evout.unionByName(p)
    evout.repartition(16).write.mode("overwrite").parquet(
        os.path.join(SF1, "events.parquet")
    )

    # `lineitem` feeds the interval join and the z-order layout probe:
    # orderkeys shift per copy (new facts), part/supp keys KEEP their
    # ranges so the interval dimension and the predicate selectivity are
    # scale-invariant — the fact side grows 10x, the broadcast side not
    li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
    liparts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * 10_000_000))
        for k in range(COPIES)
    ]
    liout = liparts[0]
    for p in liparts[1:]:
        liout = liout.unionByName(p)
    liout.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1, "lineitem.parquet")
    )


def shuffle_totals(spark) -> tuple[int, int]:
    """(read_bytes, write_bytes) summed over all completed stages, via the
    local UI REST API; (-1, -1) when the UI is unavailable."""
    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = json.load(r)
        return (
            sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
        )
    except Exception:
        return (-1, -1)


def _emb_blocked_8x8(spark, sf_dir: str):
    """Scale-probe variant of dedup_embedding_blocked: bucket bits grown
    with N (8 bands x 8 planes = 256 buckets/band vs the registry query's
    16), threshold 0.55 — above the random-cosine tail of the synthetic
    64-dim vectors, so the TRUE output stays linear in N. The registry
    query's 0.4 threshold sits INSIDE that tail (920 of 2M sf0.1 pairs
    pass it, median 0.419), which makes its exact output — for any
    algorithm — grow quadratically with N; see BENCH_scale.md."""
    from pyspark.sql import functions as F

    from purldb_spark.operators.knn import hyperplanes
    from purldb_spark.plans.q_embed import embedding_blocked_pairs

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    bands = [hyperplanes(dim=64, n_planes=8, seed=500 + b) for b in range(8)]
    return embedding_blocked_pairs(e, bands, 0.55)


def _semantic_tau055(spark, sf_dir: str):
    """Scale-probe variant of dedup_semantic at tau=0.55: the registry
    query's 0.4 sits inside the synthetic vectors' random-cosine tail
    (BENCH_scale.md finding 2), where TRUE pair output grows ~N² for any
    algorithm; 0.55 models the deep-tail regime real semantic dedup runs
    in, so the probe measures the PLAN's scaling (cell equi-join bounded
    by the largest cell), not output growth."""
    from purldb_spark.plans.q_cluster import semantic_dedup_frame

    return semantic_dedup_frame(spark, sf_dir, 0.55)


def _kmeans_fit_cold(spark, sf_dir: str):
    """The full train+assign path with NO session cache — measures the
    trainer's claimed shape (one scan + a k*dim-row shuffle per Lloyd
    iteration) rather than the warm cell-index view the registry query
    reads (fixture_cache.kmeans_cell_index)."""
    from purldb_spark.operators.kmeans import kmeans_assign

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return kmeans_assign(e, "embedding", "vec_id", 8, 3)


def _bpe_fit_cold(spark, sf_dir: str):
    """The full BPE train+encode path with NO session cache — measures the
    trainer's claimed shape (one corpus scan to a vocab-bounded word
    table, then a vocab-sized pair loop per merge) rather than the warm
    artifact read of the registry queries (q_bpe.bpe_trained_words)."""
    from pyspark.sql import functions as F

    from purldb_spark.operators.bpe import bpe_fit, encoded_vocab, word_vocab

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    vocab = word_vocab(docs).localCheckpoint(eager=True)
    merges = bpe_fit(vocab, 12)
    enc = encoded_vocab(vocab, [(l, r) for l, r, _ in merges])
    return (
        enc.select(F.col("cnt"), F.explode(F.split("toks", " ")).alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("freq"))
    )


def _pq_encode_cold(spark, sf_dir: str):
    """The PQ index build (encode_expr over the corpus) with NO session
    cache — the map-only pass fixture_cache.pq_code_index materializes."""
    from purldb_spark.operators.pq import encode_expr

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return e.select("vec_id", encode_expr("embedding").alias("codes"))


def _knn_trained_pq_kscaled(spark, sf_dir: str):
    """The IVF remedy for finding 4: the cell count k grows with the
    corpus (k ~ N/250, i.e. constant expected cell size), so per-query
    probe work stays flat and total probe cost stays linear — the same
    grow-the-parameter-with-log-or-linear-N law as LSH bucket bits
    (finding 1). Trains (3 Lloyd iterations at that k), indexes, probes
    ADC, exact re-rank — the full knn_trained_ivfpq_refine pipeline."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from purldb_spark.operators.kmeans import (
        assign_expr,
        kmeans_fit,
        sqdist_cols_spark,
    )
    from purldb_spark.operators.pq import adc_expr, encode_expr

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = e.count()
    k = max(8, n // 250)
    cents = kmeans_fit(e, "embedding", "vec_id", k, 3)
    idx = e.select(
        "vec_id",
        assign_expr("embedding", cents).alias("cell"),
        encode_expr("embedding").alias("codes"),
    )
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
        assign_expr("embedding", cents).alias("q_cell"),
    )
    short = q.join(
        idx,
        (F.col("q_cell") == F.col("cell"))
        & (F.col("q_vec_id") != F.col("vec_id")),
    ).withColumn("adc", adc_expr("q_embedding", "codes"))
    w_adc = Window.partitionBy("q_vec_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    cand = short.withColumn("r", F.row_number().over(w_adc)).filter("r <= 10")
    raw = e.select("vec_id", F.col("embedding").alias("i_embedding"))
    ref = cand.join(raw, "vec_id").withColumn(
        "exact_d", F.expr(sqdist_cols_spark("q_embedding", "i_embedding"))
    )
    w_ex = Window.partitionBy("q_vec_id").orderBy(F.asc("exact_d"), F.asc("vec_id"))
    return ref.withColumn("rank", F.row_number().over(w_ex)).filter("rank <= 3")


def _emb_blocked_kscaled(spark, sf_dir: str):
    """The REGISTRY layout, cold (no session band-index fixture): width
    from q_embed.block_bands — max(8, floor(log2 N) - 4) planes per band,
    so the sf1 run exercises 10-bit buckets through exactly the code the
    registry queries ship (the LSH twin of knn_trained_pq_kscaled).
    Threshold 0.55 keeps the TRUE output linear (finding 2); the registry
    queries' 0.4 sits in the random tail where any algorithm's output is
    quadratic."""
    from purldb_spark.plans.q_embed import block_bands, embedding_blocked_pairs

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    bands, _key = block_bands(spark, sf_dir)
    return embedding_blocked_pairs(e, bands, 0.55)


SPECIAL = {
    "emb_blocked_8x8": _emb_blocked_8x8,
    "emb_blocked_kscaled": _emb_blocked_kscaled,
    "semantic_tau055": _semantic_tau055,
    "kmeans_fit_cold": _kmeans_fit_cold,
    "bpe_fit_cold": _bpe_fit_cold,
    "pq_encode_cold": _pq_encode_cold,
    "knn_trained_pq_kscaled": _knn_trained_pq_kscaled,
}


def run_probe(spark, sf_dir: str, only: set[str] | None = None) -> dict[str, dict]:
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    out: dict[str, dict] = {}
    for name, note in PROBES:
        if only is not None and name not in only:
            continue
        fn = SPECIAL.get(name) or QUERIES[name]
        # three runs, keep the fastest: a single long session accumulates
        # localCheckpoint blocks and GC pauses pollute one-shot timings;
        # min-of-3 is the steady-state cost of the PLAN, which is what
        # the scale comparison is about
        best, n = None, 0
        rd, wr = -1, -1
        for _ in range(3):
            r0, w0 = shuffle_totals(spark)
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            sec = round(time.perf_counter() - t0, 2)
            r1, w1 = shuffle_totals(spark)
            if best is None or sec < best:
                best = sec
                # the UI store evicts old stages in long sessions; a
                # negative delta means the window rolled between the two
                # snapshots — report unmeasured rather than a bogus value
                rd = (
                    round((r1 - r0) / 1e6, 1)
                    if r1 >= 0 and r1 >= r0
                    else "n/a"
                )
                wr = (
                    round((w1 - w0) / 1e6, 1)
                    if w1 >= 0 and w1 >= w0
                    else "n/a"
                )
        out[name] = {
            "sec": best,
            "rows": n,
            "shuffle_read_mb": rd,
            "shuffle_write_mb": wr,
            "note": note,
        }
        print(f"  {name}: {best}s {n} rows", flush=True)
    return out


def main() -> None:
    from purldb_spark.session import get_spark

    spark = get_spark("scale_probe")
    if "--rebuild" in sys.argv or not os.path.isdir(
        os.path.join(SF1, "documents.parquet")
    ):
        print("building sf1 slice ...", flush=True)
        t0 = time.perf_counter()
        build_sf1(spark)
        print(f"built in {time.perf_counter() - t0:.1f}s", flush=True)
    # fresh session per scale so one scale's accumulated checkpoint blocks
    # don't tax the other's timings
    spark.stop()

    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()

    only = None
    for i, a in enumerate(sys.argv):
        if a == "--only" and i + 1 < len(sys.argv):
            only = set(sys.argv[i + 1].split(","))

    spark = get_spark("scale_probe_sf01", extra_conf={"spark.ui.enabled": "true"})
    QUERIES["dedup_exact"](spark, SF01).count()  # warm
    print("probing sf0.1 ...", flush=True)
    small = run_probe(spark, SF01, only)
    spark.stop()

    spark = get_spark("scale_probe_sf1", extra_conf={"spark.ui.enabled": "true"})
    QUERIES["dedup_exact"](spark, SF1).count()  # warm
    print("probing sf1 (10x) ...", flush=True)
    big = run_probe(spark, SF1, only)
    if only is not None:
        # ad-hoc subset: print rows, leave BENCH_scale.md for a full regen
        import json as _json

        print(_json.dumps({"small": small, "big": big}))
        return

    lines = [
        "# BENCH_scale — sf0.1 vs sf1 (10x documents/embeddings)",
        "",
        "Generated by `tools/scale_probe.py`. The sf1 slice is 10 salted",
        "copies of sf0.1 (word-salted texts: shingle sets disjoint across",
        "copies; embeddings sign-flipped per copy by a Rademacher pattern,",
        "which preserves every within-copy dot product exactly), so the",
        "true near-dup structure is ~10 disjoint copies of sf0.1 and a",
        "perfectly linear operator would show a ~10x time ratio at equal",
        "parallelism — in practice under 10x here because local[32] is",
        "underutilized at sf0.1 (fixed job overhead dominates sub-second",
        "stages).",
        "",
        "| query | sf0.1 s | sf1 s | ratio | sf0.1 rows | sf1 rows |"
        " sf1 shuffle R/W MB | scaling shape |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, note in PROBES:
        s, b = small[name], big[name]
        ratio = round(b["sec"] / s["sec"], 1) if s["sec"] > 0 else float("inf")
        lines.append(
            f"| {name} | {s['sec']} | {b['sec']} | {ratio}x | {s['rows']} |"
            f" {b['rows']} | {b['shuffle_read_mb']}/{b['shuffle_write_mb']} |"
            f" {note} |"
        )
    lines += [
        "",
        "Excluded on purpose: `knn_bruteforce` and `dedup_embedding_cosine`",
        "— the labeled all-pairs ground-truth baselines, quadratic by",
        "construction; their blocked/bucketed twins above are the scale",
        "path. Also excluded since r10: `knn_ivfpq`, the FROZEN",
        "shipped-centroid IVFPQ (operators/ivf.py's 8 cells, an untrainable",
        "constant — measured 19-22x at 10x in r8/r9). Unlike the GT",
        "baselines it is not ground truth for anything: it is the labeled",
        "historical fixed-k config kept in the registry only as the",
        "contrast documenting why cell count must track the corpus; its",
        "shipped replacement is `knn_fully_trained_ivfpq` (trained",
        "centroids, corpus-scaled coarse_k, 1.1-1.6x rows above), plus",
        "`knn_residual_ivfpq` for the IVFADC variant.",
        "",
        "## Findings",
        "",
        "1. **LSH bucket bits must grow with log(N).** The original",
        "   registry layout (4 bands x 4-bit buckets = 16 buckets/band)",
        "   went 2.4s -> 111s at 10x: random-pair bucket collisions scale",
        "   as N²·bands/2^bits, so fixed-bit buckets turn a linear plan",
        "   quadratic. The `emb_blocked_8x8` row (8-bit buckets, same",
        "   operator) restores near-linear cost. SINCE ROUND 10 the",
        "   registry queries size the width from the corpus themselves:",
        "   `operators/scale_params.lsh_n_planes` = max(8, floor(log2 N)",
        "   - 4) — the coarse_k recipe applied to LSH — wired through",
        "   `q_embed.block_bands` into dedup_embedding_blocked AND",
        "   dedup_embedding_multiprobe (recall lost to narrower buckets is",
        "   bought back query-side by multiprobe, zero index growth). The",
        "   formula floors at 8 planes for every oracle-verification",
        "   corpus (<= 4095 vectors), so static oracle SQL stays",
        "   bit-valid; the `emb_blocked_kscaled` row runs the 10-plane",
        "   layout the formula picks at sf1 through the registry code",
        "   path, and `lsh_band_plan` reports the decision as data.",
        "2. **Tail thresholds make the TRUE output quadratic.** On the",
        "   synthetic 64-dim vectors, cosine 0.4 is the random tail (920 of",
        "   2M sf0.1 pairs pass; median 0.419, only 1 pair >= 0.6), so ANY",
        "   exact algorithm's result grows ~N² at that threshold. Real",
        "   dedup thresholds sit in the deep tail (0.9+ for near-identical",
        "   text embeddings), where output — and LSH cost — stays linear;",
        "   the probe's 0.55 threshold models that regime.",
        "3. The banded/bucketed text-dedup family (minhash, simhash, capped",
        "   jaccard, incremental, CC) scales sub-linearly in wall-clock at",
        "   10x on local[32] because sf0.1 under-fills the 32 cores;",
        "   shuffle bytes grow ~linearly as designed. SimHash's scale knob",
        "   is fingerprint LENGTH (the pigeonhole split is pinned at",
        "   max_hamming+1 = 4 bands): since r11 the registry runs 120-bit",
        "   fingerprints (operators/simhash_wide, 4 x 30-bit bands — the",
        "   dedup_simhash row above measures THAT code path), whose random",
        "   band collisions N^2*4/2^30 stay linear to N ~ 10^9-10^10; the",
        "   60/15-bit layout (retained in operators/dedup.py for unit",
        "   tests) saturates at N ~ 10^5-10^6 and the original 32/8-bit",
        "   one measured 9.5x at 10x.",
        "4. **IVF cell count must grow with N** — the vector-index twin of",
        "   finding 1. With k FIXED at 8 cells, 10x data puts 10x vectors",
        "   AND 10x queries in every cell, so probe pairs grow 100x:",
        "   the k=8 configurations measured ~19x at 10x (quadratic, not",
        "   linear). Since round 9 the registry queries themselves grow",
        "   k = max(8, N/250) (q_cluster.coarse_k — constant expected cell",
        "   size, the standard sqrt(N)-to-N/const IVF sizing), paying a",
        "   k*dim-literal assign and k-proportional training cost to keep",
        "   per-query probe work flat; the formula yields exactly k=8 at",
        "   every oracle-verification scale (n <= 2000 vectors), so the",
        "   unrolled-Lloyd oracles stay bit-identical to the engine, while",
        "   this table's sf1 runs exercise k=80. `knn_trained_pq_kscaled`",
        "   remains as the cold-path probe of the same law.",
        "   MEASURED in round 9 (two independent probe runs):",
        "   knn_fully_trained_ivfpq 5.5x -> 1.6x/1.1x, knn_residual_ivfpq 5.5x ->",
        "   2.0x/1.6x, knn_trained_ivfpq_refine 6.6x -> 2.9x/2.8x,",
        "   knn_hard_negatives 4.6x -> 1.5x/1.0x at 10x. The frozen fixed-k",
        "   knn_ivfpq (19-22x in r8/r9) moved to the excluded-on-purpose",
        "   list in r10 — see above the Findings.",
        "5. **Residual coding's recall win is occupancy/scale-dependent**",
        "   (measured r10, recall@3 vs the exact-L2 GT on this synthetic",
        "   random-tail corpus): sf0.01 (N=500, k=8, ~62/cell) residual",
        "   0.400 vs fully-trained 0.300 (+10pt); sf0.1 (N=2000, k=8,",
        "   ~250/cell) 0.150 vs 0.183 (-3.3pt — the r9 sf0.01 win does NOT",
        "   generalize); sf1 (N=20000, corpus-scaled k=80, ~250/cell)",
        "   0.0708 vs 0.0617 (+1.1pt). Below the coarse_k knee, recall",
        "   tracks cell occupancy, not coding scheme; absolute values are",
        "   low because single-probe recall against a random-tail GT is",
        "   intrinsically capped (finding 2). Keep both configs and let",
        "   the recall evals arbitrate per corpus.",
        "   REMEDIED in r11 by the third corpus-scaled parameter:",
        "   nprobe = max(2, isqrt(k)) (scale_params.ivf_nprobe) plus an",
        "   ADC reorder depth of 10 per probed cell — nprobe=2 alone left",
        "   residual recall flat at sf0.1 (0.175: the fixed depth-10",
        "   shortlist became the binding constraint; more candidates",
        "   competed for the same reorder slots). Measured recall@3 vs",
        "   the r10 single-cell config: fully-trained 0.300 -> 0.467",
        "   (sf0.01) and 0.150 -> 0.258 (sf0.1); residual 0.400 -> 0.567",
        "   and 0.175 -> 0.225 — the occupancy knee pushed out at both",
        "   scales. Where the formula ENGAGES (sf1: k=80, nprobe=8,",
        "   reorder depth 80) the lift is largest: recall@3 fully-trained",
        "   0.0617 -> 0.266, residual 0.0708 -> 0.293 (~4x) — and",
        "   residual coding is back AHEAD of raw coding at high",
        "   occupancy once the probe is wide enough, consistent with the",
        "   sf0.01 ordering. The search rows' sf1 TABLE ratios (14-17x)",
        "   are anchor-volume artifacts — the probe's query count grows",
        "   with N by construction; per-query cost grew 1.4-1.7x at 10x",
        "   corpus (sublinear, the design target), see the row notes.",
        "6. **Min-of-min ratios across differently-contended passes skew",
        "   high** — the r10 probe showed the inverted-index family at",
        "   6.1-8.4x while the ledger A/B protocol (otherwise-idle host,",
        "   min-of-3 solo, warm fixtures, both scales in one session)",
        "   measured dedup_ngram_jaccard_capped 3.72->8.38s = 2.3x,",
        "   dedup_ngram_jaccard 1.55->6.16s = 4.0x (the labeled sum(df^2)",
        "   baseline), text_tfidf_neighbors 2.56->4.64s = 1.8x,",
        "   sketch_histogram_quantiles 1.40->2.79s = 2.0x — all at or",
        "   better than their r9 ratios. Fourth consecutive round a",
        "   cross-pass 'regression' in this family resolved as host",
        "   contention under the A/B protocol; trust the A/B rows over",
        "   the table where they disagree.",
        "7. **A single-row-group parquet scan freezes parallelism at one",
        "   task** — and a heavy per-row map on top of it turns a linear",
        "   operator superlinear IN WALL CLOCK even though its work is",
        "   linear: sketch_cms_topk measured 23x at 10x (r11 bench)",
        "   because its d x N salted-md5 fan-out ran entirely on the",
        "   documents file's single input split (maxPartitionBytes cannot",
        "   split below a row group). The fix is the word_shingles guard",
        "   — repartition to default parallelism before the expensive",
        "   map when the scan arrives narrower — applied in r12 (16.7 ->",
        "   1.5 s solo at sf0.1). The guard is inert at production split",
        "   counts; the audit point is that EVERY operator whose cost is",
        "   a per-row map over a table that may arrive in few splits",
        "   (local fixtures, small dimension tables, freshly-compacted",
        "   single-file outputs) needs it, and the cheap column-expr",
        "   text battery does not (fixed job overhead dominates there).",
        "",
    ]
    with open(os.path.join(HERE, "BENCH_scale.md"), "w") as fh:
        fh.write("\n".join(lines))
    print("wrote BENCH_scale.md")


if __name__ == "__main__":
    main()
