"""Physical-plan + execution audit of the flagship queries -> PLANS.md.

Two kinds of evidence, clearly separated:
- STATIC plan facts (join strategies chosen, nested-loop check, parquet
  pushdown + column pruning) parsed from `.explain("formatted")`. Node
  counts in the static tree overstate work — DataFrame reuse prints a
  subtree per reference — so the table reports only strategy presence
  (any SMJ? any nested loop?) from it, never counts.
- DYNAMIC execution facts (jobs, stages — each shuffle boundary is a
  stage — and actual shuffle read/write bytes from the UI REST API),
  measured by running each query in its own job group. These are the
  numbers that scale: stages ~ shuffles actually executed after AQE stage
  reuse, shuffle MB is the data that really moved.

Regenerate after plan-affecting changes:  python tools/plan_audit.py
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

AUDIT = [
    ("q1_pricing_summary", "TPC-H Q1: one scan, partial+final agg"),
    ("s2_point_lookup", "point lookup: filter reaches the scan"),
    ("j6_banding_join", "fingerprint banding join"),
    ("match_cascade_full", "full match cascade"),
    ("dedup_minhash_lsh", "MinHash LSH dedup"),
    ("dedup_ngram_jaccard_capped", "df-capped jaccard + size-bound prune"),
    ("dedup_embedding_blocked", "8x8 LSH blocking (log2(N) buckets)"),
    ("dedup_embedding_multiprobe", "multiprobe LSH embedding pairs"),
    ("x_d2d_request", "d2d intake: map-only projection"),
    ("kmeans_train", "Lloyd k-means: literal-centroid map + k*dim shuffle"),
    ("dedup_semantic", "SemDeDup: cell equi-join, centroid-priority keep"),
    ("knn_ivfpq", "IVFPQ: cell equi-join over 4-byte PQ codes, ADC rank"),
    ("text_boilerplate_scrub", "percentile-DF boilerplate scrub, map-heavy"),
    ("knn_trained_ivfpq_refine", "train -> cell+PQ index -> probe -> exact re-rank"),
    ("match_post_assign", "match-post assignment (r6 bench regression pin)"),
    ("snippet_match_pipeline", "snippet inverted-index match (r6 bench regression pin)"),
    ("x_debian_lslr_map", "debian ls-lR listing map (r6 bench regression pin)"),
    ("shuffle_global", "global shuffle rank (broadcast offsets)"),
    ("corpus_curate_pipeline", "end-to-end curation flagship"),
    ("t_tumbling_rollup_daily", "watermarked tumbling rollup (batch face)"),
    ("select_dsir", "DSIR: histogram to driver, literal-array map-only score"),
    ("text_repeated_span_scrub", "ExactSubstr scrub: dup-gram shuffle join"),
    ("dedup_simhash", "120-bit simhash_wide, 4x30-bit pigeonhole bands (r11)"),
    ("select_perplexity_buckets", "CCNet LM broadcast join + per-lang terciles"),
    ("select_quality_classifier", "hashed linear model, map-only fold"),
    ("j1_fk_join_bucketed", "storage-bucketed FK join: zero-Exchange SMJ"),
    ("bpe_train", "BPE trainer artifact: token-frequency view"),
    ("bpe_encode_stats", "corpus x vocab encode join"),
    ("pack_bpe_budget", "BPE-token packing: shard window cumsum"),
    ("dedup_bloom", "Bloom gate: <=m-row broadcast bit table"),
    ("select_domain_cap", "per-source rank cap + TakeOrdered budget"),
    ("text_chunk_overlap", "map-only overlap chunking"),
    ("x_bah128_dir_content", "BAH128 dir index read (materialized fixture)"),
    ("select_unimax_budget", "UniMax waterfilling on the language aggregate"),
    ("embed_random_projection", "JL Rademacher projection: HOF folds, codegen-safe"),
    ("embed_projected_blocked", "JL sign-bit bands + exact 64-d verify"),
    ("select_gopher_rules", "Gopher gate battery + repetition word groupBy"),
    ("j13_skew_salted_join", "salted hot-key fact-to-dim join"),
    ("mix_temperature_sampling", "sqrt-smoothed language mixture on the e6 grid"),
    ("corpus_funnel_report", "4-stage funnel: gate booleans + stack unpivot"),
    ("knn_hard_negatives", "trained-cell probe + near-dup exclusion + top-k"),
    ("knn_recall_eval", "recall@3 harness: GT scan + 2 IVF configs + mark join"),
    ("pq_train", "8 sub-quantizer fits + one-scan encode + code sizes"),
    ("knn_fully_trained_ivfpq", "trained cells + trained-PQ ADC (e6 grid) + exact refine"),
    ("knn_recall_fully_trained", "shipped-config recall: GT scan + mark join + 1-row agg"),
    ("ann_index_stats", "k-row cell agg + tiny-frame windows"),
    ("bpe_fertility_by_lang", "encode join + language agg"),
    ("dedup_recall_eval", "LSH-vs-exact-jaccard mark join + 1-row agg"),
    ("j14_asof_join", "as-of join: union+tag, one window per user, zero join"),
    ("j15_interval_bin_join", "interval join: bin-explode broadcast equi-join"),
    ("sketch_hll_distinct", "HLL registers (types x 64) + exact-distinct baseline"),
    ("sketch_cms_topk", "Count-Min d x w counters + exact top-k mark join"),
    ("sketch_histogram_quantiles", "cent histogram + cum walk + exact-rank baseline"),
    ("knn_residual_ivfpq", "IVFADC: residual-trained PQ, query-residual ADC + refine"),
    ("sketch_hll_merge_daily", "daily HLL shards MAX-merge == direct (engine-checked)"),
    ("sample_weighted_per_group", "ES weighted keys + per-group top-k window"),
    ("layout_zorder_skipping", "distributed exact-rank bucketing x3 + envelope agg"),
    ("sketch_kmv_intersect", "two-phase bottom-k + broadcast pair frame; exact baseline"),
    ("split_leakage_safe", "cluster-hash split + pair accounting over materialized state"),
    ("knn_recall_residual", "IVFADC recall vs shared exact-L2 GT fixture + mark join"),
    ("lsh_band_plan", "corpus-scaled width formula as data: 2 count aggs"),
    ("text_chunk_windows", "map-only explode(sequence) char windows"),
    ("chunk_shared_across_docs", "chunk fan-out + one md5 hash-groupBy"),
    ("embed_recall_blocked", "banding recall vs all-pairs GT + candidate efficiency"),
    ("sketch_histogram_merge", "daily bin shards SUM-merge == direct (engine-checked)"),
]

LEDGER = [
    "## Round-11 ledger",
    "",
    "- **Opening batch merged as the first action (the r10 verdict's #1",
    "  ask)** — the `r11-opening-batch` ref was lost to the driver's",
    "  round-boundary reset but the commit survived as a dangling object",
    "  (recovered via `git fsck`, re-branched, merged clean): pidfile-",
    "  idleness eviction TTL + the 120-bit SimHash registry rewiring both",
    "  landed, then `tools/query_hashes.py update` recorded the r10",
    "  greens. Three full 200-query Spark-vs-DuckDB sweeps ran green this",
    "  round (post-merge+lockfix, post-nprobe/embed-fix, closing).",
    "- **Window arithmetic, revised: 71 claimants, not ~48.** Recording",
    "  the r10 greens first exposed the full transitive closure of the",
    "  merge (fixture_cache + q_dedup + scale_params reach 70 oracle-",
    "  bearing queries; +1 never-verified). The LRU rotation would have",
    "  spilled exactly the queries whose semantics CHANGED (they were",
    "  green in r10, so least-priority under LRU) — __spark_entry__ now",
    "  pins a `_SEMANTIC_PRIORITY` list ahead of the LRU order:",
    "  dedup_simhash (120-bit rewiring), embed_recall_blocked (oracle",
    "  cardinality fix), and the four nprobe-upgraded knn queries claim",
    "  slots first; 21 closure-only restales (caching-internals-only",
    "  hash drift, byte-identical plans) spill to r12's open window —",
    "  the spill list is in tools/claimants.py output, committed",
    "  knowingly.",
    "- **Third corpus-scaled parameter: IVF nprobe (+ reorder depth).**",
    "  scale_params.ivf_nprobe(k) = max(2, isqrt(k)) — nprobe ~",
    "  sqrt(nlist) — wired into knn_fully_trained_ivfpq and",
    "  knn_residual_ivfpq (per-probe query residuals, the faithful",
    "  IVFADC construction); ADC reorder depth rides the probe count",
    "  (10/probed cell) after nprobe=2 alone left residual recall FLAT",
    "  at sf0.1 (0.175 — the fixed depth-10 shortlist was the binding",
    "  constraint). Measured recall@3 vs the r10 single-cell config:",
    "  fully-trained 0.300->0.467 (sf0.01), 0.150->0.258 (sf0.1);",
    "  residual 0.400->0.567, 0.175->0.225; where the formula ENGAGES",
    "  (sf1, k=80, nprobe=8): 0.0617->0.266 and 0.0708->0.293 (~4x).",
    "  Oracles bake nprobe=2/depth=20 at the verification k=8 (the",
    "  coarse_k contract); a new test pins every verification corpus",
    "  below ALL the corpus-scaling floors (ADVICE #4).",
    "- **120-bit SimHash proved at scale (the r10 verdict's #2 ask):**",
    "  BENCH_scale's dedup_simhash row now measures the simhash_wide",
    "  registry path — 1.0x at 10x; finding 3 records the width history",
    "  (32/8-bit 9.5x, 60/15-bit saturates ~10^5-10^6 docs, 120/30-bit",
    "  linear to ~10^9-10^10).",
    "- **2 GB mega-oracle probe (the #3 ask), all clean this round:**",
    "  dedup_simhash (the 120-vote relational re-derivation) 0.29 s,",
    "  knn_fully_trained_ivfpq 1.20 s, knn_recall_fully_trained 1.18 s,",
    "  knn_residual_ivfpq 1.22 s, knn_recall_residual 1.07 s,",
    "  embed_recall_blocked 0.55 s — every changed/new oracle under",
    "  `SET memory_limit='2GB'`, no OOM (the MATERIALIZED convention",
    "  held).",
    "- **Band-index compaction/TTL face (the #5 ask):**",
    "  streaming/compact_stream.py — generation-pointer layout (write",
    "  the full new index under gen=<g>, atomic CURRENT swap via",
    "  os.replace, explicit prune), optional retained-docs semi-join (the",
    "  TTL policy lives with the document ledger); dedup_stream reads and",
    "  appends resolve through the pointer. The twelfth pytest-pinned",
    "  streaming face: streamed == batch with a compaction mid-stream,",
    "  retention bounds index to the window, half-written generations",
    "  invisible to readers, replay idempotent.",
    "- **r12 opening batch pre-built on the local branch",
    "  `r12-opening-batch` (tip 418695f: minhash_band_plan + dedup_cost_plan, both oracle-MATCH-verified at sf0.01 + unit-tested — recoverable from the",
    "  dangling object via `git fsck` if the ref is lost to a driver",
    "  reset, as r11's was): `minhash_band_plan`, the MinHash (b, r)",
    "  threshold dashboard (lsh_band_plan's twin — the one MinHash scale",
    "  decision the r10 audit left unpublished-as-data), verified MATCH",
    "  vs its oracle at sf0.01 + unit-tested. Kept OFF main so r11's",
    "  over-subscribed window spends every slot on re-greens; a new",
    "  never-checked query registers at the rotation front and would",
    "  displace one.",
    "- **Closing evidence**: three full 200-query sweeps 200/200 MATCH,",
    "  pytest 777/777 (600 s), solo sf0.1 bench 158.7 s / 201 queries",
    "  (r10 solo: 170.6 s; dedup_simhash 0.55 -> 0.32 s off the wide",
    "  fingerprint fixture), bench_full.json refreshed at the sf0.01",
    "  convention (104.2 s / 201).",
    "- **All four r10 ADVICE items fixed:** (1) fixture_cache get/evict/",
    "  insert under one module lock (prebuild's concurrent chains raced",
    "  the stale-key scan — snapshot iteration + pop; builds stay",
    "  outside); (2) embed_recall_blocked's oracle output driven by",
    "  cstats LEFT JOIN marked aggregates, so the zero-GT degenerate",
    "  corpus yields 2 zero rows in both engines; (3) chunk_stream's",
    "  two-append crash window closed with epoch-partition overwrites",
    "  (dedup guards exclude the epoch's own possibly-partial partition;",
    "  partial commits self-heal — new crash-simulation test); (4) the",
    "  scaling-floor invariant is a loud test, not a stderr warning.",
    "",
    "## Round-10 ledger",
    "",
    "- **LSH band width corpus-scaled in the registry** (BENCH_scale",
    "  finding 1 promoted from probe to shipped plans — the same",
    "  fixed-parameter bug class as the r9 IVF-k fix):",
    "  `operators/scale_params.lsh_n_planes` = max(8, floor(log2 N) - 4)",
    "  planes per band, memoized per (session, corpus), wired through",
    "  `q_embed.block_bands` into dedup_embedding_blocked and",
    "  dedup_embedding_multiprobe (now probing the production block index;",
    "  the 4-bit recall fixture is test-only). Formula floors at the",
    "  oracle-baked 8 planes for every corpus <= 4095 vectors, engages 10",
    "  planes at the 20k-vector sf1 probe (`emb_blocked_kscaled` row), and",
    "  `lsh_band_plan` reports the decision as data via the identical",
    "  float-free bit-length SQL in both engines. Audit of the other",
    "  banded families recorded in their docstrings: MinHash band keys",
    "  live in a 2^120 VALUE space (Jaccard-governed, no bucket",
    "  saturation — no corpus scaling needed); SimHash width is pinned by",
    "  the pigeonhole split, so its scale knob is fingerprint LENGTH",
    "  (120-bit -> 30-bit bands), deferred to the round-11",
    "  operators/dedup.py batch (window arithmetic below).",
    "- **Verification-window arithmetic (why two r9-advice items moved to",
    "  r11's opening batch).** Editing fixture_cache.py re-stales 48",
    "  driver-verified queries, operators/dedup.py 37, operators/knn.py 49",
    "  (transitive-import closures, tools/query_hashes.py). Round 10",
    "  opened with 25 stale; this round's shared-module batch was chosen",
    "  to fit the ~50-slot driver window: q_embed/q_dedup/q_kmv/",
    "  q_cluster/q_sketch/q_layout edits (+18 restaled) + 3 new queries =",
    "  ~47 oracle-bearing claimants. The pidfile-TTL advice",
    "  (fixture_cache.py:529) and the SimHash fingerprint-length upgrade",
    "  (operators/dedup.py) are therefore scheduled as ROUND-11's OPENING",
    "  commit, where their ~48-query restale fills that round's window",
    "  alone instead of overflowing this one — and that commit is ALREADY",
    "  BUILT AND TESTED on the local branch `r11-opening-batch` (pidfile",
    "  idleness TTL + 120-bit SimHash rewiring; a FULL 200-query sweep",
    "  ran on that branch: 200 MATCH / 0 MISMATCH; merge it first, then",
    "  run tools/query_hashes.py update) (r9 spilled 25 queries by",
    "  editing shared modules mid-round; every r10 edit landed in the",
    "  first commits instead).",
    "- **knn_ivfpq resolved as an excluded labeled baseline.** The frozen",
    "  shipped-centroid IVFPQ (19-22x at 10x in r8/r9) left the scale",
    "  probe's measured set for the excluded-on-purpose list (BENCH_scale)",
    "  with an explicit pointer to its replacement",
    "  (knn_fully_trained_ivfpq; residual variant knn_residual_ivfpq); its",
    "  registry docstring now leads with the LABELED FIXED-k BASELINE",
    "  status. No measured registry row above ~4x at 10x remains without",
    "  a GT/baseline label.",
    "- **Residual-IVFADC recall at sf0.1: the sf0.01 win does NOT",
    "  generalize — recorded as a negative result.** recall@3 at sf0.01:",
    "  residual 0.40 vs fully-trained 0.30 (+10pt, the r9 claim); at",
    "  sf0.1: residual 0.150 vs fully-trained 0.183 (-3.3pt). Both",
    "  configs drop with scale because every verification corpus floors",
    "  coarse_k at k=8, so sf0.1 quadruples cell occupancy (250",
    "  vectors/cell) while top-3 stays fixed; below the coarse_k knee the",
    "  recall trend tracks occupancy, not coding scheme. Conclusion:",
    "  residual coding is not a free win at all scales/occupancies —",
    "  keep both configs and re-evaluate per corpus (the recall evals",
    "  exist exactly for this); sf1 values in BENCH_scale finding 5.",
    "- **New-mega-oracle memory probe (r9 ask): one real catch.**",
    "  sketch_kmv_intersect passes a 2 GB DuckDB cap in 0.07 s;",
    "  split_leakage_safe OOM'd at 2 GB — its plain CTEs re-expanded the",
    "  N^2 shingle self-join at every reference (the exact r8",
    "  knn_residual_ivfpq failure class). shingles/pairs/near/edges/tall",
    "  are now AS MATERIALIZED: 0.10 s at 2 GB, 0.11 s at 1 GB.",
    "- **Prebuild wall halved by concurrent submission: 63.2 -> 27.7 s",
    "  solo sf0.1** (r9 ask: creep 42 -> 51 -> 66 s). Per-artifact solo",
    "  profile first (prebuild_fixtures_timed): doc_fingerprint_base",
    "  12.2 s, residual_code_index 10.3 s, trained_pq_codebooks 6.7 s,",
    "  everything else 0.4-3.5 s — all genuine training/index artifacts,",
    "  nothing droppable; the waste was SEQUENTIAL submission underfilling",
    "  local[32] with sub-second stages. fixture_warmup now submits",
    "  independent artifact chains concurrently (dependencies sequential",
    "  within a thread; distinct cache keys across threads; one serial",
    "  step first for the stale-key eviction scan). One prebuild line was",
    "  also genuinely dropped: the recall4 band index (multiprobe",
    "  re-pointed at the block index).",
    "- **r10 probe-table inverted-index ratios: contention, pinned (4th",
    "  consecutive).** The fresh BENCH_scale table showed the family at",
    "  6.1-8.4x vs r9's 2.9-4.3x, moving together across both scales'",
    "  separately-contended passes. The ledger A/B protocol (idle host,",
    "  min-of-3 solo, warm fixtures, both scales in one session):",
    "  capped 2.3x, uncapped 4.0x (the labeled sum(df^2) baseline),",
    "  tfidf 1.8x, histogram-quantiles 2.0x — at or better than r9.",
    "  Recorded as BENCH_scale finding 6; trust A/B rows over",
    "  cross-pass min-of-min ratios where they disagree.",
    "- bench_full.json restored to the committed-at-sf0.01 convention",
    "  (r9 hygiene note), and the convention is now SELF-ENFORCING:",
    "  bench.py writes the committed name only for sf0.01 runs and a",
    "  gitignored bench_full_sf{X}.json scratch otherwise (an ad-hoc",
    "  sf0.1 run overwrote the artifact twice before). This round's",
    "  sf0.01 runs: 129.6-136.0 s shared-host, 98.3 s idle-host closing",
    "  run / 199-201 queries (prebuild 46.8 s sequential -> 14.8-31.8 s",
    "  concurrent); solo sf0.1 reference: 170.6 s / 201 queries vs r9's",
    "  201.9 s / 196.",
    "- Advice fixes landed with the opening batch: q_kmv estimator",
    "  numerator derived from _KMV_K and NULL user_id/ts filtered",
    "  identically in both engines before bottom-k ranking (Spark ranks",
    "  NULL first, DuckDB last); q_sketch/q_layout degenerate-range guard",
    "  — when the observed key range yields too few prefix groups, the",
    "  group key extends with the tie-break column's range (stays",
    "  monotone/contiguous; covers the constant-column worst case an",
    "  approx-quantile fallback cannot); q_cluster.coarse_k warns loudly",
    "  when the corpus-scaled k diverges from the oracle-baked literal.",
    "",
    "## Round-9 ledger",
    "",
    "- **r8 inverted-index regression: noise, pinned.** The r8 driver",
    "  bench showed `dedup_ngram_jaccard` 1.18 -> 2.46 s (2.08x — beyond",
    "  the documented +/-20% envelope) with the capped twin and tfidf",
    "  moving together. `git diff` between the r7/r8 tested trees shows",
    "  q_dedup.py and the posting fixtures byte-identical. The r7 ledger",
    "  protocol (otherwise-idle local[32], bench.py's exact warmup +",
    "  fixture sequence, min-of-3 at sf0.1, tools/ab_ngram.py) measures:",
    "  dedup_ngram_jaccard **1.42 s**, dedup_ngram_jaccard_capped",
    "  **2.68 s**, text_tfidf_neighbors **1.52 s** — all back at their r7",
    "  levels with no code change. Same signature and same resolution as",
    "  the r6/r8 contention clusters: the whole family moved together in",
    "  ONE driver run and recovered solo.",
    "- **Mega-oracle memory audit (the r8 OOM's closure).** All 14",
    "  largest oracles (195 KB knn_ivfpq down through kmeans_train)",
    "  re-probed under an explicit `SET memory_limit='2GB'`: every one",
    "  completes in 0.1-2.0 s. The one structure that needed the",
    "  MATERIALIZED keyword was knn_residual_ivfpq's `residuals` CTE",
    "  (a derived CTE feeding 8 unrolled Lloyd chains — DuckDB inlines",
    "  plain CTEs and re-expanded the coarse-training subtree at every",
    "  reference: OOM at 4 GB -> 1.1 s at 1 GB after the keyword). The",
    "  other mega-oracles' chains take base views as input, which is why",
    "  they were always affordable. Convention recorded: any CTE fed into",
    "  kmeans_cells_ctes or referenced by multiple chains must be",
    "  MATERIALIZED.",
    "- **IVF k now corpus-scaled in the registry** (BENCH_scale finding",
    "  4's remedy promoted from probe to shipped plans): q_cluster's",
    "  kmeans_cell_index/residual consumers request",
    "  k = max(8, n_vectors // 250). The formula yields exactly k=8 at",
    "  every oracle-verification scale, so the unrolled oracles stay",
    "  bit-identical; the sf1 probe exercises k=80 through the same",
    "  code path.",
    "- `layout_zorder_skipping`'s insertion-layout prefix divisor now",
    "  derives from max(l_orderkey)//64 — the fixed 2^20 literal put the",
    "  whole corpus in ONE rank group below sf~10, silently re-creating",
    "  the single-partition window the distributed rank replaced.",
    "",
    "## Round-8 ledger",
    "",
    "- `layout_zorder_skipping` shipped at 12.25 s (sf0.1) with three",
    "  single-partition ntile sorts, then was re-planned as a distributed",
    "  exact rank (prefix-group by leading key bits + broadcast cumulative",
    "  offsets + the ntile remainder formula): **8.9 s** on the quietest",
    "  A/B run, identical oracle output; at sf1 the re-plan measured",
    "  19.9 s vs 39.8 s for the ntile version. BENCH_scale.md carries the",
    "  re-planned shape; its absolute layout numbers move up to ~60%",
    "  between solo probe runs (12.7/32.0 in the final table) — the",
    "  long-session checkpoint/GC variance the r6/r7 ledgers document —",
    "  while the ~2-2.5x @ 10x shape is stable.",
    "- `knn_recall_eval` / `knn_recall_fully_trained` gained ~0.6 s each:",
    "  the advisor fix derives `possible` from the materialized ground",
    "  truth (localCheckpoint + count) instead of k x anchors — one extra",
    "  job, correct on sparse corpora where an anchor has fewer than k",
    "  eligible neighbors.",
    "- `x_cargo_gem_collect/_map` and `x_cd_harvest_packages` moved",
    "  +8.3/+5.0/+3.8 s in one mid-round sf0.01 run with no code change",
    "  (median per-query delta that run: +0.02 s). Same signature as the",
    "  r6 shared-host contention cluster — and resolved the same way: the",
    "  round-final solo runs show x_cargo_gem_collect at 2.5 s (sf0.01) /",
    "  2.2 s (sf0.1), back at its r7 level. Round-final bench: 190",
    "  queries, 114.7 s at sf0.01 (r7: 108.4 s / 184 — per-query flat",
    "  while adding 6), 176.5 s at sf0.1.",
    "",
    "## Round-7 regression ledger (the r6 driver-bench regressions)",
    "",
    "A/B re-measured on an otherwise idle local[32], bench.py's exact warmup",
    "+ fixture sequence, min-of-3 per query at sf0.1:",
    "",
    "| query | r5 driver | r6 driver | r7 A/B | verdict |",
    "|---|---|---|---|---|",
    "| match_post_assign | 1.46 | 2.45 | **1.01** | r6 number was machine"
    " noise — no code change touched it, now faster than r5 |",
    "| snippet_match_pipeline | 2.16 | 2.83 | **1.69** | same: recovered"
    " below r5 with no code change |",
    "| x_debian_lslr_map | 1.83 | 2.34 | **1.72** | same: recovered below"
    " r5 with no code change |",
    "| dedup_embedding_multiprobe | 3.72 | 5.50 | **1.93** | real + fixed:"
    " the emb_band_index fixture (r6 tail commit) removed the per-query"
    " hyperplane-matrix codegen |",
    "",
    "The three \"no code change\" rows moved together in the r6 driver run",
    "and together again here, consistent with shared-host contention during",
    "that run, not with any plan change (their plans are byte-identical",
    "across the rounds).",
    "",
]


def static_facts(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return {
        "has_smj": "SortMergeJoin" in plan,
        "has_bhj": "BroadcastHashJoin" in plan,
        "nested_loop": bool(
            re.search(r"NestedLoopJoin|CartesianProduct", plan)
        ),
        "pushed": sorted(set(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))),
        "read_schemas": sorted(
            set(re.findall(r"ReadSchema: ([^\n]*)", plan))
        ),
    }


def shuffle_totals(spark) -> tuple[int, int]:
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


def main() -> None:
    from purldb_spark.plans.registry import QUERIES, load_inventory
    from purldb_spark.session import get_spark

    spark = get_spark("plan_audit", extra_conf={"spark.ui.enabled": "true"})
    load_inventory()
    sc = spark.sparkContext

    # fixtures are pipeline-maintained state, not per-query work: prebuild
    # them OUTSIDE any job group so first-touch queries don't absorb the
    # build shuffle into their measured rows
    from purldb_spark.plans.fixture_warmup import prebuild_fixtures

    prebuild_fixtures(spark, SF)

    rows = []
    details = []
    for name, note in AUDIT:
        # snapshot + job group BEFORE building the DataFrame: operators with
        # convergence loops (connected components) run actions during
        # construction, and that work belongs to the query
        r0, w0 = shuffle_totals(spark)
        sc.setJobGroup(name, name)
        df = QUERIES[name](spark, SF)
        st = static_facts(df)
        df.count()
        sc.setJobGroup("", "")
        r1, w1 = shuffle_totals(spark)
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup(name)
        stages: set[int] = set()
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info:
                stages.update(info.stageIds)
        joins = (
            ("BHJ" if st["has_bhj"] else "")
            + ("+SMJ" if st["has_smj"] else "")
        ).lstrip("+") or "none"
        rows.append(
            f"| {name} | {len(jobs)} | {len(stages)} |"
            f" {round((r1 - r0) / 1e6, 1)} / {round((w1 - w0) / 1e6, 1)} |"
            f" {joins} | {'YES' if st['nested_loop'] else 'no'} | {note} |"
        )
        if st["pushed"] or st["read_schemas"]:
            details.append(
                f"### {name}\n\n"
                + "".join(f"- PushedFilters: `[{p}]`\n" for p in st["pushed"] if p)
                + "".join(
                    f"- ReadSchema: `{s.strip()}`\n" for s in st["read_schemas"]
                )
            )

    lines = (
        [
            "# PLANS — plan + execution audit of the flagship queries",
            "",
            f"Generated by `tools/plan_audit.py` against `{SF}`. Jobs/stages/",
            "shuffle-MB are MEASURED (each shuffle boundary is a stage, after",
            "AQE stage reuse); join strategy and nested-loop presence come",
            "from the static plan; scan pushdown/pruning evidence below.",
            "",
            "| query | jobs | stages | shuffle R/W MB | joins | nested-loop | note |",
            "|---|---|---|---|---|---|---|",
        ]
        + rows
        + [
            "",
            "The only intentional nested-loop plans in the registry are the",
            "labeled ground-truth baselines (`knn_bruteforce`,",
            "`dedup_embedding_cosine`) and the recall harnesses whose",
            "ground-truth side IS such a labeled scan (`knn_recall_eval`,",
            "`knn_recall_fully_trained`, `knn_recall_residual`,",
            "`embed_recall_blocked` — the approximate sides under evaluation",
            "stay banded/cell-bounded equi-joins); every other query is",
            "fenced to equi-join shapes by `tests/test_plan_shapes.py`.",
            "",
        ]
        + LEDGER
        + [
            "## Scan evidence (pushdown + pruning)",
            "",
        ]
        + details
    )
    with open(os.path.join(HERE, "PLANS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
