"""Corpus-scaled index parameters — BENCH_scale.md finding 1 as a recipe.

Random-pair collisions in a b-bit LSH bucket layout scale as
N^2 * bands / 2^b: any FIXED bucket width turns a linear blocking plan
quadratic once the corpus outgrows it (measured: the 4-bit embedding
layout went 2.4 s -> 111 s at 10x data; the frozen k=8 IVF probed 22.3x
at 10x until q_cluster.coarse_k corpus-scaled it). The remedy is the same
every time: grow the parameter with log2(N) so per-bucket occupancy stays
flat, memoize per (appId, corpus) so one count() sizes the whole session,
and pin the formula so it yields the ORACLE-BAKED constant at every
verification scale — static DuckDB oracle SQL stays bit-valid where the
driver compares, and the larger widths engage only at probe/production
scales where no oracle runs.

This module holds the shared recipe; q_cluster.coarse_k (IVF cell count)
is the same pattern specialized to cell counts and predates it.

Parameters audit (round 10), one entry per banded/bucketed family:

* Embedding hyperplane LSH (q_embed): bucket width = planes per band.
  CORPUS-SCALED here via ``lsh_n_planes`` — max(8, floor(log2 N) - 4):
  8 bits at N <= 4095 (every verification corpus: 500/500/2000), 10 bits
  at the 20k-vector sf1 probe, ~log2(N)-4 beyond (2^(b) buckets hold
  per-band occupancy at ~16 vectors regardless of N). Recall lost to
  narrower buckets is bought back on the query side by multiprobe
  (operators/knn.multiprobe_expand), which does not grow the index.
* MinHash LSH (q_dedup): NOT bucket-width-bound — band keys are
  concatenated 60-bit min-hash VALUES, so the key space is 2^120 and
  random-pair collisions are governed by the Jaccard similarity
  distribution (P ~ J^r per band), not by N^2/2^bits saturation. The
  scale knobs there are b (bands) and r (rows/band) setting the
  similarity threshold t ~ (1/b)^(1/r); no corpus-dependent width needed.
* SimHash (q_dedup): band width IS pinned by the pigeonhole
  correctness constraint (hamming <= 3 over 4 bands needs exactly 4
  bands), so the only scale knob is fingerprint LENGTH. LANDED in the
  r11 opening batch: dedup_simhash runs 120-bit fingerprints (two md5
  halves -> 30-bit bands, operators/simhash_wide.py), pushing
  band-collision linearity from the 60-bit layout's N ~ 10^5-10^6
  ceiling to N ~ 10^9-10^10; the 60-bit operator remains in
  operators/dedup.py as the unit-test small-scale config.
* IVF nprobe (q_cluster trained families): the r10 recall evals showed
  recall@3 collapsing with cell OCCUPANCY as coarse_k grows (finding 5:
  0.30/0.40 -> 0.15/0.18 at sf0.1) — growing k keeps probe COST linear
  but shrinks each cell's share of true neighbors. The third application
  of this recipe grows the probe count alongside: ``ivf_nprobe(k) =
  max(MIN_NPROBE, isqrt(k))`` (the FAISS rule of thumb nprobe ~
  sqrt(nlist)), so probed vectors per query ~ nprobe * N/k = N/sqrt(k)
  stay sublinear while boundary losses are bought back. At every
  verification scale coarse_k = 8 -> nprobe = 2, the constant the static
  unrolled-Lloyd oracles bake.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from purldb_spark.catalog.tables import load

# minimum planes per band: the width every oracle-bearing scale uses (the
# verification corpora hold <= 4095 vectors, where the formula floors out)
MIN_PLANES = 8
# slack c in max(MIN, floor(log2 N) - c): c = 4 keeps ~2^4 = 16 expected
# vectors per bucket per band
PLANES_SLACK = 4

_N_BY_CORPUS: dict[tuple[str, str, str], int] = {}


def corpus_count(spark: SparkSession, sf_dir: str, table: str = "embeddings") -> int:
    """Memoized row count per (session, corpus, table) — one count() job
    sizes every corpus-scaled parameter for the whole session."""
    key = (spark.sparkContext.applicationId, sf_dir, table)
    n = _N_BY_CORPUS.get(key)
    if n is None:
        n = int(load(spark, sf_dir, table).count())
        _N_BY_CORPUS[key] = n
    return n


def lsh_n_planes(n: int) -> int:
    """Planes per LSH band for an n-vector corpus:
    max(MIN_PLANES, floor(log2 n) - PLANES_SLACK).

    floor(log2 n) == n.bit_length() - 1 for n >= 1; per-band bucket
    occupancy stays ~2^PLANES_SLACK as n grows, so candidate volume —
    N^2 * bands / 2^planes — stays linear in N."""
    if n <= 1:
        return MIN_PLANES
    return max(MIN_PLANES, (n.bit_length() - 1) - PLANES_SLACK)


# minimum probed coarse cells: what ivf_nprobe yields at the oracle-baked
# k = 8 of every verification corpus (isqrt(8) = 2)
MIN_NPROBE = 2


def ivf_nprobe(k: int) -> int:
    """Probed coarse cells for a k-cell IVF index:
    max(MIN_NPROBE, isqrt(k)) — nprobe ~ sqrt(nlist).

    With the coarse_k law k ~ N/250, probed vectors per query are
    nprobe * N/k ~ sqrt(250 * N): sublinear in N, while the probed
    FRACTION sqrt(k)/k shrinks, so total probe work across a fixed
    anchor set stays bounded and the occupancy-driven recall knee
    (BENCH_scale finding 5) is pushed out by the extra cells. Same
    oracle contract as coarse_k: every verification corpus trains
    k = 8 cells, where this floors at MIN_NPROBE = 2 — the constant
    the static unrolled-Lloyd oracle SQL bakes."""
    import math

    return max(MIN_NPROBE, math.isqrt(k))


def lsh_planes_for(
    spark: SparkSession, sf_dir: str, table: str = "embeddings"
) -> int:
    """Corpus-scaled LSH band width for a table, with the same
    oracle-validity contract as q_cluster.coarse_k: static oracle SQL in
    the calling module bakes MIN_PLANES-wide bands, valid while this
    returns MIN_PLANES (true at every driver verification scale); wider
    layouts engage only at probe/production scales, where the warning
    below is the printed cause should an oracle comparison ever be
    attempted anyway."""
    w = lsh_n_planes(corpus_count(spark, sf_dir, table))
    if w != MIN_PLANES:
        import warnings

        warnings.warn(
            f"lsh_planes_for({table}@{sf_dir}) = {w} != MIN_PLANES="
            f"{MIN_PLANES}: static LSH oracle SQL bakes the"
            f" {MIN_PLANES}-plane layout and is NOT valid at this corpus"
            " size (scale probes/production never compare oracles; this"
            " is only a problem if a new verification scale exceeded"
            f" 2^{MIN_PLANES + PLANES_SLACK + 1} - 1 rows).",
            stacklevel=2,
        )
    return w


# ---------------------------------------------------------------------------
# Blocked pair-space decomposition for the exact all-pairs baselines (r16)
# ---------------------------------------------------------------------------

# One block of an all-pairs decomposition must fit a task's build/broadcast
# budget (guide §3.1: a few hundred MB of hash relation is fine, GBs are
# not).  64 MB keeps a cell's build side comfortably inside a task even at
# 1 GB-heap executors; env-overridable for clusters with bigger tasks.
PAIR_BLOCK_BYTES = int(
    os.environ.get("SPARK_GRAFT_PAIR_BLOCK_BYTES", str(64 << 20))
)

# vec_id (8) + 64-dim double vector (512) + array/offset overhead
EMBEDDING_ROW_BYTES = 536


def side_blocks(n_rows: int, row_bytes: int = EMBEDDING_ROW_BYTES) -> int:
    """Blocks for ONE side of a blocked all-pairs grid join, sized so each
    block's rows fit PAIR_BLOCK_BYTES (the per-cell build side a task holds
    in memory).  Floors at 2 so the blocked plan shape — equi-join on the
    cell key, never a full-corpus nested loop — is exercised at every
    verification scale."""
    if n_rows <= 0:
        return 2
    return max(2, -(-(n_rows * row_bytes) // PAIR_BLOCK_BYTES))


def pair_blocks(
    spark: SparkSession, sf_dir: str, table: str = "embeddings"
) -> int:
    """Block count B for a B x B SELF-pair decomposition (the i < j
    triangle of table x table).  Two lower bounds:

    * memory: each block (one cell's buffered side) fits PAIR_BLOCK_BYTES
      — the side_blocks law, dominant at production scale;
    * parallelism: B(B+1)/2 cells >= 2 x shuffle partitions, so when the
      planner runs the cell join as a shuffled join the cell key has
      enough distinct values to spread over the cluster (guide §2.5's
      too-few-synthetic-keys trap), dominant at verification scale.

    Each row is replicated to ~B+1 cells, so shuffle volume is O(N x B)
    vector rows while compute stays the inherent O(N^2/2) dots — the
    guide-§8 proxy rule does not apply (every pair needs both payloads),
    but no single task ever holds more than one block per side."""
    import math

    n = corpus_count(spark, sf_dir, table)
    from purldb_spark.conf import shuffle_partitions

    n_part = shuffle_partitions(spark)
    b_par = math.isqrt(max(2 * n_part - 1, 1)) + 1
    return max(side_blocks(n), b_par)
