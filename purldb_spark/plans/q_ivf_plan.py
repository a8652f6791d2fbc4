"""ivf_probe_plan — the IVF nprobe decision as data.

Fourth sibling of lsh_band_plan / minhash_band_plan / simhash_width_plan:
the r11 round corpus-scaled the probe count (`operators/scale_params.
ivf_nprobe(k) = max(2, isqrt(k))`, the FAISS nprobe ~ sqrt(nlist) rule,
attacking BENCH_scale finding 5's occupancy-driven recall collapse), and
this dashboard publishes what each candidate probe policy COSTS on the
corpus at hand, one row per policy:

  * nlist — the corpus-scaled coarse cell count (the q_cluster.coarse_k
    law, k = max(8, N // 250): ~250 vectors per cell);
  * nprobe — the policy's probed cells (clamped to nlist);
  * probed_vecs_per_query — N * nprobe // nlist under the balanced-cell
    model: the ADC scan volume per query. For the shipped sqrt policy
    this is ~sqrt(250 * N) — sublinear, the property the law buys;
  * probed_frac_e6 — nprobe / nlist on the e6 grid: the shrinking
    FRACTION that keeps total probe work bounded as k grows;
  * reorder_depth — the exact-rerank candidate budget that rides the
    probe count (10 per probed cell, the r11 law).

Policies: 1 probe (the pre-r11 fixed cost), the MIN_NPROBE floor (what
every verification corpus runs — k = 8 there, so the shipped law floors
to it), the shipped sqrt law, and its 2x headroom variant (what an
operator would try next if recall still lags).

Cross-engine exactness: pure integer arithmetic (`//` both engines'
semantics via Python ints on the Spark side and DuckDB integer division
in the oracle); the only double is floor(sqrt(k)) whose argument is far
below the first floor(sqrt) != isqrt boundary (~2^52). The corpus count
enters as a driver scalar (memoized corpus_count); the oracle derives
the same numbers relationally from count(*).

Scale shape: one memoized count(*) over embeddings + a 4-row literal
frame — zero corpus shuffles at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from purldb_spark.operators.scale_params import (
    MIN_NPROBE,
    corpus_count,
    ivf_nprobe,
)
from purldb_spark.plans.registry import query

_CELL_TARGET = 250  # the q_cluster.coarse_k law's vectors-per-cell target
_K_FLOOR = 8  # oracle-baked k at every verification scale
_REORDER_PER_PROBE = 10

_ORACLE = f"""
WITH params AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(greatest({_K_FLOOR}, count(*) // {_CELL_TARGET}) AS BIGINT)
           AS k
  FROM embeddings
),
laws AS (
  SELECT n, k,
         greatest({MIN_NPROBE},
                  CAST(floor(sqrt(CAST(k AS DOUBLE))) AS BIGINT)) AS isq
  FROM params
),
cand AS (
  SELECT * FROM (VALUES
    ('probe_1_fixed', 0), ('probe_floor_min', 1),
    ('probe_sqrt_shipped', 2), ('probe_2x_sqrt', 3)
  ) c(plan, idx)
)
SELECT c.plan,
       l.n AS n_vecs,
       l.k AS nlist,
       CAST(least(CASE c.idx WHEN 0 THEN 1
                             WHEN 1 THEN {MIN_NPROBE}
                             WHEN 2 THEN l.isq
                             ELSE 2 * l.isq END, l.k) AS BIGINT) AS nprobe,
       CAST((l.n * least(CASE c.idx WHEN 0 THEN 1
                                    WHEN 1 THEN {MIN_NPROBE}
                                    WHEN 2 THEN l.isq
                                    ELSE 2 * l.isq END, l.k)) // l.k
         AS BIGINT) AS probed_vecs_per_query,
       CAST((least(CASE c.idx WHEN 0 THEN 1
                              WHEN 1 THEN {MIN_NPROBE}
                              WHEN 2 THEN l.isq
                              ELSE 2 * l.isq END, l.k) * 1000000) // l.k
         AS BIGINT) AS probed_frac_e6,
       CAST({_REORDER_PER_PROBE} * least(CASE c.idx WHEN 0 THEN 1
                                                    WHEN 1 THEN {MIN_NPROBE}
                                                    WHEN 2 THEN l.isq
                                                    ELSE 2 * l.isq END, l.k)
         AS BIGINT) AS reorder_depth,
       (c.plan = 'probe_sqrt_shipped') AS is_shipped
FROM cand c, laws l
"""


@query("ivf_probe_plan", oracle=_ORACLE)
def ivf_probe_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe dashboard (module docstring): all numbers are exact
    Python-int arithmetic off the memoized corpus count, emitted as a
    4-row literal frame — the oracle re-derives them relationally."""
    n = corpus_count(spark, sf_dir, "embeddings")
    k = max(_K_FLOOR, n // _CELL_TARGET)
    isq = ivf_nprobe(k)  # max(MIN_NPROBE, isqrt(k)) — the shipped law
    policies = [
        ("probe_1_fixed", 1),
        ("probe_floor_min", MIN_NPROBE),
        ("probe_sqrt_shipped", isq),
        ("probe_2x_sqrt", 2 * isq),
    ]
    assert isq == max(MIN_NPROBE, math.isqrt(k))
    rows = [
        (
            plan,
            n,
            k,
            min(p, k),
            (n * min(p, k)) // k,
            (min(p, k) * 1_000_000) // k,
            _REORDER_PER_PROBE * min(p, k),
            plan == "probe_sqrt_shipped",
        )
        for plan, p in policies
    ]
    return spark.createDataFrame(
        rows,
        "plan string, n_vecs long, nlist long, nprobe long,"
        " probed_vecs_per_query long, probed_frac_e6 long,"
        " reorder_depth long, is_shipped boolean",
    )
