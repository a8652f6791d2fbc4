"""simhash_width_plan — the SimHash fingerprint-WIDTH decision as data.

Third sibling of lsh_band_plan (embeddings) and minhash_band_plan
(MinHash): the one banding parameter those dashboards do not cover is
SimHash's fingerprint width. The pigeonhole guarantee (hamming <= 3 needs
>= 1 of exactly 4 identical bands) PINS the band count, so width is the
only scale knob (operators/simhash_wide.py, round-10 audit) — and the
repo's own width history is the evidence: 32-bit (8-bit bands) measured
9.5x at 10x corpus growth, 60-bit (15-bit bands) saturates at N ~
10^5-10^6 docs, 120-bit (30-bit bands, shipped since r11) is linear to
N ~ 10^9-10^10 (BENCH_scale.md dedup_simhash row + finding 3). This
dashboard publishes that decision for the corpus AT HAND, one row per
candidate width:

  * rand_pairs_per_band — E[random band collisions] = C(N,2) / 2^bits:
    the verify-stage fan-in a RANDOM (dissimilar) corpus would inject
    per band. This is the saturation diagnostic: when it approaches N,
    candidate generation has gone quadratic.
  * saturation_docs — the N* where rand_pairs_per_band = N, i.e.
    N* = 2^(band_bits+1) + 1: the corpus size a width is good for.
  * headroom_e6 — floor(1e6 * N / N*): how much of a width's budget
    this corpus already spends (>= 1e6 means saturated).
  * fingerprint_bytes — N * 8 * ceil(width/60): the stored index bill
    under the actual layout (fingerprints are packed into 60-bit BIGINT
    columns — sim_lo/sim_hi for 120 — to stay in positive signed-64
    territory on both engines; operators/simhash_wide.py).

All integer/IEEE-exact arithmetic (powers of two and C(N,2) stay below
2^53, so double floor-division is exact on both engines); the column
expression STRINGS are shared verbatim between the Spark selectExpr and
the DuckDB oracle, the minhash_band_plan cross-engine recipe.

Scale shape: one count(*) over documents + a constant literal frame —
zero shuffles of corpus data, same cost at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query

# candidate widths: (label, total bits); bands are always 4 (pigeonhole
# for hamming <= 3), so band_bits = width // 4. 120 is shipped
# (operators/simhash_wide); 32 and 60 are the measured history; 240 is
# the next doubling (two more md5 slices) should 10^10 docs arrive.
_WIDTHS = [
    ("32bit_legacy", 32),
    ("60bit_unit", 60),
    ("120bit_shipped", 120),
    ("240bit_next", 240),
]
_N_BANDS = 4


def _width_cols(name: str, bits: int, n_docs_sql: str) -> list[str]:
    """One width's column expressions — identical strings for both
    engines; ``n_docs_sql`` yields the corpus document count as BIGINT."""
    band_bits = bits // _N_BANDS
    buckets = 1 << band_bits  # 2^band_bits, exact python int literal
    saturation = 2 * buckets + 1  # N* where C(N,2)/buckets = N
    pairs = f"(({n_docs_sql}) * (({n_docs_sql}) - 1) / 2.0)"
    return [
        f"'{name}' AS width",
        f"CAST({bits} AS BIGINT) AS width_bits",
        f"CAST({_N_BANDS} AS BIGINT) AS n_bands",
        f"CAST({band_bits} AS BIGINT) AS band_bits",
        f"CAST({_N_BANDS - 1} AS BIGINT) AS hamming_radius",
        f"{'TRUE' if name.endswith('_shipped') else 'FALSE'} AS is_shipped",
        f"CAST({n_docs_sql} AS BIGINT) AS n_docs",
        f"CAST(floor({pairs} / {buckets}.0) AS BIGINT)"
        " AS rand_pairs_per_band",
        f"CAST({saturation} AS BIGINT) AS saturation_docs",
        f"CAST(floor(CAST({n_docs_sql} AS DOUBLE) * 1000000.0"
        f" / {saturation}.0) AS BIGINT) AS headroom_e6",
        f"CAST(({n_docs_sql}) * {8 * -(-bits // 60)} AS BIGINT)"
        " AS fingerprint_bytes",
    ]


@query(
    "simhash_width_plan",
    oracle=" UNION ALL ".join(
        "SELECT "
        + ", ".join(
            _width_cols(name, bits, "(SELECT count(*) FROM documents)")
        )
        for name, bits in _WIDTHS
    ),
)
def simhash_width_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The width dashboard (module docstring): the Spark side evaluates
    the SAME expression strings over one literal row per width, with
    n_docs as a driver scalar off one count (the memoized corpus_count
    pattern — documented BNLJ avoidance)."""
    n_docs = load(spark, sf_dir, "documents").count()
    frames = [
        spark.range(1).selectExpr(*_width_cols(name, bits, str(int(n_docs))))
        for name, bits in _WIDTHS
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
