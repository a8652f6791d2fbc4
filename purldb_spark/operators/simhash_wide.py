"""120-bit SimHash — the corpus-scaled fingerprint WIDTH upgrade.

Why this exists (round-10 audit, scale_params.py): SimHash's band width
cannot be corpus-scaled by re-splitting — the pigeonhole guarantee
(hamming <= 3 needs >= 1 of exactly 4 identical bands) pins the split, so
the only scale knob is fingerprint LENGTH. The shipped 60-bit fingerprint
(operators/dedup.py::simhash, 15-bit bands = 32768 buckets) saturates
around N ~ 10^5-10^6 documents; this module doubles it to 120 bits
(two 60-bit halves = two md5 slices, 30-bit bands = ~10^9 buckets),
pushing band-collision linearity to N ~ 10^9-10^10 — the 100 TB regime.

Wired into the registry since the round-11 opening batch: dedup_simhash
runs this fingerprint (fixture_cache.simhash_fingerprints stores it), and
BENCH_scale's dedup_simhash row measures this code path at 1.0x @10x; the
60-bit operator stays in operators/dedup.py as the unit-test small-scale
config.

Layout: every value stays inside positive signed-64 territory on BOTH
engines (the 60-bit convention — no arithmetic-vs-logical shift or
two's-complement edge): token hash halves are md5 hex chars 1-15 and
16-30 as BIGINTs, the fingerprint is a PAIR (sim_lo, sim_hi) of 60-bit
votes-signs, bands are 4 x 30-bit slices (two per half), and hamming is
the sum of two bit_count(xor(...)) terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HALF_BITS = 60
WIDE_BITS = 120
N_BANDS = 4
BAND_BITS = WIDE_BITS // N_BANDS  # 30
_BAND_MASK = (1 << BAND_BITS) - 1


def simhash_wide(df_tokens: DataFrame, id_col: str) -> DataFrame:
    """(id, sim_lo, sim_hi) 120-bit SimHash from distinct tokens
    (id, tok): one groupBy pass of 120 conditional sums (map-side
    combined), signs packed into two 60-bit BIGINTs."""
    h_lo = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    h_hi = F.conv(F.substring(F.md5("tok"), 16, 15), 16, 10).cast("long")
    toks = df_tokens.withColumn("h_lo", h_lo).withColumn("h_hi", h_hi)
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col(col), b).bitwiseAND(1) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{half}_{b}")
        for half, col in (("lo", "h_lo"), ("hi", "h_hi"))
        for b in range(HALF_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*votes)

    def pack(half: str):
        fp = None
        for b in range(HALF_BITS):
            term = F.when(F.col(f"v{half}_{b}") > 0, 1 << b).otherwise(0)
            fp = term if fp is None else fp + term
        return fp.cast("long")

    return agg.select(
        id_col, pack("lo").alias("sim_lo"), pack("hi").alias("sim_hi")
    )


def simhash_wide_sql(id_col: str, tokens_sql: str) -> str:
    """DuckDB rendering of the identical 120-bit SimHash (oracle side)."""
    votes = ", ".join(
        f"SUM(CASE WHEN (h_{half} >> {b}) & 1 = 1 THEN 1 ELSE -1 END)"
        f" AS v{half}_{b}"
        for half in ("lo", "hi")
        for b in range(HALF_BITS)
    )
    packs = {
        half: " + ".join(
            f"(CASE WHEN v{half}_{b} > 0 THEN {1 << b} ELSE 0 END)"
            for b in range(HALF_BITS)
        )
        for half in ("lo", "hi")
    }
    return f"""
      SELECT {id_col}, CAST({packs["lo"]} AS BIGINT) AS sim_lo,
             CAST({packs["hi"]} AS BIGINT) AS sim_hi FROM (
        SELECT {id_col}, {votes}
        FROM (SELECT {id_col},
                     CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h_lo,
                     CAST('0x' || substr(md5(tok), 16, 15) AS BIGINT) AS h_hi
              FROM ({tokens_sql}))
        GROUP BY {id_col}
      )
    """


def band_exprs() -> list:
    """The 4 x 30-bit band slices of a (sim_lo, sim_hi) fingerprint:
    bands 0-1 from the low half, 2-3 from the high half."""
    out = []
    for b in range(N_BANDS):
        src = F.col("sim_lo") if b < 2 else F.col("sim_hi")
        out.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(src, (b % 2) * BAND_BITS)
                .bitwiseAND(_BAND_MASK)
                .alias("band_key"),
            )
        )
    return out


def wide_near_pairs(
    sim: DataFrame, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs at hamming <= max_hamming over the 120-bit
    fingerprint: pigeonhole over the 4 x 30-bit bands (hamming <= 3
    forces >= 1 identical band), candidates from ONE equi-join, exact
    two-term bit_count verify."""
    assert max_hamming < N_BANDS, "pigeonhole needs bands > max_hamming"
    banded = sim.select(
        id_col,
        "sim_lo",
        "sim_hi",
        F.explode(F.array(*band_exprs())).alias("band"),
    ).select(id_col, "sim_lo", "sim_hi", "band.band_idx", "band.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            "inner",
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sim_lo").alias("lo_a"),
            F.col("a.sim_hi").alias("hi_a"),
            F.col("b.sim_lo").alias("lo_b"),
            F.col("b.sim_hi").alias("hi_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.expr(
        "bit_count(cast(lo_a as long) ^ cast(lo_b as long))"
        " + bit_count(cast(hi_a as long) ^ cast(hi_b as long))"
    ).cast("long")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
