"""Seeded randomized sweeps for the round-11 primitives: multiprobe cell
selection (probe_cells_expr) vs the assignment and a Python replay, and
the 120-bit pigeonhole's exactness (near pairs == brute-force hamming).

Spark-expression kernels are swept with ONE job over many seeded random
rows (hypothesis's per-example model would pay a Spark round-trip per
case); the random draws are fixed-seed so failures replay."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def test_probe_cells_expr_matches_assignment_and_python_replay(spark):
    """Slot 1 of probe_cells_expr == assign_expr for every row (nprobe=1
    IS the assignment), the full ranking equals a Python argsort replay
    of the same (distance, cell) order, and probed cells are distinct."""
    from purldb_spark.operators.kmeans import assign_expr, probe_cells_expr

    rng = random.Random(411)
    dim, k, n, nprobe = 8, 6, 300, 3
    cents = [[rng.uniform(-2, 2) for _ in range(dim)] for _ in range(k)]
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(dim)]) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, v array<float>")
    got = {
        r["id"]: (r["assigned"], r["probes"])
        for r in df.select(
            "id",
            assign_expr("v", cents).alias("assigned"),
            probe_cells_expr("v", cents, nprobe).alias("probes"),
            "v",
        ).collect()
    }
    for i, vec in rows:
        # replay with float32 semantics: the column is array<float>, so
        # the engine folds over the float-rounded components
        import struct

        v32 = [struct.unpack("f", struct.pack("f", x))[0] for x in vec]
        dists = [
            (sum((a - b) ** 2 for a, b in zip(v32, c)), ci + 1)
            for ci, c in enumerate(cents)
        ]
        order = [cell for _, cell in sorted(dists)]
        assigned, probes = got[i]
        assert probes == order[:nprobe], i
        assert assigned == probes[0] == order[0], i
        assert len(set(probes)) == nprobe


def test_wide_near_pairs_equals_bruteforce_hamming(spark):
    """wide_near_pairs over synthetic 120-bit fingerprints returns EXACTLY
    the brute-force hamming <= 3 pairs — the pigeonhole candidate join
    loses nothing (completeness) and the bit_count verify admits nothing
    (soundness). Fingerprints are seeded clusters around a few anchors
    (flip 0-6 random bits) so both near and far pairs are dense."""
    from purldb_spark.operators.simhash_wide import wide_near_pairs

    rng = random.Random(1211)
    anchors = [(rng.getrandbits(60), rng.getrandbits(60)) for _ in range(6)]
    rows = []
    for i in range(120):
        lo, hi = anchors[i % len(anchors)]
        for _ in range(rng.randrange(0, 7)):  # hamming 0-6 from the anchor
            bit = rng.randrange(120)
            if bit < 60:
                lo ^= 1 << bit
            else:
                hi ^= 1 << (bit - 60)
        rows.append((i, lo, hi))
    df = spark.createDataFrame(rows, "doc_id long, sim_lo long, sim_hi long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in wide_near_pairs(df, "doc_id", max_hamming=3).collect()
    }
    want = set()
    for i, (ia, la, ha) in enumerate(rows):
        for ib, lb, hb in rows[i + 1 :]:
            d = bin(la ^ lb).count("1") + bin(ha ^ hb).count("1")
            if d <= 3:
                want.add((ia, ib, d))
    assert got == want
    assert want  # the generator must actually produce near pairs
