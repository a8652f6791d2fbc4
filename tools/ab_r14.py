"""Round-14 A/B for the four r13 driver-bench dedup-family movers
(VERDICT r13 item 1): `dedup_minhash_lsh` 0.66 -> 1.72 s (2.6x),
`dedup_ngram_jaccard` 1.36 -> 2.05, `dedup_ngram_jaccard_capped`
2.61 -> 3.57, `dedup_simhash` 0.30 -> 0.43 (r12 -> r13 driver; none of
their plan files changed in r13).

Two passes, per the r13 verdict's explicit ask:

  WARM (default)    — the ledger protocol: otherwise-idle local[32],
                      bench.py's exact warmup + prebuild_fixtures
                      sequence, min-of-3 per query at sf0.1. Verdict
                      vs the r12 driver numbers.
  COLD (AB_COLD=1)  — same warmup but NO prebuild, one pass over the
                      targets in bench.py's sorted order. Measures how
                      much lazily-built fixture cost lands on the FIRST
                      query to touch each fixture — the attribution
                      hypothesis the r13 prebuild restructure raised.
                      (Audit result: every fixture the dedup family
                      touches IS in the prebuild list with identical
                      cache keys — doc_shingles, minhash_band_index,
                      simhash_fingerprints, capped_posting(16) — so in
                      the driver's bench run, which calls
                      prebuild_fixtures, no lazy build can be charged
                      to these queries. The cold pass quantifies the
                      counterfactual.)
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

TARGETS = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_simhash",
]

R12_DRIVER = {
    "dedup_minhash_lsh": 0.66,
    "dedup_ngram_jaccard": 1.36,
    "dedup_ngram_jaccard_capped": 2.61,
    "dedup_simhash": 0.30,
}


def main() -> None:
    from purldb_spark.plans.registry import QUERIES, load_inventory
    from purldb_spark.session import get_spark

    cold = os.environ.get("AB_COLD") == "1"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_r14")
    load_inventory()
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    def _warm_py(batches):
        yield from batches

    spark.range(0, 32, 1, 32).mapInPandas(_warm_py, "id long").count()

    if not cold:
        from purldb_spark.plans.fixture_warmup import prebuild_fixtures

        prebuild_fixtures(spark, sf_dir)

    out: dict[str, list[float]] = {}
    reps = 1 if cold else 3
    for _rep in range(reps):
        for name in sorted(TARGETS):  # bench.py's sorted-order convention
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            out.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
    print(
        json.dumps(
            {
                "mode": "cold" if cold else "warm",
                "results": {
                    name: {
                        "runs": runs,
                        "min": min(runs),
                        "r12_driver": R12_DRIVER[name],
                        "ratio_vs_r12": round(
                            min(runs) / R12_DRIVER[name], 2
                        ),
                    }
                    for name, runs in out.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
