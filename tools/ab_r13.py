"""Round-13 A/B for the two r12 driver-bench upticks (VERDICT item 3):
`dedup_embedding_blocked` 0.94 -> 1.43 s and `decontam_ngram_overlap`
0.66 -> 0.92 s (r11 -> r12 driver, the only >1.3x moves; neither file
changed in r12). Re-measure with the ledger protocol: otherwise-idle
local[32], bench.py's exact warmup + fixture sequence, min-of-3 per
query at sf0.1."""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

TARGETS = [
    "dedup_embedding_blocked",
    "decontam_ngram_overlap",
]


def main() -> None:
    from purldb_spark.plans.registry import QUERIES, load_inventory
    from purldb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_r13")
    load_inventory()
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    from purldb_spark.plans.fixture_warmup import prebuild_fixtures

    prebuild_fixtures(spark, sf_dir)

    out: dict[str, list[float]] = {}
    for rep in range(3):
        for name in TARGETS:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            out.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
    print(
        json.dumps(
            {
                name: {"runs": runs, "min": min(runs)}
                for name, runs in out.items()
            }
        )
    )


if __name__ == "__main__":
    main()
