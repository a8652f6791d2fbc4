"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line with per-query
seconds. Each query is forced with a count() action (no driver collect of
payload rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

from purldb_spark.plans.registry import QUERIES, load_inventory
from purldb_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("purldb_spark_bench")
    load_inventory()

    # warm the JVM + parquet footers once so timings measure query work
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # pragma: no cover
            timings[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
