"""Round-15 A/B for the miners_collectors family drift flagged in the
r14 verdict (item 3 / next-round item 7): the family's driver-bench
total moved 43.63 -> 49.89 s (r13 -> r14, 1.14x) with NO code change in
the family that round; the r14 close cross-check attributed it to
measured external load 2-5 with scatter both ways. This run pins it:
otherwise-idle host, bench.py's warmup + prebuild convention, min-of-3
per query over EVERY x_* family query at sf0.1, family total compared
against both driver rounds.

Verdict rule (round protocol item 3): solo family total at or under the
r13 driver number -> "host load", retired; materially above -> REAL,
bisect the top movers.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

R13_DRIVER_FAMILY = 43.63
R14_DRIVER_FAMILY = 49.89


def main() -> None:
    from purldb_spark.plans.registry import QUERIES, load_inventory
    from purldb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_r15")
    load_inventory()
    targets = sorted(n for n in QUERIES if n.startswith("x_"))
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    def _warm_py(batches):
        yield from batches

    spark.range(0, 32, 1, 32).mapInPandas(_warm_py, "id long").count()
    from purldb_spark.plans.fixture_warmup import prebuild_fixtures

    prebuild_fixtures(spark, sf_dir)

    out: dict[str, list[float]] = {}
    for _rep in range(3):
        for name in targets:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            out.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
    mins = {n: min(r) for n, r in out.items()}
    total = round(sum(mins.values()), 2)
    print(
        json.dumps(
            {
                "n_queries": len(targets),
                "family_total_min3": total,
                "r13_driver_family": R13_DRIVER_FAMILY,
                "r14_driver_family": R14_DRIVER_FAMILY,
                "ratio_vs_r13": round(total / R13_DRIVER_FAMILY, 2),
                "top": dict(
                    sorted(mins.items(), key=lambda x: -x[1])[:8]
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
