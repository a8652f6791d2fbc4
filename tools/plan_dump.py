"""Dump .explain("formatted") for named queries to plans/<round>/<q>_<tag>.txt.

Usage: python tools/plan_dump.py before q1 q2 ...   (tag = before|after)
SPARK_GRAFT_SF_DIR selects the data dir (default sf0.1).
PLAN_DUMP_ROUND selects the output subdir (default r16).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    from purldb_spark.plans.registry import QUERIES, load_inventory
    from purldb_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        HERE, "plans", os.environ.get("PLAN_DUMP_ROUND", "r16")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_dump_r16")
    load_inventory()
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
