"""Verification-window budget report — the round-planning instrument.

The driver re-verifies only the FIRST ~50 entries of the rotation
(__spark_entry__._rotated_names: never-checked first, then stale
least-recently-green, then verified), and editing ANY purldb_spark module
re-stales every query whose transitive-import closure includes it. This
tool answers, BEFORE an edit, the two questions round 10 turned into a
protocol (PLANS.md round-10 ledger):

  python tools/claimants.py            # current claimants vs the window
  python tools/claimants.py MODULE...  # + what each module edit would
                                       #   newly re-stale (e.g.
                                       #   purldb_spark/plans/fixture_cache.py)

Run `python tools/query_hashes.py update` at round start first, or the
stale set reflects the previous round's recorded hashes.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

WINDOW = 50  # observed driver check-window size (CORRECTNESS_r09: 50 rows)


def main() -> None:
    import tools.query_hashes as qh
    from purldb_spark.plans.registry import ORACLES, QUERIES, load_inventory

    load_inventory()
    rec = json.load(open(os.path.join(HERE, "QUERY_HASHES.json")))
    cur = qh.compute_hashes(HERE)
    stale = sorted(n for n in cur if n in rec and rec[n] != cur[n])
    never = sorted(n for n in cur if n not in rec)
    claimants = [n for n in stale + never if n in ORACLES]

    import __spark_entry__ as entry

    window = entry._rotated_names()[:WINDOW]
    spill = [n for n in claimants if n not in window]
    print(f"queries: {len(cur)} | stale: {len(stale)} | never: {len(never)}")
    print(
        f"oracle-bearing claimants: {len(claimants)} / window {WINDOW}"
        f" | spare: {WINDOW - len(claimants)}"
    )
    if spill:
        print(f"SPILLING ({len(spill)}): {spill}")

    if len(sys.argv) > 1:
        q2files: dict[str, set[str]] = {}
        for name, fn in QUERIES.items():
            mod = getattr(fn, "__module__", "") or ""
            if not mod.startswith("purldb_spark"):
                mod = "purldb_spark.plans.registry"
            q2files[name] = {
                os.path.relpath(p, HERE)
                for p in qh._closure_files(HERE, mod)
            }
        stale_set = set(stale) | set(never)
        for target in sys.argv[1:]:
            affected = sorted(
                n for n, fs in q2files.items() if target in fs
            )
            newly = [n for n in affected if n not in stale_set]
            print(
                f"\nedit {target}: closure={len(affected)}"
                f" newly_restaled={len(newly)}"
                f" -> claimants would become"
                f" {len(claimants) + len([n for n in newly if n in ORACLES])}"
            )
            if newly:
                print(f"  newly: {newly}")


if __name__ == "__main__":
    main()
