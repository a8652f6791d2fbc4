"""Round-15 optimization measurement harness (guide §1: measure first).

For each target query, after bench.py's exact warmup + fixture-prebuild
convention, measure separately:

- build_s:  wall seconds for QUERIES[name](spark, sf_dir) to RETURN —
  driver-side plan construction plus any eager actions the builder runs
  (first()/count()/localCheckpoint(eager=True)).
- action_s: wall seconds for the final .count() action.
- jobs/stages/tasks: delta of the status-tracker counters across the whole
  query, so per-query scheduling overhead is visible (each job ~ an eager
  action or AQE materialization; each stage ~ a shuffle boundary).

Usage:
  python tools/opt_measure.py [query ...]        # default: top cost set
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/opt_measure.py all
Writes JSON lines to stdout and a summary table to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

DEFAULT = [
    "layout_zorder_skipping",
    "knn_recall_eval",
    "shot_incremental_fold",
    "match_cascade_full",
    "x_vcs_tags_collect",
    "dedup_dispatch_run",
    "x_cargo_gem_collect",
    "mm_pair_alignment_qa",
    "pq_train",
    "knn_residual_ivfpq",
    "knn_recall_residual",
    "sketch_kmv_intersect",
    "embed_recall_blocked",
    "knn_recall_fully_trained",
    "x_collect_flow",
    "corpus_curate_pipeline",
    "classifier_train",
    "dedup_ngram_prefix",
    "dedup_ngram_jaccard_capped",
    "text_tfidf_neighbors",
    "select_perplexity_buckets",
    "snippet_match_pipeline",
    "dedup_embedding_cosine",
    "f5_rank_tiebreak",
    "mm_embed_ann_search",
]


def main() -> None:
    from purldb_spark.plans.registry import QUERIES, load_inventory
    from purldb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("OPT_MEASURE_REPS", "1"))
    spark = get_spark("opt_measure_r15")
    load_inventory()

    args = sys.argv[1:]
    if args == ["all"]:
        targets = sorted(QUERIES)
    elif args:
        targets = args
    else:
        targets = DEFAULT

    # bench.py's warmup convention
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()

    def _warm_py(batches):
        yield from batches

    spark.range(0, 32, 1, 32).mapInPandas(_warm_py, "id long").count()
    for _w in ("x_pypi_collect", "x_collect_flow", "f5_seqmatch_rank"):
        QUERIES[_w](spark, "/root/testdata/sf0.001").count()

    from purldb_spark.plans.fixture_warmup import prebuild_fixtures

    prebuild_fixtures(spark, sf_dir)

    tracker = spark.sparkContext.statusTracker()
    rows = []
    for name in targets:
        if name not in QUERIES:
            print(f"skip unknown {name}", file=sys.stderr)
            continue
        best = None
        for _ in range(reps):
            n_jobs0 = len(tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            n_jobs1 = len(tracker.getJobIdsForGroup(None))
            rec = {
                "query": name,
                "build_s": round(t1 - t0, 3),
                "action_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "jobs": n_jobs1 - n_jobs0,
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        rows.append(best)
        print(json.dumps(best))
        sys.stdout.flush()

    rows.sort(key=lambda r: -r["total_s"])
    print(
        f"{'query':38s} {'total':>7s} {'build':>7s} {'action':>7s} {'jobs':>5s}",
        file=sys.stderr,
    )
    for r in rows:
        print(
            f"{r['query']:38s} {r['total_s']:7.2f} {r['build_s']:7.2f} "
            f"{r['action_s']:7.2f} {r['jobs']:5d}",
            file=sys.stderr,
        )
    print(
        f"TOTAL {sum(r['total_s'] for r in rows):.2f}s over {len(rows)} queries",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
