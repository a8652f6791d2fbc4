"""Compaction + retention face of the persistent MinHash band index.

dedup_stream appends every micro-batch's band keys and shingle postings to
the index, so the index accumulates one small parquet file set per epoch
and grows monotonically with every document ever ingested — fine for the
pair MATH (appends are anti-joined, keys are deterministic), wrong for a
100 TB deployment where the index must stay O(retention window), not
O(history). This module is the maintenance job that fixes both:

* **Compaction**: rewrite the current index as ONE deduplicated,
  band-key-clustered generation (`repartition(hash(band_key))` — the
  layout the per-batch equi-join probes), collapsing the per-epoch file
  litter. Pure no-op on semantics: the row SET is unchanged.
* **Retention (TTL)**: optionally keep only a caller-supplied set of
  doc_ids. The policy lives with the document LEDGER (which knows ingest
  times); the index stores no timestamp column — compaction applies the
  policy by one semi-join. After retention, new batches dedup only
  against the retained window, and the index holds exactly the retained
  docs' rows: the size bound is the window, not history.

Crash-safety is the generation-pointer recipe (the directory-level twin of
hist_stream's epoch-partial overwrite): a compaction writes the full new
index under a fresh ``gen=<g>`` directory (mode=overwrite — a replayed
compaction rewrites the same deterministic row set), then atomically swaps
the ``CURRENT`` pointer file via ``os.replace``. A crash at ANY point
before the swap leaves the old generation live and complete; after the
swap, readers resolve the new one. Superseded generations are pruned by an
explicit call, never implicitly, so a reader that resolved its paths
pre-swap keeps its files.

Streamed == batch invariant (tests/test_compact_stream.py, the twelfth
pytest-pinned streaming face): pairs detected across batches with a
compaction in the middle == pairs from the same batches without it ==
the batch dedup math.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CURRENT = "CURRENT"


def current_generation(index_dir: str) -> int | None:
    """The generation the ``CURRENT`` pointer names, or None for the
    legacy flat layout (index_dir/bands written before any compaction)."""
    try:
        with open(os.path.join(index_dir, _CURRENT)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def index_paths(index_dir: str) -> tuple[str, str]:
    """(bands_path, shingles_path) of the live index generation — the one
    resolution point dedup_stream's reads AND appends go through, so a
    post-compaction batch lands its keys in the compacted generation."""
    gen = current_generation(index_dir)
    root = index_dir if gen is None else os.path.join(index_dir, f"gen={gen}")
    return os.path.join(root, "bands"), os.path.join(root, "shingles")


def compact_band_index(
    spark: SparkSession,
    index_dir: str,
    retained_docs: DataFrame | None = None,
    n_partitions: int | None = None,
) -> int | None:
    """Compact (and optionally retain) the band index into a fresh
    generation, then atomically swap the CURRENT pointer to it.

    ``retained_docs`` — a (doc_id) frame of documents to KEEP (the TTL
    window, derived by the caller from its document ledger); None keeps
    everything (pure compaction). Returns the new generation id, or None
    when there is no index yet."""
    bands_path, sh_path = index_paths(index_dir)
    if not os.path.isdir(bands_path):
        return None
    bands = spark.read.parquet(bands_path).dropDuplicates()
    shingles = spark.read.parquet(sh_path).dropDuplicates()
    if retained_docs is not None:
        keep = F.broadcast(retained_docs.select("doc_id").dropDuplicates())
        bands = bands.join(keep, "doc_id", "left_semi")
        shingles = shingles.join(keep, "doc_id", "left_semi")
    if n_partitions is None:
        from purldb_spark.conf import shuffle_partitions

        n_partitions = shuffle_partitions(spark)
    gen = (current_generation(index_dir) or 0) + 1
    gen_root = os.path.join(index_dir, f"gen={gen}")
    # cluster each table by its probe key: the per-batch candidate join
    # probes bands on (band_idx, band_key), the verify join probes
    # postings on sh — at 100 TB these ARE the table layouts
    bands.repartition(n_partitions, "band_idx", "band_key").write.mode(
        "overwrite"
    ).parquet(os.path.join(gen_root, "bands"))
    shingles.repartition(n_partitions, "sh").write.mode("overwrite").parquet(
        os.path.join(gen_root, "shingles")
    )
    # atomic pointer swap: tmp write + os.replace — a crash anywhere above
    # leaves CURRENT naming the old, complete generation
    tmp = os.path.join(index_dir, _CURRENT + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(str(gen))
    os.replace(tmp, os.path.join(index_dir, _CURRENT))
    return gen


def prune_generations(index_dir: str) -> list[str]:
    """Best-effort removal of superseded ``gen=<g>`` directories (and the
    legacy flat layout) — called explicitly AFTER a swap is known safe,
    never from inside compaction, so in-flight readers keep their files."""
    cur = current_generation(index_dir)
    removed: list[str] = []
    if cur is None or not os.path.isdir(index_dir):
        return removed
    for d in os.listdir(index_dir):
        path = os.path.join(index_dir, d)
        stale_gen = (
            d.startswith("gen=")
            and d[4:].isdigit()
            and int(d[4:]) < cur
        )
        legacy = d in ("bands", "shingles")
        if (stale_gen or legacy) and os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
            removed.append(path)
    return removed
