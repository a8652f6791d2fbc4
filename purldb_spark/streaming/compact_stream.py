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

Concurrent READERS are therefore always safe; concurrent WRITERS are not
left to luck: compaction reads the old generation at a point in time, so
a dedup_stream micro-batch appending to it after that snapshot (or
straddling the pointer swap) would be silently absent from the new
generation and deleted by pruning. Both writers — ``index_new_batch``'s
append phase and ``compact_band_index``'s whole read->write->swap — now
serialize on :func:`writer_lock`, a single-host lease file keyed by
(pid, /proc start-ticks) so a dead or pid-recycled holder is broken, a
live one is waited on. Micro-batch appends are short, so compaction's
hold time is the only pause a stream sees. At 100 TB both writers become
transactions on a table format (Delta/Iceberg optimistic commit +
RewriteFiles validation) and the lease disappears; the invariant it
enforces here — no append may land in a generation after compaction has
snapshotted it — is exactly what those formats' conflict detection
checks.

Streamed == batch invariant (tests/test_compact_stream.py, the twelfth
pytest-pinned streaming face): pairs detected across batches with a
compaction in the middle == pairs from the same batches without it ==
the batch dedup math.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CURRENT = "CURRENT"
# underscore prefix: Spark's parquet reader skips _-prefixed files, so the
# lock anchor can live in a directory that IS a parquet root (the legacy
# flat ANN layout reads index_dir itself — a bare 'WRITER.lock' there got
# scanned as a data file and failed the read)
_WRITER_LOCK = "_WRITER.lock"


def _proc_ident(pid: int) -> str | None:
    """``pid:starttime`` for a live process, None for a dead one — the
    start-ticks component (field 22 of /proc/pid/stat) defeats pid
    recycling: a recycled pid has a different start time, so its lease
    reads as stale rather than live."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as fh:
            data = fh.read()
        # fields after the last ')' survive spaces in the comm field;
        # starttime is overall field 22 -> index 19 post-comm
        fields = data[data.rindex(b")") + 2 :].split()
        return f"{pid}:{fields[19].decode()}"
    except (OSError, ValueError, IndexError):
        return None


def _remove_stale_legacy_lock(index_dir: str) -> None:
    """Remove a pre-r13 bare ``WRITER.lock`` only when its holder is
    provably dead. The old O_CREAT|O_EXCL protocol relies on the file's
    EXISTENCE for mutual exclusion, so unconditional removal during a
    rolling upgrade would actively admit a second old-protocol writer
    next to a LIVE holder (r14 advice) — strictly worse than the
    mixed-fleet non-interop the docstring already warns about. The old
    body recorded the holder's pid: if that pid is alive we leave the
    file alone (the stray-parquet-file nuisance is the lesser evil); a
    dead pid, or an unparseable body older than 10 minutes, is a crashed
    holder whose file no longer guards anything."""
    legacy = os.path.join(index_dir, "WRITER.lock")
    try:
        with open(legacy) as fh:
            body = fh.read(64).strip()
    except OSError:
        return  # no legacy file (the overwhelmingly common path)
    try:
        pid = int(body.split(":", 1)[0].split()[0])
    except (ValueError, IndexError):
        pid = None
    if pid is not None:
        if _proc_ident(pid) is not None:
            return  # live old-protocol holder — do not break its lock
    else:
        try:
            if time.time() - os.stat(legacy).st_mtime < 600.0:
                return  # unattributable and recent: assume live
        except OSError:
            return
    with contextlib.suppress(OSError):
        os.remove(legacy)


@contextlib.contextmanager
def writer_lock(index_dir: str, timeout: float = 60.0, poll: float = 0.05):
    """Single-writer lease over the band index (appenders + compaction).

    flock(LOCK_EX) on a PERSISTENT lock file is the lease: the kernel
    releases it automatically when the holder's fd closes — including
    crash and SIGKILL — so there is no stale-holder state to detect and
    no break path to race (the r12 create/remove protocol had a TOCTOU:
    two contenders could both read the same stale holder, the second's
    remove then deleting the first's freshly-acquired lock — two writers
    live, the exact silent-row-loss the lease exists to prevent). The
    file body records the holder's (pid, start-ticks) identity for
    DIAGNOSTICS only — it never participates in acquisition. Contenders
    poll LOCK_NB up to ``timeout`` then raise TimeoutError. Two fds in
    one process conflict too (flock is per open-file-description), so
    in-process append vs compaction serialize the same way. Single-host
    by construction — the 100 TB deployment replaces this with the table
    format's transactional commit (module docstring).

    Single-writer UPGRADE caveat: this flock lease does not interoperate
    with the pre-r13 O_CREAT|O_EXCL protocol on the bare 'WRITER.lock'
    name — a mixed-version fleet (one old writer, one new) would admit
    two writers; upgrade all writers of an index together. A leftover
    bare 'WRITER.lock' whose recorded holder is provably DEAD is removed
    on acquire (it no longer guards anything, and in legacy flat ANN
    roots it sits where spark.read.parquet(index_dir) scans it as a
    stray data file — r13 advice); one whose pid is still alive is left
    in place so a live old-protocol writer's exclusion survives a
    rolling upgrade (r14 advice: _remove_stale_legacy_lock)."""
    import fcntl

    os.makedirs(index_dir, exist_ok=True)
    path = os.path.join(index_dir, _WRITER_LOCK)
    _remove_stale_legacy_lock(index_dir)
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    deadline = time.monotonic() + timeout
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except (BlockingIOError, PermissionError):
                if time.monotonic() > deadline:
                    try:
                        with open(path) as fh:
                            holder = fh.read().strip()
                    except OSError:
                        holder = "?"
                    raise TimeoutError(
                        f"band-index writer lock held by pid {holder}: {path}"
                    )
                time.sleep(poll)
        # holder identity, for operators reading the file on a timeout
        me = _proc_ident(os.getpid()) or str(os.getpid())
        os.ftruncate(fd, 0)
        os.pwrite(fd, me.encode(), 0)
        yield
    finally:
        os.close(fd)  # closing the fd releases the flock


def current_generation(index_dir: str) -> int | None:
    """The generation the ``CURRENT`` pointer names, or None for the
    legacy flat layout (index_dir/bands written before any compaction)."""
    try:
        with open(os.path.join(index_dir, _CURRENT)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def table_path(index_dir: str, table: str) -> str:
    """Path of one index table in the live generation — the generation
    pointer machinery is table-agnostic, so every face's reads AND
    appends resolve through here (minhash bands/shingles/exact,
    simhash simbands)."""
    gen = current_generation(index_dir)
    root = index_dir if gen is None else os.path.join(index_dir, f"gen={gen}")
    return os.path.join(root, table)


def index_paths(index_dir: str) -> tuple[str, str]:
    """(bands_path, shingles_path) of the live index generation — the one
    resolution point dedup_stream's reads AND appends go through, so a
    post-compaction batch lands its keys in the compacted generation."""
    return table_path(index_dir, "bands"), table_path(index_dir, "shingles")


def exact_index_path(index_dir: str) -> str:
    """The (md5, rep_id) exact-duplicate table of the live generation —
    the pre-collapse index dedup_stream consults before shingling
    (identical texts never reach the band index twice); compaction
    rewrites it alongside bands/shingles."""
    return table_path(index_dir, "exact")


def compact_band_index(
    spark: SparkSession,
    index_dir: str,
    retained_docs: DataFrame | None = None,
    n_partitions: int | None = None,
    lock_timeout: float = 60.0,
) -> int | None:
    """Compact (and optionally retain) the band index into a fresh
    generation, then atomically swap the CURRENT pointer to it.

    ``retained_docs`` — a (doc_id) frame of documents to KEEP (the TTL
    window, derived by the caller from its document ledger); None keeps
    everything (pure compaction). Returns the new generation id, or None
    when there is no index yet.

    Holds :func:`writer_lock` across the whole read->write->swap so no
    concurrent ``index_new_batch`` append can land in the old generation
    after this function has snapshotted it (such rows would be silently
    dropped from the new generation and deleted by pruning). The writes
    execute the reads, so every file-listing of the old generation
    happens inside the critical section."""
    with writer_lock(index_dir, timeout=lock_timeout):
        bands_path, sh_path = index_paths(index_dir)
        ex_path = exact_index_path(index_dir)
        if not os.path.isdir(bands_path):
            return None
        bands = spark.read.parquet(bands_path).dropDuplicates()
        shingles = spark.read.parquet(sh_path).dropDuplicates()
        exact = (
            spark.read.parquet(ex_path).dropDuplicates()
            if os.path.isdir(ex_path)
            else None
        )
        if retained_docs is not None:
            keep = F.broadcast(retained_docs.select("doc_id").dropDuplicates())
            bands = bands.join(keep, "doc_id", "left_semi")
            shingles = shingles.join(keep, "doc_id", "left_semi")
            if exact is not None:
                # an md5 row whose REPRESENTATIVE is evicted is dropped:
                # a future exact dup of that text re-enters as a fresh
                # representative (the same forget-the-window semantics
                # the band rows get)
                keep_rep = F.broadcast(
                    retained_docs.select(
                        F.col("doc_id").alias("rep_id")
                    ).dropDuplicates()
                )
                exact = exact.join(keep_rep, "rep_id", "left_semi")
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
        shingles.repartition(n_partitions, "sh").write.mode(
            "overwrite"
        ).parquet(os.path.join(gen_root, "shingles"))
        if exact is not None:
            # clustered by its probe key: per-batch exact lookups are an
            # equi-join on md5
            exact.repartition(n_partitions, "md5").write.mode(
                "overwrite"
            ).parquet(os.path.join(gen_root, "exact"))
        # atomic pointer swap: tmp write + os.replace — a crash anywhere
        # above leaves CURRENT naming the old, complete generation
        tmp = os.path.join(index_dir, "." + _CURRENT + ".tmp")
        with open(tmp, "w") as fh:
            fh.write(str(gen))
        os.replace(tmp, os.path.join(index_dir, _CURRENT))
        return gen


def compact_simhash_index(
    spark: SparkSession,
    index_dir: str,
    retained_docs: DataFrame | None = None,
    n_partitions: int | None = None,
    lock_timeout: float = 60.0,
) -> int | None:
    """The simhash twin of :func:`compact_band_index` — the compaction
    face simhash_stream's docstring promised would slot in without a new
    protocol, and does: same writer lock, same generation write + atomic
    CURRENT swap, same ledger-owned retention semi-join; only the table
    differs (simbands: doc_id, sim_lo, sim_hi, band_idx, band_key —
    fingerprints inlined, so retention is one semi-join on doc_id with
    no second table to keep consistent). Clustered by the probe key
    (band_idx, band_key), the per-batch candidate equi-join's layout.
    Returns the new generation id, or None when there is no index."""
    with writer_lock(index_dir, timeout=lock_timeout):
        bands_path = table_path(index_dir, "simbands")
        if not os.path.isdir(bands_path):
            return None
        bands = spark.read.parquet(bands_path).dropDuplicates()
        if retained_docs is not None:
            keep = F.broadcast(retained_docs.select("doc_id").dropDuplicates())
            bands = bands.join(keep, "doc_id", "left_semi")
        if n_partitions is None:
            from purldb_spark.conf import shuffle_partitions

            n_partitions = shuffle_partitions(spark)
        gen = (current_generation(index_dir) or 0) + 1
        gen_root = os.path.join(index_dir, f"gen={gen}")
        bands.repartition(n_partitions, "band_idx", "band_key").write.mode(
            "overwrite"
        ).parquet(os.path.join(gen_root, "simbands"))
        tmp = os.path.join(index_dir, "." + _CURRENT + ".tmp")
        with open(tmp, "w") as fh:
            fh.write(str(gen))
        os.replace(tmp, os.path.join(index_dir, _CURRENT))
        return gen


def compact_ann_index(
    spark: SparkSession,
    index_dir: str,
    retained_vecs: DataFrame | None = None,
    n_partitions: int | None = None,
    lock_timeout: float = 60.0,
) -> int | None:
    """The ANN-codes twin of :func:`compact_band_index`: rewrite the
    streamed (vec_id, cell, codes) table as one fresh generation
    CLUSTERED BY CELL — the probe path's equi-join key, so a compacted
    index co-locates each cell's shortlist — with the ledger-owned
    retention semi-join on vec_id (a dropped vector leaves the index;
    FAISS remove_ids, as maintenance instead of tombstones). Same lock,
    generation write, atomic CURRENT swap. Returns the new generation
    id, or None when there is no index."""
    from purldb_spark.streaming.ann_stream import codes_path

    with writer_lock(index_dir, timeout=lock_timeout):
        path = codes_path(index_dir)
        if not os.path.isdir(path):
            return None
        rows = spark.read.parquet(path).dropDuplicates()
        if retained_vecs is not None:
            keep = F.broadcast(retained_vecs.select("vec_id").dropDuplicates())
            rows = rows.join(keep, "vec_id", "left_semi")
        if n_partitions is None:
            from purldb_spark.conf import shuffle_partitions

            n_partitions = shuffle_partitions(spark)
        gen = (current_generation(index_dir) or 0) + 1
        gen_root = os.path.join(index_dir, f"gen={gen}")
        rows.repartition(n_partitions, "cell").write.mode("overwrite").parquet(
            os.path.join(gen_root, "codes")
        )
        tmp = os.path.join(index_dir, "." + _CURRENT + ".tmp")
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
        legacy = d in ("bands", "shingles", "exact", "simbands", "codes")
        if (stale_gen or legacy) and os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
            removed.append(path)
        elif d == "_SUCCESS" or (
            d.startswith("part-") and d.endswith(".parquet")
        ):
            # pre-generation ANN flat layout: loose parquet at the index
            # root, shadowed by the live generation once CURRENT exists
            with contextlib.suppress(OSError):
                os.remove(path)
                removed.append(path)
    return removed
