"""Runtime plumbing for the session fixture caches — NO query semantics.

This module holds the lock / pidfile / eviction machinery behind
``plans/fixture_cache.py``'s fixture definitions: per-key build locks,
the session-scoped cache dicts, and the bucketed-table directory
lease (owner pidfiles + provably-dead eviction sweep).

INVARIANT (load-bearing for the driver-check rotation): nothing in this
module shapes a query RESULT.  A bug here causes loud failures — a missing
table file, a lock timeout, a double build — never a silently different
answer, which is exactly the class the content-hash rotation
(tools/query_hashes.py) exists to catch.  On that basis this module is in
``query_hashes._EXCLUDED``: editing it does not re-stale the ~50 oracle
queries whose import closure reaches the fixture cache (the r11–r13
restale cycle).  Consequences:

  * This module must not import from any purldb_spark module
    (tests/test_fixture_runtime_isolation.py pins this): a semantic
    import here would smuggle result-shaping code out of the hash
    closure.
  * Anything that decides WHAT a fixture contains — build functions,
    cache-key strings, bucket counts, table names — stays in
    fixture_cache.py, inside the hash closure.
"""

from __future__ import annotations

import os
import shutil
import threading
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str], DataFrame] = {}

# prebuild_fixtures runs fixture chains in a ThreadPoolExecutor, so cache
# get/evict/insert must be atomic: the old unguarded stale-key scan iterated
# the live dict while concurrent chains inserted built keys (RuntimeError:
# dictionary changed size during iteration). One lock serves both dicts —
# only bookkeeping runs under it; Spark builds stay outside.
_CACHE_LOCK = threading.Lock()


def _cache_lookup(cache: dict, app: str, cache_key: tuple) -> object | None:
    """Atomic get-or-evict-stale: returns the cached value, or None after
    dropping other sessions' entries (snapshot iteration + pop, under
    lock). Stale sessions' BUILD LOCKS are pruned in the same sweep —
    without it a long-lived process cycling many Spark sessions leaked
    one Lock per (dead session, key) forever; a lock currently held is
    kept (its builder thread will release it)."""
    with _CACHE_LOCK:
        val = cache.get(cache_key)
        if val is None:
            for k in [k for k in list(cache) if k[0] != app]:
                cache.pop(k, None)
            for k in [
                k
                for k, lk in list(_BUILD_LOCKS.items())
                if k[0] != app and not lk.locked()
            ]:
                _BUILD_LOCKS.pop(k, None)
        return val


def _cache_insert(cache: dict, cache_key: tuple, val):
    """Atomic insert; first writer wins if two chains raced the same build."""
    with _CACHE_LOCK:
        return cache.setdefault(cache_key, val)


# Build-cost ledger: wall seconds spent inside each fixture build() call,
# keyed by the fixture's cache-key string. Pure accounting (shapes no
# result — within this module's hash-exclusion invariant). bench.py
# snapshots it around the timed query loop so a fixture built LAZILY by
# the first query that touches it is charged to fixture_build_sec, not to
# that query's time (r13 verdict: the dedup-family attribution question).
_BUILD_SECONDS: dict[str, float] = {}


def build_seconds_total() -> float:
    """Total wall seconds spent in fixture/model builds so far this
    process (monotone; snapshot-and-diff to window it)."""
    with _CACHE_LOCK:
        return sum(_BUILD_SECONDS.values())


def build_seconds_by_key() -> dict[str, float]:
    """Copy of the per-key build ledger."""
    with _CACHE_LOCK:
        return dict(_BUILD_SECONDS)


# per-cache-key build locks: two prebuild chains asking for the SAME key
# must not both run the expensive Spark build — the loser's eagerly
# localCheckpoint'ed frame would be discarded by setdefault without an
# unpersist, leaking its checkpoint blocks for the session lifetime (r11
# advice). One lock per key keeps DIFFERENT keys building in parallel
# (the prebuild concurrency the ThreadPoolExecutor exists for) while the
# same key builds exactly once and latecomers wait for the cached value.
_BUILD_LOCKS: dict[tuple, threading.Lock] = {}


def _get_or_build(cache: dict, app: str, cache_key: tuple, build):
    """Lookup with single-builder semantics: evict other sessions' keys,
    return a hit, else build under the key's lock (double-checked, so a
    waiter that blocked behind the builder returns the builder's value
    instead of re-running the build)."""
    val = _cache_lookup(cache, app, cache_key)
    if val is not None:
        return val
    with _CACHE_LOCK:
        lock = _BUILD_LOCKS.setdefault(cache_key, threading.Lock())
    with lock:
        val = _cache_lookup(cache, app, cache_key)
        if val is None:
            t0 = time.perf_counter()
            built = build()
            elapsed = time.perf_counter() - t0
            val = _cache_insert(cache, cache_key, built)
            with _CACHE_LOCK:
                key_str = str(cache_key[1]) if len(cache_key) > 1 else str(cache_key)
                _BUILD_SECONDS[key_str] = (
                    _BUILD_SECONDS.get(key_str, 0.0) + elapsed
                )
    return val


def cached_fixture(
    spark: SparkSession, key: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the cached frame for ``key`` in this session, building it via
    ``build()`` (which should end in an eager localCheckpoint) on first use.
    Concurrent requests for the same key block behind one build."""
    app = spark.sparkContext.applicationId
    return _get_or_build(_CACHE, app, (app, key), build)


_DRIVER_CACHE: dict[tuple[str, str], object] = {}


def cached_model(spark: SparkSession, key: str, build: Callable[[], object]):
    """Session-scoped cache for DRIVER-SIDE model artifacts (centroid
    lists, PQ codebooks — a few KB of Python floats, not DataFrames).
    Same single-builder semantics as cached_fixture."""
    app = spark.sparkContext.applicationId
    return _get_or_build(_DRIVER_CACHE, app, (app, key), build)


# ---------------------------------------------------------------------------
# Bucketed-table directory lease: owner pidfiles + provably-dead eviction.

_BUCKETED: dict[tuple[str, str], tuple[str, str]] = {}

_OWNER_PIDFILE = ".owner_pid"
# a directory with NO pidfile (pre-pidfile layout, or one racing between
# mkdir and pidfile write) is evicted only once it is unambiguously stale
_NO_PIDFILE_TTL_SEC = 3600.0
# LEGACY pid-only pidfiles (pre-r12 format) still age out on a generous
# idleness clock: with only a bare pid, a recycled pid would otherwise
# make a dead session's directory immortal. The current format records
# (pid, /proc start-ticks), which detects recycling directly — an
# identity-matched owner is provably alive and is NEVER evicted, however
# long it idles (r11 advice: a live session busy elsewhere for a day
# must not lose its bucketed tables to a concurrent session's sweep).
_PIDFILE_TTL_SEC = 86400.0


def _proc_ident(pid: int) -> str | None:
    """``pid:starttime`` for a live process, None for a dead one — the
    start-ticks component (field 22 of /proc/pid/stat) defeats pid
    recycling: a recycled pid has a different start time, so a dead
    owner's pidfile reads as stale even if its pid number is live again.
    Falls back to ``pid:`` (empty ticks) where /proc is unreadable but
    the signal-0 probe says alive — degrades to the legacy pid-only
    liveness rather than evicting a live owner."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as fh:
            data = fh.read()
        fields = data[data.rindex(b")") + 2 :].split()
        return f"{pid}:{fields[19].decode()}"
    except (OSError, ValueError, IndexError):
        return f"{pid}:" if _pid_alive(pid) else None


def _pid_alive(pid: int) -> bool:
    """True iff ``pid`` is a plausible live process on this host
    (signal-0 probe).

    ``pid <= 0`` is never a specific process — 0 signals the caller's own
    process group and negative values signal whole groups, so os.kill
    would "succeed" and a corrupt pidfile would pin the directory forever;
    treat those as dead.  PermissionError means the pid exists under
    another uid — alive."""
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _evict_dead_bucketed(root: str, app: str) -> None:
    """Remove other sessions' ``.bucketed/<appId>`` directories ONLY when
    their owning driver process is provably dead (pidfile probe), or —
    for directories without a pidfile — older than _NO_PIDFILE_TTL_SEC.

    A live concurrent session (parallel bench, test run, CI worker) keeps
    its directory: blind rmtree of everything-not-me would yank its
    bucketed table files mid-query (missing-file task failures)."""
    if not os.path.isdir(root):
        return
    for d in os.listdir(root):
        if d == app:
            continue
        path = os.path.join(root, d)
        pidfile = os.path.join(path, _OWNER_PIDFILE)
        try:
            holder = open(pidfile).read().strip()
            pid = int(holder.split(":", 1)[0])
        except (OSError, ValueError):
            # no/unreadable pidfile: dir-mtime age fallback only
            try:
                age = time.time() - os.path.getmtime(path)
            except OSError:
                continue
            if age > _NO_PIDFILE_TTL_SEC:
                shutil.rmtree(path, ignore_errors=True)
            continue
        if ":" in holder:
            # current (pid, start-ticks) format: identity match means the
            # recorded process is STILL RUNNING — never evict it, however
            # idle (r11 advice: eviction by idleness yanked a provably
            # live session's tables). Dead or recycled (ticks mismatch):
            # evict immediately, no TTL grace needed. Alive but ticks
            # unreadable (non-/proc host): fall through to the legacy
            # TTL rule rather than guess either way.
            ident = _proc_ident(pid)
            if ident == holder:
                continue
            if ident is None or not ident.endswith(":"):
                shutil.rmtree(path, ignore_errors=True)
                continue
        # legacy pid-only pidfile: recycling is undetectable, so keep the
        # old belt-and-suspenders — evict when the pid is dead OR the
        # pidfile has idled past the generous TTL (its owner touches it
        # on every cache hit, bucketed_orderkey_tables fast path).
        try:
            age = time.time() - os.path.getmtime(pidfile)
        except OSError:
            continue
        if not _pid_alive(pid) or age > _PIDFILE_TTL_SEC:
            shutil.rmtree(path, ignore_errors=True)


def claim_bucketed_dir(root: str, app: str) -> str:
    """Claim ``root/app`` for this session (pidfile first, before any table
    file lands in it) and evict only PROVABLY DEAD sessions' directories.
    Returns the claimed directory path."""
    appdir = os.path.join(root, app)
    os.makedirs(appdir, exist_ok=True)
    with open(os.path.join(appdir, _OWNER_PIDFILE), "w") as fh:
        # (pid, start-ticks) identity: a concurrent session's sweep can
        # prove this process alive (never evict) or dead/recycled (evict
        # at once) without any idleness heuristic
        fh.write(_proc_ident(os.getpid()) or str(os.getpid()))
    _evict_dead_bucketed(root, app)
    return appdir


def touch_owner(root: str, app: str) -> None:
    """Refresh the owner pidfile's mtime (legacy-TTL idleness clock) on a
    cache hit; best-effort."""
    try:
        os.utime(os.path.join(root, app, _OWNER_PIDFILE))
    except OSError:
        pass
