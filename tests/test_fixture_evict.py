"""Liveness-aware eviction of the on-disk bucketed-table directories
(plans/fixture_runtime._evict_dead_bucketed): a CONCURRENT live session's
directory must survive, only provably-dead sessions' directories (owner
pid gone, or pidfile-less and stale past the TTL) are removed.
"""

from __future__ import annotations

import os

from purldb_spark.plans.fixture_runtime import (
    _NO_PIDFILE_TTL_SEC,
    _OWNER_PIDFILE,
    _evict_dead_bucketed,
    _pid_alive,
)


def _mkdir_with_pid(root, name, pid):
    d = root / name
    d.mkdir()
    (d / _OWNER_PIDFILE).write_text(str(pid))
    return d


def _dead_pid() -> int:
    """A pid guaranteed dead: fork a child that exits immediately, reap it."""
    pid = os.fork()
    if pid == 0:
        os._exit(0)
    os.waitpid(pid, 0)
    return pid


def test_live_concurrent_session_survives(tmp_path):
    live = _mkdir_with_pid(tmp_path, "app-other-live", os.getpid())
    dead = _mkdir_with_pid(tmp_path, "app-other-dead", _dead_pid())
    _evict_dead_bucketed(str(tmp_path), "app-me")
    assert live.is_dir(), "live concurrent session's tables were evicted"
    assert not dead.is_dir(), "dead session's tables were kept"


def test_own_directory_never_touched(tmp_path):
    mine = _mkdir_with_pid(tmp_path, "app-me", _dead_pid())  # even w/ dead pid
    _evict_dead_bucketed(str(tmp_path), "app-me")
    assert mine.is_dir()


def test_pidfile_less_directory_uses_age_ttl(tmp_path):
    fresh = tmp_path / "app-legacy-fresh"
    fresh.mkdir()
    stale = tmp_path / "app-legacy-stale"
    stale.mkdir()
    old = os.path.getmtime(stale) - (_NO_PIDFILE_TTL_SEC + 60)
    os.utime(stale, (old, old))
    _evict_dead_bucketed(str(tmp_path), "app-me")
    assert fresh.is_dir(), "recent pidfile-less dir (mid-creation race) evicted"
    assert not stale.is_dir(), "stale pidfile-less dir kept"


def test_garbage_pidfile_falls_back_to_ttl(tmp_path):
    d = tmp_path / "app-garbage"
    d.mkdir()
    (d / _OWNER_PIDFILE).write_text("not-a-pid")
    _evict_dead_bucketed(str(tmp_path), "app-me")
    assert d.is_dir()  # fresh -> kept despite unreadable pidfile


def test_missing_root_is_noop(tmp_path):
    _evict_dead_bucketed(str(tmp_path / "nope"), "app-me")


def test_pid_alive_probe():
    assert _pid_alive(os.getpid())
    assert not _pid_alive(_dead_pid())


def test_ttl_measures_pidfile_idleness_not_dir_age(tmp_path):
    """r9 advice closure (landed r11): a LIVE session whose directory is
    ancient but whose pidfile was touched recently (the cache-hit refresh)
    must survive the sweep; the same live pid with an ancient PIDFILE is
    treated as a recycled-pid ghost and evicted."""
    import time

    from purldb_spark.plans.fixture_runtime import _PIDFILE_TTL_SEC

    root = tmp_path / ".bucketed"
    root.mkdir()
    ancient = time.time() - _PIDFILE_TTL_SEC - 3600

    # active long-runner: old dir, freshly-touched pidfile -> survives
    live = _mkdir_with_pid(root, "longrunner", os.getpid())
    os.utime(live, (ancient, ancient))  # dir mtime ancient
    _evict_dead_bucketed(str(root), "me")
    assert live.exists()

    # recycled-pid ghost: live-looking pid, ancient pidfile -> evicted
    ghost = _mkdir_with_pid(root, "ghost", os.getpid())
    os.utime(ghost / _OWNER_PIDFILE, (ancient, ancient))
    _evict_dead_bucketed(str(root), "me")
    assert not ghost.exists()
    assert live.exists()


def test_cache_bookkeeping_survives_concurrent_chains():
    """ADVICE r10 (fixed r11): prebuild runs fixture chains in a
    ThreadPoolExecutor, and the old unguarded stale-key scan iterated the
    live cache dict while other chains inserted built keys — RuntimeError
    'dictionary changed size during iteration'. Hammer cached_fixture
    from many threads across alternating fake sessions (so the evict
    branch runs constantly against concurrent inserts) and assert no
    exception and one-build-per-key semantics within a session."""
    import threading
    from collections import Counter
    from concurrent.futures import ThreadPoolExecutor

    from purldb_spark.plans import fixture_runtime as fc

    class FakeCtx:
        def __init__(self, app):
            self.applicationId = app

    class FakeSpark:
        def __init__(self, app):
            self.sparkContext = FakeCtx(app)

    fc._CACHE.clear()
    builds: Counter = Counter()
    lock = threading.Lock()
    barrier = threading.Barrier(16)

    def chain(i: int):
        barrier.wait()  # maximize interleaving
        app = f"app{i % 2}"  # two sessions -> constant cross-evictions
        spark = FakeSpark(app)
        for j in range(200):
            key = f"fx{j % 10}"

            def build(app=app, key=key):
                with lock:
                    builds[(app, key)] += 1
                return object()

            assert fc.cached_fixture(spark, key, build) is not None
        return True

    with ThreadPoolExecutor(max_workers=16) as ex:
        assert all(ex.map(chain, range(16)))
    # every (session, key) was built at least once; duplicate builds are
    # allowed by the contract (first insert wins) but unbounded rebuilds
    # would mean the cache never retains — bound them loosely
    assert builds and max(builds.values()) < 16 * 200
    fc._CACHE.clear()


def test_identity_pidfile_live_owner_never_idles_out(tmp_path):
    """ADVICE r11 closure: the current pidfile format records (pid,
    /proc start-ticks). An identity-MATCHED owner is provably the same
    still-running process, so its directory survives ANY idleness — the
    old idleness TTL evicted a live session busy elsewhere for a day."""
    import time

    from purldb_spark.plans.fixture_runtime import (
        _PIDFILE_TTL_SEC,
        _proc_ident,
    )

    root = tmp_path / ".bucketed"
    root.mkdir()
    ancient = time.time() - _PIDFILE_TTL_SEC - 3600

    d = root / "live-idle"
    d.mkdir()
    (d / _OWNER_PIDFILE).write_text(_proc_ident(os.getpid()))
    os.utime(d / _OWNER_PIDFILE, (ancient, ancient))  # idle way past TTL
    os.utime(d, (ancient, ancient))
    _evict_dead_bucketed(str(root), "me")
    assert d.exists(), "identity-matched live owner evicted on idleness"


def test_identity_pidfile_recycled_or_dead_evicts_at_once(tmp_path):
    """Ticks mismatch (pid recycled) or dead pid with the current format:
    evicted immediately, no TTL grace — identity is proof either way."""
    root = tmp_path / ".bucketed"
    root.mkdir()

    recycled = root / "recycled"
    recycled.mkdir()
    # live pid, wrong start-ticks -> a different (dead) process wrote it
    (recycled / _OWNER_PIDFILE).write_text(f"{os.getpid()}:0")

    dead = root / "dead"
    dead.mkdir()
    (dead / _OWNER_PIDFILE).write_text(f"{_dead_pid()}:12345")

    _evict_dead_bucketed(str(root), "me")
    assert not recycled.exists(), "recycled-pid ghost kept"
    assert not dead.exists(), "dead identity-format owner kept"


def test_same_key_concurrent_requests_build_exactly_once():
    """ADVICE r11 closure: two prebuild chains racing the same key used
    to BOTH run the Spark build, the loser's checkpointed frame leaking
    un-unpersisted. The per-key build lock makes the same (session, key)
    build exactly once; different keys still build concurrently."""
    import threading
    from collections import Counter
    from concurrent.futures import ThreadPoolExecutor

    from purldb_spark.plans import fixture_runtime as fc

    class FakeCtx:
        def __init__(self, app):
            self.applicationId = app

    class FakeSpark:
        def __init__(self, app):
            self.sparkContext = FakeCtx(app)

    fc._CACHE.clear()
    builds: Counter = Counter()
    lock = threading.Lock()
    barrier = threading.Barrier(16)
    spark = FakeSpark("one-app")

    def chain(i: int):
        barrier.wait()
        key = f"samekey{i % 4}"  # 16 threads pile onto 4 keys

        def build(key=key):
            with lock:
                builds[key] += 1
            return object()

        return fc.cached_fixture(spark, key, build)

    with ThreadPoolExecutor(max_workers=16) as ex:
        results = list(ex.map(chain, range(16)))
    assert all(r is not None for r in results)
    assert builds == Counter({f"samekey{k}": 1 for k in range(4)})
    # all threads asking one key got the SAME object (the single build)
    fc._CACHE.clear()
