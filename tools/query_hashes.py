"""Change-aware hashes for the driver-check rotation.

Each registered query gets a content hash covering:
  * the source file of the module its builder function lives in,
  * every purldb_spark module that file (transitively) imports,
  * its DuckDB oracle SQL string.

``__spark_entry__._rotated_names`` demotes a previously driver-green query to
the tail of the registration order only when its CURRENT hash equals the hash
recorded in QUERY_HASHES.json at the time it went green — so any edit to the
query, its oracle, or any purldb_spark module it depends on re-registers it
at the front for driver re-verification.

Maintenance (run at the START of each round, before editing code):

    python tools/query_hashes.py update

This walks every ``round N: verdict/...`` commit, checks out the tested tree
(that commit's parent) into a temp git worktree, computes hashes there, and
records — for each query green in CORRECTNESS_rN.json — the hash from the
latest round in which it was green.  Ad-hoc: ``python tools/query_hashes.py
print`` dumps the current tree's hashes to stdout.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import subprocess
import sys
import tempfile

_IMPORT_RX = re.compile(
    r"^\s*(?:from|import)\s+(purldb_spark(?:\.[A-Za-z_][A-Za-z0-9_]*)*)", re.M
)


def _module_file(root: str, dotted: str) -> str | None:
    rel = dotted.replace(".", os.sep)
    for cand in (rel + ".py", os.path.join(rel, "__init__.py")):
        path = os.path.join(root, cand)
        if os.path.isfile(path):
            return path
    return None


# Excluded from every closure: registry.py imports EVERY plan module (its
# load_inventory), so traversing through it would make each query's closure
# the whole package and any one edit would invalidate all hashes (the
# round-3 rotation pathology).  The registration decorator itself carries no
# query semantics, so its source is not hashed either.
#
# fixture_runtime.py holds ONLY lock/pidfile/eviction plumbing (per-key
# build locks, session cache dicts, the bucketed-dir lease).  Invariant
# (pinned by tests/test_fixture_runtime_isolation.py): nothing in it shapes
# a query result, and it imports no purldb_spark module — a bug there
# causes loud failures (missing files, lock timeouts, double builds),
# never a silently different answer, which is the only class this hash
# rotation exists to catch.  Excluding it stops lock/eviction edits from
# re-staling the ~50 oracle queries whose closure reaches the fixture
# cache (the r11–r13 restale cycle).
_EXCLUDED = {
    "purldb_spark.plans.registry",
    "purldb_spark.plans.fixture_runtime",
}


def _closure_files(root: str, start_dotted: str) -> list[str]:
    """Transitive purldb_spark source files reachable from one module.

    Traversal never enters ``plans/registry.py`` (see _EXCLUDED) — a query's
    hash covers its own plan module plus the operator/function/source modules
    it actually uses, not the whole package.
    """
    seen: dict[str, str] = {}
    todo = [start_dotted]
    while todo:
        dotted = todo.pop()
        if dotted in _EXCLUDED:
            continue
        path = _module_file(root, dotted)
        if path is None or path in seen.values():
            continue
        seen[dotted] = path
        try:
            with open(path, encoding="utf-8") as fh:
                src = fh.read()
        except OSError:
            continue
        for m in _IMPORT_RX.finditer(src):
            mod = m.group(1)
            if mod not in seen:
                todo.append(mod)
            # "from purldb_spark.a import b" may name a submodule b
            parent = _module_file(root, mod)
            if parent and parent.endswith("__init__.py"):
                for sub in re.findall(
                    rf"^\s*from\s+{re.escape(mod)}\s+import\s+(.+)$", src, re.M
                ):
                    for name in re.split(r"[,\s]+", sub.split("#")[0]):
                        name = name.strip("() ")
                        if name and mod + "." + name not in seen:
                            todo.append(mod + "." + name)
    return sorted(set(seen.values()))


def compute_hashes(repo_root: str | None = None) -> dict[str, str]:
    """name -> sha256 over (module closure sources + oracle SQL)."""
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    from purldb_spark.plans.registry import ORACLES, QUERIES, load_inventory

    load_inventory()
    out: dict[str, str] = {}
    file_digests: dict[str, str] = {}
    for name, fn in QUERIES.items():
        mod = getattr(fn, "__module__", "") or ""
        if not mod.startswith("purldb_spark"):
            mod = "purldb_spark.plans.registry"
        h = hashlib.sha256()
        for path in _closure_files(root, mod):
            if path not in file_digests:
                with open(path, "rb") as fh:
                    file_digests[path] = hashlib.sha256(fh.read()).hexdigest()
            h.update(os.path.relpath(path, root).encode())
            h.update(file_digests[path].encode())
        h.update(b"\x00oracle\x00")
        h.update(ORACLES.get(name, "").encode())
        out[name] = h.hexdigest()
    return out


def _green_names(correctness_path: str) -> set[str]:
    with open(correctness_path) as fh:
        data = json.load(fh)
    if not isinstance(data, dict):
        return set()
    return {
        n
        for n, r in data.items()
        if isinstance(r, dict)
        and r.get("rows_match")
        and r.get("schema_match")
        and r.get("hash_match")
    }


def _hashes_at_commit(repo: str, commit: str) -> dict[str, str]:
    """Compute hashes for the tree at `commit` via a throwaway worktree."""
    with tempfile.TemporaryDirectory() as tmp:
        wt = os.path.join(tmp, "wt")
        subprocess.run(
            ["git", "-C", repo, "worktree", "add", "--detach", wt, commit],
            check=True,
            capture_output=True,
        )
        try:
            # run THIS file's compute_hashes against the old tree in a
            # subprocess so the old package versions are what get imported
            code = (
                "import json,sys;"
                f"sys.path.insert(0,{os.path.dirname(os.path.abspath(__file__))!r});"
                "import query_hashes as qh;"
                f"print(json.dumps(qh.compute_hashes({wt!r})))"
            )
            res = subprocess.run(
                [sys.executable, "-c", code],
                check=True,
                capture_output=True,
                text=True,
                cwd=tmp,
            )
            return json.loads(res.stdout.strip().splitlines()[-1])
        finally:
            subprocess.run(
                ["git", "-C", repo, "worktree", "remove", "--force", wt],
                capture_output=True,
            )


def update(repo: str) -> dict[str, str]:
    log = subprocess.run(
        ["git", "-C", repo, "log", "--format=%H %s"],
        check=True,
        capture_output=True,
        text=True,
    ).stdout
    rounds: list[tuple[int, str]] = []  # (round, tested_commit)
    for line in log.splitlines():
        sha, _, subj = line.partition(" ")
        m = re.match(r"round (\d+): verdict/", subj)
        if m:
            rounds.append((int(m.group(1)), sha + "^"))
    rounds.sort()  # process oldest→newest so the latest green wins
    recorded: dict[str, str] = {}
    for rnd, tested in rounds:
        cpath = os.path.join(repo, f"CORRECTNESS_r{rnd:02d}.json")
        if not os.path.isfile(cpath):
            continue
        green = _green_names(cpath)
        if not green:
            continue
        hashes = _hashes_at_commit(repo, tested)
        for name in green:
            if name in hashes:
                recorded[name] = hashes[name]
    out_path = os.path.join(repo, "QUERY_HASHES.json")
    with open(out_path, "w") as fh:
        json.dump(recorded, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {len(recorded)} hashes to {out_path}")
    return recorded


if __name__ == "__main__":
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) > 1 and sys.argv[1] == "update":
        update(repo_root)
    else:
        print(json.dumps(compute_hashes(repo_root), indent=1, sort_keys=True))
