"""Sketch-family parity: the relational HLL / Count-Min sketches must equal
a plain-Python replay of the same algorithm (same md5 hash convention), and
the Count-Min estimator must be one-sided (never underestimates).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

from purldb_spark.plans.registry import ORACLES, QUERIES, load_inventory
from tests.conftest import SF_SMOKE

load_inventory()


def _md5_int(s: str, nhex: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)


def _py_hll(user_ids: list[int]) -> tuple[int, int, int]:
    """(registers_used, zeros, est_e6) — the exact algorithm of
    sketch_hll_distinct: m=64, 60-bit md5 hash, e6-grid estimate."""
    regs: dict[int, int] = {}
    for u in user_ids:
        hv = _md5_int(str(u), 15)
        idx, rest = hv >> 54, hv & ((1 << 54) - 1)
        rho = 55 if rest == 0 else 55 - rest.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    present = len(regs)
    zeros = 64 - present
    s = sum(1 << (55 - m) for m in regs.values()) + zeros * (1 << 55)
    raw_e6 = math.floor(1000000.0 * 709.0 * 4096.0 * float(1 << 55) / (1000.0 * float(s)))
    if zeros > 0 and raw_e6 < 160_000_000:
        est = math.floor(1000000.0 * 64.0 * math.log(64.0 / zeros))
    else:
        est = raw_e6
    return present, zeros, est


def test_hll_matches_python_replay(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, user_id FROM '{SF_SMOKE}/events.parquet'"
    ).fetchall()
    con.close()
    by_type: dict[str, list[int]] = {}
    for t, u in rows:
        by_type.setdefault(t, []).append(u)

    got = {
        r["event_type"]: r
        for r in QUERIES["sketch_hll_distinct"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(by_type)
    for t, users in by_type.items():
        present, zeros, est = _py_hll(users)
        r = got[t]
        assert r["n_exact"] == len(set(users))
        assert r["registers_used"] == present
        assert r["zeros"] == zeros
        assert r["hll_est_e6"] == est
        assert r["registers_used"] + r["zeros"] == 64


def test_cms_matches_python_replay_and_never_underestimates(spark):
    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM '{SF_SMOKE}/documents.parquet'"
        ).fetchall()
    ]
    con.close()
    exact = Counter(w for t in texts for w in t.split(" ") if w)
    cells: Counter = Counter()
    for w, c in exact.items():
        for j in range(4):
            cells[(j, _md5_int(f"cms{j}|{w}", 8) % 8)] += c
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = {
        r["token"]: r for r in QUERIES["sketch_cms_topk"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {w for w, _ in top}
    for w, c in top:
        est = min(cells[(j, _md5_int(f"cms{j}|{w}", 8) % 8)] for j in range(4))
        r = got[w]
        assert r["exact_cnt"] == c
        assert r["cms_est"] == est
        assert r["overestimate"] == est - c
        assert r["cms_est"] >= r["exact_cnt"], "CMS must never underestimate"


def test_histogram_quantiles_match_python_replay(spark):
    """Histogram quantile estimates replay exactly in Python, are one-sided
    (upper bin edge >= exact), and the error is bounded by the bin width."""
    import duckdb as _duck

    con = _duck.connect()
    vals = [
        (r[0], int(round(r[1] * 100)))
        for r in con.execute(
            f"SELECT event_id, value FROM '{SF_SMOKE}/events.parquet'"
        ).fetchall()
    ]
    con.close()
    n = len(vals)
    cents = sorted(c for _, c in vals)
    from collections import Counter as _C

    hist = _C(c // 256 for c in cents)
    got = {
        r["pct"]: r
        for r in QUERIES["sketch_histogram_quantiles"](spark, SF_SMOKE).collect()
    }
    assert set(got) == {50, 95, 99}
    for p, r in got.items():
        rk = (p * n + 99) // 100
        exact = cents[rk - 1]
        cum = 0
        for b in sorted(hist):
            cum += hist[b]
            if cum >= rk:
                est = (b + 1) * 256 - 1
                break
        assert r["n"] == n
        assert r["exact_cents"] == exact
        assert r["est_hi_cents"] == est
        assert r["err_cents"] == est - exact
        assert 0 <= r["err_cents"] < 256, "one-sided, bin-width-bounded"
