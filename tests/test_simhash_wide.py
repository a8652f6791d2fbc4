"""120-bit SimHash (operators/simhash_wide.py — the r11 fingerprint-width
upgrade, built ahead of its registry wiring): cross-engine identity,
Python-replay exactness, and pigeonhole completeness vs brute force."""

from __future__ import annotations

import hashlib

import duckdb

from purldb_spark.operators.simhash_wide import (
    BAND_BITS,
    HALF_BITS,
    N_BANDS,
    WIDE_BITS,
    simhash_wide,
    simhash_wide_sql,
    wide_near_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog".split()),
    (2, "the quick brown fox jumps over the lazy cat".split()),  # near 1
    (3, "completely different vocabulary in this one entirely".split()),
    (4, "the quick brown fox jumps over the lazy dog".split()),  # == 1
]
TOKS = [(i, t) for i, ts in DOCS for t in set(ts)]


def _py_simhash(tokens: set[str]) -> tuple[int, int]:
    votes = [0] * WIDE_BITS
    for t in tokens:
        hx = hashlib.md5(t.encode()).hexdigest()
        lo, hi = int(hx[0:15], 16), int(hx[15:30], 16)
        for b in range(HALF_BITS):
            votes[b] += 1 if (lo >> b) & 1 else -1
            votes[HALF_BITS + b] += 1 if (hi >> b) & 1 else -1
    pack = lambda off: sum(
        1 << b for b in range(HALF_BITS) if votes[off + b] > 0
    )
    return pack(0), pack(HALF_BITS)


def test_matches_python_replay_and_duckdb(spark):
    df = spark.createDataFrame(TOKS, "doc_id long, tok string")
    got = {
        r["doc_id"]: (r["sim_lo"], r["sim_hi"])
        for r in simhash_wide(df, "doc_id").collect()
    }
    for i, ts in DOCS:
        assert got[i] == _py_simhash(set(ts)), i

    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in TOKS)
    toks_sql = f"SELECT * FROM (VALUES {vals}) AS t(doc_id, tok)"
    du = {
        r[0]: (r[1], r[2])
        for r in con.execute(simhash_wide_sql("doc_id", toks_sql)).fetchall()
    }
    assert du == got


def test_identical_docs_and_band_layout(spark):
    df = spark.createDataFrame(TOKS, "doc_id long, tok string")
    sim = {r["doc_id"]: (r["sim_lo"], r["sim_hi"]) for r in simhash_wide(df, "doc_id").collect()}
    assert sim[1] == sim[4]  # identical token sets -> identical fingerprint
    assert 0 <= sim[1][0] < (1 << HALF_BITS)
    assert N_BANDS * BAND_BITS == WIDE_BITS


def test_pigeonhole_complete_vs_bruteforce(spark):
    df = spark.createDataFrame(TOKS, "doc_id long, tok string")
    simdf = simhash_wide(df, "doc_id")
    sim = {r["doc_id"]: (r["sim_lo"], r["sim_hi"]) for r in simdf.collect()}
    brute = {
        (a, b)
        for a in sim
        for b in sim
        if a < b
        and bin(sim[a][0] ^ sim[b][0]).count("1")
        + bin(sim[a][1] ^ sim[b][1]).count("1")
        <= 3
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in wide_near_pairs(simdf, "doc_id", max_hamming=3).collect()
    }
    assert got == brute
    assert (1, 4) in got  # exact dup at hamming 0
