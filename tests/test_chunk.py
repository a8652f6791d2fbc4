"""Document chunking (plans/q_chunk.py) unit behavior."""

from purldb_spark.plans.q_chunk import _CHUNK, _STRIDE
from purldb_spark.plans.registry import QUERIES, load_inventory

load_inventory()


def _windows(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("___chunk_docs")
    # drive the registered builder against a temp corpus by monkey-loading:
    # simpler to inline the same expressions via the public query on real
    # data for integration, and check edges directly here
    return df


def test_chunk_windows_edges(spark):
    import pyspark.sql.functions as F

    rows = [
        (1, ""),                       # empty text -> exactly one empty chunk
        (2, "x" * _STRIDE),            # exactly one stride -> one chunk
        (3, "x" * (_STRIDE + 1)),      # one char past -> two chunks
        (4, "abcdefgh" * 40),          # 320 chars -> 4 chunks
    ]
    df = _windows(spark, rows)
    last = f"greatest((length(text) - 1) div {_STRIDE}, 0)"
    out = df.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0L, cast({last} as long))")).alias("i"),
        "text",
    ).select(
        "doc_id",
        "i",
        F.expr(
            f"length(substring(text, cast(1 + i * {_STRIDE} as int),"
            f" {_CHUNK}))"
        ).alias("len"),
    )
    got = {(r["doc_id"], r["i"], r["len"]) for r in out.collect()}
    assert (1, 0, 0) in got and sum(1 for g in got if g[0] == 1) == 1
    assert sum(1 for g in got if g[0] == 2) == 1
    assert sum(1 for g in got if g[0] == 3) == 2
    assert sum(1 for g in got if g[0] == 4) == 4
    # overlap invariant: consecutive starts differ by _STRIDE < _CHUNK
    assert _STRIDE < _CHUNK


def test_chunk_queries_consistent(spark):
    """chunk_shared_across_docs is exactly the >1-doc slice of
    text_chunk_windows' md5 histogram."""
    sf = "/root/testdata/sf0.001"
    win = QUERIES["text_chunk_windows"](spark, sf).collect()
    by_md5: dict[str, set[int]] = {}
    occ: dict[str, int] = {}
    for r in win:
        by_md5.setdefault(r["chunk_md5"], set()).add(r["doc_id"])
        occ[r["chunk_md5"]] = occ.get(r["chunk_md5"], 0) + 1
    expect = {
        (h, len(docs), occ[h]) for h, docs in by_md5.items() if len(docs) > 1
    }
    got = {
        (r["chunk_md5"], r["n_docs"], r["n_occurrences"])
        for r in QUERIES["chunk_shared_across_docs"](spark, sf).collect()
    }
    assert got == expect
    # every document contributes n_chunks rows and chunk_idx is dense
    from collections import Counter

    per_doc = Counter(r["doc_id"] for r in win)
    for r in win:
        assert per_doc[r["doc_id"]] == r["n_chunks"]
        assert 0 <= r["chunk_idx"] < r["n_chunks"]


def test_chunk_windows_property(spark):
    """Property: for any text, windows tile the document — every char
    position is inside >= 1 window, consecutive starts differ by exactly
    _STRIDE, the final window reaches the last char, and n_chunks matches
    the closed form. Driven through the streaming helper (the same
    arithmetic the registry queries and the streaming face share)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from purldb_spark.streaming.chunk_stream import chunk_batch

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=3 * _CHUNK + 7),
            min_size=1,
            max_size=6,
            unique=True,
        )
    )
    def run(lengths):
        rows = [(i, "x" * n) for i, n in enumerate(lengths)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = chunk_batch(df).collect()
        by_doc: dict[int, list] = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for i, n in enumerate(lengths):
            ws = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
            want_chunks = max((n - 1) // _STRIDE, 0) + 1
            assert len(ws) == want_chunks
            assert all(r["n_chunks"] == want_chunks for r in ws)
            covered = set()
            for j, r in enumerate(ws):
                assert r["chunk_idx"] == j
                assert r["start_pos"] == 1 + j * _STRIDE
                assert r["chunk_len"] == min(_CHUNK, max(n - j * _STRIDE, 0))
                covered.update(
                    range(r["start_pos"], r["start_pos"] + r["chunk_len"])
                )
            assert covered == set(range(1, n + 1))

    run()
