"""Unit tests for the d2d request-intake operator (operators/d2d.py —
reference matchcode/api.py:454-566)."""

from __future__ import annotations

from purldb_spark.operators.d2d import (
    D2D_DESCRIPTION,
    MSG_COULD_NOT_FETCH,
    d2d_create,
)


def _rows(spark, data):
    df = spark.createDataFrame(
        data, "request_id long, input_urls array<string>, unreachable array<string>"
    )
    return {r["request_id"]: r.asDict() for r in d2d_create(df).collect()}


def test_textarea_newline_normalization(spark):
    """A single textarea string splits on newlines, strips padding, drops
    blank lines (api.py:549-556)."""
    out = _rows(
        spark,
        [(1, ["  https://a/x.zip#from\nhttps://a/y.zip#to\n\n  "], [])],
    )
    r = out[1]
    assert r["status"] == "created"
    assert r["input_sources"] == "https://a/x.zip#from|https://a/y.zip#to"
    assert r["pipeline_name"] == "d2d"
    assert r["selected_groups"] == "Java,Javascript,Elf,Go"
    assert r["run_status"] == "not_started"
    assert r["run_description"] == D2D_DESCRIPTION


def test_blank_elements_dropped_and_clean_pair_kept(spark):
    out = _rows(
        spark,
        [
            (1, ["https://a/x.zip#from", "https://a/y.zip#to"], []),
            (2, ["   ", " https://a/y.zip#to "], []),
        ],
    )
    assert out[1]["input_sources"] == "https://a/x.zip#from|https://a/y.zip#to"
    assert out[2]["input_sources"] == "https://a/y.zip#to"


def test_two_textareas_replays_reference_rebinding(spark):
    """The reference rebinds input_urls to the FIRST textarea's split list
    mid-loop (api.py:551), so a second newline-bearing element contributes
    only the first line of the first textarea — [a, b] with a='x\\ny' and
    b='p\\nq' yields [x, y, x], not [x, y, p, q]."""
    out = _rows(
        spark,
        [
            (
                1,
                ["https://a/x#from\nhttps://a/y#to", "https://a/p\nhttps://a/q"],
                [],
            ),
            # mixed: plain element first, textarea second — the split is
            # still of the FIRST list element (the plain url, no newline ->
            # a 1-element split of itself)
            (2, ["https://a/x#from", "https://a/p\nhttps://a/q"], []),
        ],
    )
    assert out[1]["input_sources"] == "https://a/x#from|https://a/y#to|https://a/x#from"
    assert out[2]["input_sources"] == "https://a/x#from|https://a/x#from"


def test_unreachable_rejects_whole_request(spark):
    """Any unfetchable url rejects the request with the endpoint's literal
    message (api.py:540-543); project/run fields stay NULL."""
    out = _rows(
        spark,
        [(1, ["https://a/x.zip#from", "https://a/y.zip#to"],
          ["https://a/x.zip#from", "https://a/y.zip#to"])],
    )
    r = out[1]
    assert r["status"] == "error"
    assert r["error"] == (
        MSG_COULD_NOT_FETCH + "https://a/x.zip#from\nhttps://a/y.zip#to"
    )
    assert r["project_name"] is None
    assert r["pipeline_name"] is None
    assert r["run_status"] is None
