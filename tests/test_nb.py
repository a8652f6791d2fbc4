"""Naive Bayes trainer (operators/nb.py, the fifth trainer family):
sufficient statistics against hand counting, the dense-grid zero
contract, and the float scoring gate's argmax pinned to an independent
pure-Python NB over the same hashed buckets."""

from __future__ import annotations

import hashlib
import math

from purldb_spark.operators.nb import nb_argmax_expr, nb_score_expr, nb_train


def _bucket(w: str, n: int) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % n


def _py_nb_score(text: str, stats: list[dict], n: int, label: int) -> float:
    rows = {r["bucket"]: r for r in stats if r["label"] == label}
    any_row = next(r for r in stats if r["label"] == label)
    n_c = max(int(any_row["class_docs"]), 1)
    t_c = int(any_row["class_tokens"])
    s = math.log(n_c)
    for w in text.split(" "):
        b = _bucket(w, n)
        t_cb = int(rows[b]["token_cnt"]) if b in rows else 0
        s += math.log((t_cb + 1) / (t_c + n))
    return s


_DOCS = [
    (0, "good clean prose with useful words", 1),
    (1, "good article nice words more words", 1),
    (2, "spam spam buy now buy spam", 0),
    (3, "buy spam now now now", 0),
    (4, "clean useful article", 1),
]


def test_nb_train_counts_exactly(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string, y long")
    stats = [r.asDict() for r in nb_train(spark, df, "y", "text", 4).collect()]
    assert len(stats) == 8  # dense 2 classes x 4 buckets
    # hand counts
    exp: dict[tuple[int, int], int] = {}
    cd = {0: 0, 1: 0}
    ct = {0: 0, 1: 0}
    for _i, text, y in _DOCS:
        cd[y] += 1
        for w in text.split(" "):
            exp[(y, _bucket(w, 4))] = exp.get((y, _bucket(w, 4)), 0) + 1
            ct[y] += 1
    for r in stats:
        assert r["token_cnt"] == exp.get((r["label"], r["bucket"]), 0)
        assert r["class_docs"] == cd[r["label"]]
        assert r["class_tokens"] == ct[r["label"]]


def test_nb_dense_grid_reports_missing_class_as_zero(spark):
    df = spark.createDataFrame(
        [(0, "only one class here", 1)], "doc_id long, text string, y long"
    )
    stats = {
        (r.label, r.bucket): r
        for r in nb_train(spark, df, "y", "text", 4).collect()
    }
    assert len(stats) == 8
    assert all(stats[(0, b)].token_cnt == 0 for b in range(4))
    assert all(stats[(0, b)].class_docs == 0 for b in range(4))


def test_nb_gate_argmax_matches_pure_python(spark):
    """The trained gate (float log-space, apply-time only) classifies
    exactly as an independent pure-Python NB — on training docs and on
    unseen ones (including unseen-bucket smoothing)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(_DOCS, "doc_id long, text string, y long")
    # 16 buckets: enough to keep the toy corpus's spam/quality tokens
    # from colliding (at 4 every probe collapses to the bigger class)
    stats = [r.asDict() for r in nb_train(spark, df, "y", "text", 16).collect()]

    probe = _DOCS + [
        (10, "spam spam spam", None),
        (11, "useful clean words", None),
        (12, "zzz completely novel tokens qqq", None),
    ]
    pdf = spark.createDataFrame(
        [(i, t) for i, t, *_ in probe], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.pred, r.s0, r.s1)
        for r in pdf.select(
            "doc_id",
            F.expr(nb_argmax_expr("text", stats, 16)).alias("pred"),
            F.expr(nb_score_expr("text", stats, 16, 0)).alias("s0"),
            F.expr(nb_score_expr("text", stats, 16, 1)).alias("s1"),
        ).collect()
    }
    for i, text, *_ in probe:
        e0 = _py_nb_score(text, stats, 16, 0)
        e1 = _py_nb_score(text, stats, 16, 1)
        pred, s0, s1 = got[i]
        assert abs(s0 - e0) < 1e-9 and abs(s1 - e1) < 1e-9
        assert pred == (1 if e1 > e0 else 0)
    # sanity: the model separates the toy corpus
    assert got[10][0] == 0 and got[11][0] == 1


def _py_nb_e6_pred(text: str, stats: list[dict], n: int) -> int:
    """Independent pure-Python replay of the e6 fixed-point argmax."""
    by = {(r["label"], r["bucket"]): r for r in stats}
    score = {}
    for label in (0, 1):
        t_c = int(by[(label, 0)]["class_tokens"])
        n_c = max(int(by[(label, 0)]["class_docs"]), 1)
        s = math.floor(math.log(n_c) * 1e6 + 0.5)
        for w in text.split(" "):
            b = _bucket(w, n)
            t_cb = int(by[(label, b)]["token_cnt"])
            s += math.floor(math.log((t_cb + 1) / (t_c + n)) * 1e6 + 0.5)
        score[label] = s
    return 1 if score[1] > score[0] else 0


def test_nb_e6_fixed_point_argmax_matches_pure_python(spark):
    """The cross-engine-exact e6 gate (integer log-prob table,
    nb_argmax_e6_expr) classifies exactly as an independent pure-Python
    replay of the same fixed-point rule, on training docs and unseen
    probes — and (here, away from quantization boundaries) agrees with
    the float gate too."""
    from pyspark.sql import functions as F

    from purldb_spark.operators.nb import nb_argmax_e6_expr

    df = spark.createDataFrame(_DOCS, "doc_id long, text string, y long")
    stats = [
        r.asDict() for r in nb_train(spark, df, "y", "text", 16).collect()
    ]
    probes = [t for _i, t, _y in _DOCS] + [
        "buy buy spam spam now",
        "useful clean words article prose",
        "never seen tokens entirely",
        "",
    ]
    pdf = (
        spark.createDataFrame([(t,) for t in probes], "text string")
        .select(
            "text",
            F.expr(nb_argmax_e6_expr("text", stats, 16)).alias("pred_e6"),
            F.expr(nb_argmax_expr("text", stats, 16)).alias("pred_f"),
        )
        .collect()
    )
    for r in pdf:
        assert r.pred_e6 == _py_nb_e6_pred(r.text, stats, 16), r.text
        assert r.pred_e6 == r.pred_f, r.text
