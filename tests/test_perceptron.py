"""Batch perceptron trainer (operators/perceptron.py): convergence on
separable data, order independence, and the integer-exactness contract
the classifier_train oracle relies on (full cross-engine verification
lives in the 210-query oracle sweep)."""

from __future__ import annotations

from purldb_spark.operators.perceptron import features, perceptron_fit


def test_converges_on_separable_data(spark):
    # y = +1 iff x0 > x1: linearly separable; the batch perceptron must
    # reach 0 mistakes and then stop changing (zero update)
    rows = [
        (1, 5, 1, 1, 1),
        (2, 7, 2, 1, 1),
        (3, 1, 6, 1, -1),
        (4, 0, 9, 1, -1),
        (5, 8, 0, 1, 1),
        (6, 2, 7, 1, -1),
    ]
    df = spark.createDataFrame(
        rows, "id long, x0 long, x1 long, xb long, y long"
    )
    hist = perceptron_fit(df, "y", 2, 8)
    assert hist[-1]["n_mis"] == 0
    zero = next(h for h in hist if h["n_mis"] == 0)
    later = [h for h in hist if h["epoch"] > zero["epoch"]]
    assert all(h["w"] == zero["w"] and h["n_mis"] == 0 for h in later)
    # the learned separator weights x0 up and x1 down
    w = hist[-1]["w"]
    assert w[0] > 0 > w[1]


def test_batch_updates_are_row_order_independent(spark):
    rows = [(i, i % 3, (i * 7) % 5, 1, 1 if i % 2 else -1) for i in range(40)]
    df = spark.createDataFrame(
        rows, "id long, x0 long, x1 long, xb long, y long"
    )
    fwd = perceptron_fit(df, "y", 2, 3)
    rev = perceptron_fit(df.orderBy(df.id.desc()).repartition(7), "y", 2, 3)
    assert fwd == rev


def test_features_are_integer_bucket_counts(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in features(df, "doc_id", "text", 4).collect()}
    assert got[1].xb == 1
    assert sum(got[1][f"x{i}"] for i in range(4)) == 3  # 3 tokens bucketed
    # empty text splits to one empty token; it lands in exactly one bucket
    assert sum(got[2][f"x{i}"] for i in range(4)) == 1


def test_trained_gate_scores_match_training_margins(spark):
    """Artifact consumption: score_expr under the trained weights must
    reproduce the exact integer dot products training computed — the
    map-only gate IS the model. Pinned by recomputing every document's
    margin from the feature frame and comparing."""
    from pyspark.sql import functions as F

    from purldb_spark.operators.perceptron import score_expr

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha alpha alpha"),
        (3, "zeta eta theta iota kappa"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    feats = features(docs, "doc_id", "text", 4).join(
        docs.select("doc_id", F.lit(1).alias("y")), "doc_id"
    )
    hist = perceptron_fit(feats.withColumn("y", F.lit(1)), "y", 4, 2)
    w = hist[-1]["w"]

    scored = docs.select(
        "doc_id", F.expr(score_expr("text", w, 4)).alias("s")
    )
    got = {r.doc_id: r.s for r in scored.collect()}
    # recompute expected scores from the feature frame directly
    fr = {r.doc_id: r for r in features(docs, "doc_id", "text", 4).collect()}
    for did, f in fr.items():
        exp = sum(w[i] * f[f"x{i}"] for i in range(4)) + w[4]
        assert got[did] == exp, (did, got[did], exp)


def test_averaged_weights_stabilize_on_nonseparable_data(spark):
    """On non-separable data the raw batch perceptron cycles (the
    classifier_train curve shows it); the AVERAGED weights' decision
    must stabilize: the sign of w_sum . x for a probe point stops
    flipping once cycling sets in, while raw w keeps oscillating."""
    # XOR-ish: not linearly separable in (x0, x1)
    rows = [
        (1, 0, 0, 1, -1),
        (2, 1, 0, 1, 1),
        (3, 0, 1, 1, 1),
        (4, 1, 1, 1, -1),
    ] * 3
    df = spark.createDataFrame(
        [(i,) + r[1:] for i, r in enumerate(rows)],
        "id long, x0 long, x1 long, xb long, y long",
    )
    hist = perceptron_fit(df, "y", 2, 10)
    assert all(h["n_mis"] > 0 for h in hist)  # genuinely non-separable
    # raw weights cycle: some epoch repeats an earlier weight vector
    raw = [tuple(h["w"]) for h in hist]
    assert len(set(raw)) < len(raw)
    # averaged decision on a probe point (1, 0) stabilizes over the
    # last epochs even while raw w keeps moving
    def decide(wv):
        return 1 if wv[0] * 1 + wv[1] * 0 + wv[2] >= 0 else -1

    tail = [decide(h["w_sum"]) for h in hist[5:]]
    assert len(set(tail)) == 1
