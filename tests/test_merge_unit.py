"""merge_upsert edge cases — modeled on the reference's
minecode/tests/test_model_utils.py merge semantics (fill vs replace vs
checksum conflict, SURVEY §7 hard-part d)."""

from __future__ import annotations

from pyspark.sql import types as T

from purldb_spark.operators.merge import MergeSpec, Policy, merge_upsert

SPEC = MergeSpec(
    key="k",
    fields={
        "a": Policy.FILL_IF_NULL,
        "b": Policy.REPLACE,
        "h": Policy.CHECKSUM,
        "c": Policy.KEEP,
    },
    level_col="lvl",
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("a", T.StringType()),
        T.StructField("b", T.StringType()),
        T.StructField("h", T.StringType()),
        T.StructField("c", T.StringType()),
        T.StructField("lvl", T.IntegerType()),
    ]
)


def _merge(spark, existing, incoming):
    ex = spark.createDataFrame(existing, SCHEMA)
    inc = spark.createDataFrame(incoming, SCHEMA)
    merged, conflicts = merge_upsert(ex, inc, SPEC)
    return (
        {r.k: (r.a, r.b, r.h, r.c) for r in merged.collect()},
        {r.k for r in conflicts.collect()},
    )


def test_insert_only_key(spark):
    m, c = _merge(
        spark,
        [("x", "a0", "b0", "h0", "c0", 5)],
        [("new", "a1", "b1", "h1", "c1", 1)],
    )
    assert m["new"] == ("a1", "b1", "h1", "c1")  # pure insert takes all fields
    assert m["x"] == ("a0", "b0", "h0", "c0")  # untouched existing passes through
    assert not c


def test_fill_if_null_only_fills_empties(spark):
    m, _ = _merge(
        spark,
        [("x", None, "b0", "h0", "c0", 5), ("y", "", "b0", "h0", "c0", 5),
         ("z", "kept", "b0", "h0", "c0", 5)],
        [("x", "filled", None, None, "cX", 9), ("y", "filled", None, None, "cX", 9),
         ("z", "ignored", None, None, "cX", 9)],
    )
    assert m["x"][0] == "filled"  # null -> filled
    assert m["y"][0] == "filled"  # empty string counts as null (reference)
    assert m["z"][0] == "kept"  # non-empty never overwritten by FILL


def test_replace_gated_by_mining_level(spark):
    m, _ = _merge(
        spark,
        [("lo", "a", "old", "h", "c", 5), ("hi", "a", "old", "h", "c", 5)],
        [("lo", None, "new", None, "c", 3), ("hi", None, "new", None, "c", 7)],
    )
    assert m["lo"][1] == "old"  # lower incoming level: no replace
    assert m["hi"][1] == "new"  # higher level wins (model_utils.py:280-319)


def test_checksum_conflict_dead_letters_row(spark):
    m, c = _merge(
        spark,
        [("ok", "a", "b", None, "c", 5), ("bad", "a", "b", "hash1", "c", 5)],
        [("ok", None, None, "hset", "c", 5), ("bad", None, None, "hash2", "c", 5)],
    )
    assert m["ok"][2] == "hset"  # null checksum filled
    assert "bad" not in m  # conflicting row excluded from merge
    assert c == {"bad"}  # ...and routed to the conflict frame


def test_keep_policy_never_merges(spark):
    m, _ = _merge(
        spark,
        [("x", "a", "b", "h", "orig", 5)],
        [("x", None, None, None, "evil", 9)],
    )
    assert m["x"][3] == "orig"