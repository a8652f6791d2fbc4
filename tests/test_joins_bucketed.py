"""Plan-shape and parity tests for the storage-bucketed co-located join
(j1_fk_join_bucketed): the bucketed SortMergeJoin must run with ZERO
Exchange, and its rows must equal the plain j1_fk_join."""

from __future__ import annotations

import contextlib
import io

from purldb_spark.plans.registry import QUERIES, load_inventory
from tests.conftest import SF_SMOKE

load_inventory()


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    plan = _plan(QUERIES["j1_fk_join_bucketed"](spark, SF_SMOKE))
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan


def test_plain_join_shuffles_under_merge_hint(spark):
    # the control: the SAME join over plain parquet with the same merge
    # hint needs an Exchange on both sides — what bucketing eliminates
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").filter(
        F.col("l_quantity") >= 49.5
    )
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    plan = _plan(li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey))
    assert plan.count("Exchange") >= 2


def test_bucketed_join_matches_plain(spark):
    a = sorted(
        map(repr, QUERIES["j1_fk_join_bucketed"](spark, SF_SMOKE).collect())
    )
    b = sorted(map(repr, QUERIES["j1_fk_join"](spark, SF_SMOKE).collect()))
    assert a == b and len(a) > 0
