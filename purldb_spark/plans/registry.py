"""Query registry: every operator from SURVEY.md §2 that we claim as done
registers here as (name -> DataFrame builder) plus, where the semantics are
SQL-expressible, a DuckDB oracle SQL string over the same parquet views.

The driver (and tests/test_oracle.py) runs both sides and compares
row-count + schema + order-insensitive value hash, so builders must be
deterministic: every window/sort carries a total-order tie-break, and
floating-point aggregates go through exact decimal arithmetic before a final
cast to double (identical bit patterns on both engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query builder and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_inventory() -> None:
    """Import every plan module so its @query decorators run."""
    from purldb_spark.plans import (  # noqa: F401
        q_aggs,
        q_analytics,
        q_bonus,
        q_clearindex,
        q_cluster,
        q_kmeans_stream,
        q_collect,
        q_d2d,
        q_update,
        # never-driver-checked queries register oldest-first: the bounded
        # check window fills front-to-back among unverified queries, so
        # q_streaming's batch faces and the miners3/4 batches (registered
        # in earlier rounds) outrank this round's additions
        q_streaming,
        q_miners3,
        q_miners4,
        q_collectors,
        q_filters,
        q_halohash,
        q_joins,
        q_licenses,
        q_dedup,
        q_embed,
        q_knn,
        q_text,
        q_match,
        q_merge,
        q_miners,
        q_miners2,
        q_miners5,
        q_miners6,
        q_miners7,
        q_miners8,
        q_miners9,
        q_miners10,
        q_collectors2,
        q_collectors3,
        q_seqmatch,
        q_llm2,
        q_matchpost,
        q_purlstore,
        q_validate,
        q_llm3,
        q_llm4,
        q_llm5,
        q_multimodal,
        q_overlay,
        q_scans,
        q_select,
        q_bpe,
        q_bloom,
        q_sketch,
        q_kmv,
        q_split,
        q_layout,
        q_sample,
        q_chunk,
        q_cc_plan,
        q_classifier,
        q_agreement,
        q_nb,
        q_nb_wide,
        q_prefix,
        q_plan_choice,
        q_compact_plan,
        q_dedup_plan,
        q_ivf_plan,
        q_minhash_plan,
        q_simhash_plan,
        q_snippet,
        q_container,
        q_audio,
        q_image,
        q_vcs,
        q_version_apis,
        q_versions,
        q_windows,
    )
