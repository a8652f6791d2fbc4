"""Unit tests for the training-data assembly operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from purldb_spark.operators.assemble import (
    HASH_SPACE,
    global_shuffle_rank,
    mixture_rates,
    pack_greedy,
    stratified_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("src"),
        ((F.col("id") % 90) + 10).alias("toks"),
    )


def test_stratified_sample_rates_and_determinism(spark):
    d = _docs(spark)
    out = stratified_sample(
        d, "src", "doc_id", {"s0": 1.0, "s1": 0.5}, 0.1, seed=9
    )
    rows = out.groupBy("src").count().collect()
    got = {r["src"]: r["count"] for r in rows}
    assert got["s0"] == 500  # rate 1.0 keeps everything
    assert 175 <= got.get("s1", 0) <= 325  # ~50% of 500
    assert 20 <= got.get("s2", 0) <= 85  # ~10% of 500
    # determinism: re-running yields the identical kept set
    again = stratified_sample(
        d, "src", "doc_id", {"s0": 1.0, "s1": 0.5}, 0.1, seed=9
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # hashes stay inside the 32-bit space
    assert out.agg(F.max("h")).first()[0] < HASH_SPACE


def test_global_shuffle_rank_is_total_permutation(spark):
    d = _docs(spark, 500)
    out = global_shuffle_rank(d, "doc_id", seed=3)
    pos = sorted(r["shuffle_pos"] for r in out.collect())
    assert pos == list(range(500))
    # different seed -> different order (overwhelmingly)
    other = global_shuffle_rank(d, "doc_id", seed=4)
    m1 = {r["doc_id"]: r["shuffle_pos"] for r in out.collect()}
    m2 = {r["doc_id"]: r["shuffle_pos"] for r in other.collect()}
    assert m1 != m2


def test_pack_greedy_respects_budget(spark):
    d = _docs(spark, 1000)
    out = pack_greedy(d, "doc_id", "toks", budget=256, seed=3)
    fills = (
        out.groupBy("shard", "bin_id")
        .agg(F.sum("toks").alias("fill"))
        .collect()
    )
    # every doc is <= 99 tokens, so no bin's STARTING offsets can push the
    # fill past budget + max_doc - 1
    assert all(r["fill"] <= 256 + 99 for r in fills)
    assert out.count() == 1000  # every doc assigned exactly once


def test_stratified_sample_monotone_under_rate_change(spark):
    """Raising one stratum's rate only ADDS rows of that stratum and
    changes nothing else — the property that makes re-mixing a 100 TB
    corpus an incremental operation (hashes are stable, thresholds move)."""
    d = _docs(spark)
    lo = stratified_sample(d, "src", "doc_id", {"s1": 0.3}, 0.5, seed=5)
    hi = stratified_sample(d, "src", "doc_id", {"s1": 0.6}, 0.5, seed=5)
    lo_ids = {r["doc_id"] for r in lo.collect()}
    hi_ids = {r["doc_id"] for r in hi.collect()}
    assert lo_ids <= hi_ids
    added = hi_ids - lo_ids
    srcs = {
        r["src"]
        for r in d.filter(F.col("doc_id").isin([int(x) for x in added]))
        .select("src")
        .distinct()
        .collect()
    }
    assert srcs == {"s1"}


def test_pack_bins_are_contiguous_per_shard(spark):
    d = _docs(spark, 400)
    out = pack_greedy(d, "doc_id", "toks", budget=512, seed=11)
    for shard, bins in (
        out.groupBy("shard")
        .agg(F.collect_set("bin_id").alias("bins"))
        .select("shard", "bins")
        .toPandas()
        .itertuples(index=False)
    ):
        got = sorted(bins)
        assert got == list(range(len(got))), f"shard {shard} gap: {got}"


def test_mixture_rates_math(spark):
    d = _docs(spark)
    out = mixture_rates(
        d, "src", F.col("toks"), {"s0": 0.7, "s1": 0.1}, 0.1
    ).collect()
    by = {r["src"]: r for r in out}
    total = sum(r["n_tokens"] for r in out)
    # s0 is under-represented vs its 0.7 target -> capped at 1.0
    assert by["s0"]["rate"] == 1.0
    # s1 is over-represented vs 0.1 -> downsampled below 1
    expect = 0.1 * total / by["s1"]["n_tokens"]
    assert abs(by["s1"]["rate"] - expect) < 1e-12
    assert by["s1"]["rate"] < 1.0


def test_shuffle_global_offsets_join_is_broadcast(spark):
    """The 16-row shard-offset join must stay a broadcast — a sort-merge
    join here would shuffle the full corpus on the shard key twice."""
    d = _docs(spark, 100)
    plan = global_shuffle_rank(d, "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_write_training_shards_layout(spark, tmp_path):
    import os

    from purldb_spark.catalog.writers import write_training_shards

    d = _docs(spark, 300)
    packed = pack_greedy(d, "doc_id", "toks", budget=256, seed=2)
    out = str(tmp_path / "shards")
    write_training_shards(packed, out, max_records_per_file=200)
    dirs = sorted(x for x in os.listdir(out) if x.startswith("shard="))
    assert dirs  # hive-partitioned by shard
    back = spark.read.parquet(out)
    assert back.count() == 300
    # within every file, bin_id must be non-decreasing (trainer streams
    # bins sequentially)
    import pyarrow.parquet as pq

    for root, _, files in os.walk(out):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(root, f), columns=["bin_id"])
            vals = t.column("bin_id").to_pylist()
            assert vals == sorted(vals)
