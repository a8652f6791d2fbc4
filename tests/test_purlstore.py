"""Hash parity + shard balance for the scan-storage sharding
(functions/purlstore.py vs clearcode/store_scans.py:164-175)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from purldb_spark.functions.purlstore import purl_hash, purl_path


def _ref_hash(purl: str, length: int = 3) -> str:
    # the reference's get_purl_hash: sha512 hex, first `length` chars, lower
    return hashlib.sha512(purl.encode("utf-8")).hexdigest()[:length].lower()


def test_purl_hash_matches_hashlib(spark):
    purls = [
        "pkg:npm/lodash@4.17.21",
        "pkg:maven/org.apache/commons-io@2.11.0",
        "pkg:pypi/requests@2.31.0",
        "pkg:gem/rails@7.0.0",
    ]
    df = spark.createDataFrame([(p,) for p in purls], "purl string").select(
        "purl", purl_hash(F.col("purl")).alias("h")
    )
    for row in df.collect():
        assert row.h == _ref_hash(row.purl)


def test_purl_hash_shard_balance(spark):
    # 2000 distinct purls over 16^3 = 4096 shards: no shard should
    # collect more than a tiny multiple of the mean (uniformity is what
    # makes the hash a usable partition key at 100 TB)
    purls = spark.range(2000).select(
        F.concat(F.lit("pkg:npm/pkg-"), F.col("id"), F.lit("@1.0")).alias("purl")
    )
    counts = (
        purls.select(purl_hash(F.col("purl")).alias("shard"))
        .groupBy("shard")
        .count()
    )
    assert counts.agg(F.max("count")).collect()[0][0] <= 6


def test_purl_path_namespace_optional(spark):
    df = spark.createDataFrame(
        [("npm", None, "lodash", "4.17.21"), ("maven", "org.ex", "io", "1.0")],
        "t string, ns string, n string, v string",
    ).select(
        purl_path(F.col("t"), F.col("ns"), F.col("n"), F.col("v")).alias("p")
    )
    assert [r.p for r in df.collect()] == [
        "npm/lodash/4.17.21",
        "maven/org.ex/io/1.0",
    ]
