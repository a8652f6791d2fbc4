"""Salting utilities: results must equal the unsalted plans."""

from pyspark.sql import functions as F

from purldb_spark.operators.skew import salt_explode_join, salted_group_count


def test_salted_group_count_equals_plain(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 3).alias("key"), F.col("id").alias("uid")
    )
    # skew: key 0 gets 10x extra rows
    skewed = df.unionByName(
        spark.range(30_000).select(F.lit(0).alias("key"), (F.col("id") + 100_000).alias("uid"))
    )
    salted = {r.key: r.n for r in salted_group_count(skewed, "key", "uid").collect()}
    plain = {
        r.key: r.n
        for r in skewed.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert salted == plain


def test_salt_explode_join_equals_plain(spark):
    big = spark.range(20_000).select(
        (F.col("id") % 5).alias("key"), F.col("id").alias("uid")
    )
    small = spark.createDataFrame(
        [(k, f"dim-{k}") for k in range(5)], ["key", "label"]
    )
    salted = salt_explode_join(big, small, "key", "uid")
    plain = big.join(small, "key")
    assert salted.count() == plain.count() == 20_000
    a = {(r.uid, r.label) for r in salted.collect()}
    b = {(r.uid, r.label) for r in plain.collect()}
    assert a == b
