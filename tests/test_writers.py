"""Catalog writer: uniqueness, partition layout, lookup pushdown on re-read."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from purldb_spark.catalog.writers import write_catalog_table


def test_write_catalog_table_layout_and_uniqueness(spark, tmp_path):
    rows = [
        # duplicate download_url: higher mining level arrives second but the
        # explicit order keeps the richer row
        ("npm", "u1", "a", 1),
        ("npm", "u1", "a-enriched", 5),
        ("npm", "u2", "b", 1),
        ("pypi", "u3", "c", 2),
    ]
    df = spark.createDataFrame(rows, ["type", "download_url", "name", "mining_level"])
    out = str(tmp_path / "packages")
    write_catalog_table(
        df,
        out,
        unique_key=["download_url"],
        order_by=[F.desc("mining_level")],
        partition_by=["type"],
        sort_by=["download_url"],
        bloom_columns=["download_url"],
    )

    # partition directories exist (pruning surface)
    assert sorted(
        d for d in os.listdir(out) if d.startswith("type=")
    ) == ["type=npm", "type=pypi"]

    back = spark.read.parquet(out)
    assert back.count() == 3  # duplicate collapsed
    kept = back.filter(F.col("download_url") == "u1").first()
    assert kept.name == "a-enriched"  # highest mining level won

    # point lookup: partition pruning + pushed filter visible in the plan
    q = back.filter((F.col("type") == "npm") & (F.col("download_url") == "u2"))
    plan = q._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "download_url" in plan
    assert q.count() == 1
