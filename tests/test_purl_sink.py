"""S10: streaming purl-list publishing with checkpoint resume."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from purldb_spark.streaming.purl_sink import purl_sink


def test_streaming_purl_export_partitioned(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("purl", T.StringType()), T.StructField("type", T.StringType())]
    )
    src = str(tmp_path / "mined")
    out = str(tmp_path / "published")
    spark.createDataFrame(
        [
            ("pkg:npm/a@1.0.0", "npm"),
            ("pkg:npm/b@2.0.0", "npm"),
            ("pkg:pypi/c@3.0.0", "pypi"),
        ],
        schema,
    ).write.parquet(src)

    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(purl_sink(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    published = spark.read.parquet(out)
    assert {r.type for r in published.select("type").distinct().collect()} == {
        "npm",
        "pypi",
    }
    assert published.count() == 3

    # checkpoint resume: draining again with no new data publishes nothing new
    q2 = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.foreachBatch(purl_sink(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 3
