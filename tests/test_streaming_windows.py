"""Structured Streaming execution tests: watermarked tumbling rollup and the
gzip index / blob sync sources."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F
from pyspark.sql import types as T

from purldb_spark.sources.blob_sync import apply_sync, classify_sync
from purldb_spark.sources.gzip_index import read_gzip_index
from purldb_spark.streaming.windows import streaming_tumbling_rollup


def test_streaming_tumbling_rollup(spark, tmp_path):
    """File-source stream -> watermarked daily windows -> memory sink
    (append mode: only watermark-finalized windows emit; the MAX event time
    seen is 02-03T00:30, watermark 1h => windows ending <= 02-02T23:30
    finalize, i.e. the 02-01 window)."""
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "events")
    rows = [
        ("2024-02-01 10:00:00", "click", 1.0),
        ("2024-02-01 11:00:00", "click", 2.0),
        ("2024-02-01 12:00:00", "view", 3.0),
        ("2024-02-02 09:00:00", "click", 4.0),
        ("2024-02-03 00:30:00", "view", 5.0),
    ]
    df = spark.createDataFrame(rows, ["ts_s", "event_type", "value"]).select(
        F.to_timestamp("ts_s").alias("ts"), "event_type", "value"
    )
    df.write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    rollup = streaming_tumbling_rollup(stream)
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM rollup_sink").collect()
    }
    # finalized: the 02-01 window only (02-02's window end 02-03T00:00 is
    # NOT <= watermark 02-02T23:30)
    assert out == {
        ("2024-02-01 00:00:00", "click"): (2, 3.0),
        ("2024-02-01 00:00:00", "view"): (1, 3.0),
    }


def test_gzip_index_source(spark, tmp_path):
    records = (
        "org.apache|commons-io|2.11.0|356a192b7913b04c54574d18c28d46e6395428ab|1024\n"
        "org.apache|commons-io|2.12.0||2048\n"
        "badline-without-fields\n"
        "com.example|demo|1.0.0|da4b9237bacccdf19c0760cab7aec4a8359010b0|512\n"
    )
    p = tmp_path / "index.gz"
    p.write_bytes(gzip.compress(records.encode()) + b"TRAILING-GARBAGE")
    out = read_gzip_index(spark, str(p)).orderBy("artifact_id", "version").collect()
    assert len(out) == 3  # malformed line skipped
    assert out[0].group_id == "org.apache" and out[0].version == "2.11.0"
    assert out[1].sha1 is None  # empty sha1 -> null
    assert out[2].group_id == "com.example" and out[2].size == 512


def test_blob_sync_classify_and_apply(spark):
    store = spark.createDataFrame(
        [("a.json", "h1", "old-a"), ("b.json", "h2", "old-b"), ("c.json", "h3", "old-c")],
        ["path", "checksum", "payload"],
    )
    fetched = spark.createDataFrame(
        [("a.json", "h1", "refetched-a"),  # unchanged
         ("b.json", "h9", "new-b"),        # changed
         ("d.json", "h4", "new-d")],       # new
        ["path", "checksum", "payload"],
    )
    status = {r.path: r.status for r in classify_sync(store, fetched).collect()}
    assert status == {"a.json": "unchanged", "b.json": "changed", "d.json": "new"}

    after = {r.path: r for r in apply_sync(store, fetched).collect()}
    assert set(after) == {"a.json", "b.json", "c.json", "d.json"}
    assert after["a.json"].payload == "old-a"  # unchanged keeps stored row
    assert after["b.json"].payload == "new-b"
    assert after["c.json"].payload == "old-c"  # untouched key passes through
    assert after["d.json"].payload == "new-d"

    # idempotence: syncing the same batch again is a no-op
    again = apply_sync(apply_sync(store, fetched), fetched)
    assert {(r.path, r.checksum, r.payload) for r in again.collect()} == {
        (r.path, r.checksum, r.payload) for r in apply_sync(store, fetched).collect()
    }
