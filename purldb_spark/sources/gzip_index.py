"""S4: large gzipped index source (the ~600 MB Maven Nexus index shape,
minecode/miners/maven.py:144-253).

The reference streams the gzip to a temp file and decodes java-serialized
records one at a time (decoder minecode/pipes/maven.py:391-528, trailing-
garbage-tolerant GzipFileWithTrailing :365-389). Spark-first shape:

    spark.read.format("binaryFile")  ->  one row per index file
    .mapPartitions(decode)           ->  streaming gunzip + record parse,
                                         yielding artifact rows

The decode generator never materializes the decompressed payload: it wraps
the blob in a streaming GzipFile and yields record-by-record, so executor
memory is O(record), not O(index). The record format here is a
newline-delimited `group|artifact|version|sha1|size` stand-in — the real
java-deserializer drops into `_parse_record` without touching the Spark
plumbing (same contract as the reference's decoder swap).

At 100 TB-ish scale: many index shards -> many binaryFile rows -> partition-
parallel decode; a single giant shard is the degenerate case (one task), in
which case pre-splitting the file (or range-reading) is the operational fix
— same answer the reference's temp-file streaming gives.
"""

from __future__ import annotations

import codecs
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("group_id", T.StringType()),
        T.StructField("artifact_id", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("size", T.LongType()),
    ]
)


_CHUNK = 1 << 20


def _gunzip_lines(blob: bytes) -> Iterator[str]:
    """Chunked streaming gunzip -> text lines, tolerating trailing garbage
    after the gzip member — the Nexus index quirk the reference works around
    (maven.py:365-389). Decompression stops at the member's EOF marker;
    whatever follows is ignored. Peak memory is one chunk + one line, never
    the decompressed payload."""
    d = zlib.decompressobj(wbits=31)  # 31 = gzip container
    # incremental decoder: a multi-byte UTF-8 char split across the 1 MB
    # chunk boundary is carried over, not corrupted into U+FFFD
    dec = codecs.getincrementaldecoder("utf-8")("replace")
    buf = ""
    for off in range(0, len(blob), _CHUNK):
        out = d.decompress(blob[off : off + _CHUNK])
        buf += dec.decode(out)
        while "\n" in buf:
            line, buf = buf.split("\n", 1)
            yield line
        if d.eof:
            break
    buf += dec.decode(b"", final=True)
    if buf:
        yield buf


def _parse_record(line: str) -> Row | None:
    parts = line.split("|")
    if len(parts) != 5 or not parts[0]:
        return None  # malformed record -> skipped, like the reference decoder
    try:
        size = int(parts[4])
    except ValueError:
        return None
    return Row(
        group_id=parts[0],
        artifact_id=parts[1],
        version=parts[2],
        sha1=parts[3] or None,
        size=size,
    )


def decode_index_blobs(rows: Iterator[Row]) -> Iterator[Row]:
    """mapPartitions decoder: (path, content) binaryFile rows -> records."""
    for r in rows:
        for line in _gunzip_lines(bytes(r.content)):
            rec = _parse_record(line)
            if rec is not None:
                yield rec


def read_gzip_index(spark: SparkSession, path: str) -> DataFrame:
    blobs = spark.read.format("binaryFile").load(path).select("path", "content")
    return spark.createDataFrame(
        blobs.rdd.mapPartitions(decode_index_blobs), RECORD_SCHEMA
    )
