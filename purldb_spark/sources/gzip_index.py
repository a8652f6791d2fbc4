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
from pyspark.sql import functions as F
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


# ----------------------------------------------------------------------
# Real Maven Nexus index wire format (java-serialized), matching
# minecode/pipes/maven.py:391-528 (get_entries / decode_index_header /
# decode_entry) and the GzipFileWithTrailing trailing-garbage tolerance
# (:365-389).  Same Spark shape as the line-record path above: binaryFile
# rows -> mapPartitions streaming decode, O(record) executor memory.
# ----------------------------------------------------------------------

NEXUS_ENTRY_FIELDS = frozenset("u i 1 m n d".split())

NEXUS_ARTIFACT_SCHEMA = T.StructType(
    [
        T.StructField("group_id", T.StringType()),
        T.StructField("artifact_id", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("packaging", T.StringType()),
        T.StructField("classifier", T.StringType()),
        T.StructField("extension", T.StringType()),
        T.StructField("last_modified", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("src_exist", T.BooleanType()),
        T.StructField("jdoc_exist", T.BooleanType()),
        T.StructField("sig_exist", T.BooleanType()),
    ]
)


def decode_modified_utf8(data: bytes) -> str:
    """Java "modified UTF-8" -> str: NUL is the two-byte C0 80 sequence and
    supplementary chars are CESU-8 surrogate pairs (what the reference gets
    from jawa's decode_modified_utf8).  Decode with surrogatepass, then
    fold surrogate pairs back into real code points via a UTF-16 round
    trip; unpaired surrogates degrade to U+FFFD instead of raising."""
    s = data.replace(b"\xc0\x80", b"\x00").decode("utf-8", "surrogatepass")
    return s.encode("utf-16", "surrogatepass").decode("utf-16", "replace")


class _GunzipReader:
    """Minimal file-like over a gzipped blob: exact-`n` reads of the
    DECOMPRESSED stream, chunked decompression (never materializes the
    payload), concatenated-member support, and trailing garbage after the
    last member silently ignored — the Nexus index quirk
    (maven.py:365-389).  Raises EOFError on short reads, which is the
    entry loop's termination signal, as in java_stream.DataInputStream."""

    def __init__(self, blob: bytes, chunk: int = _CHUNK) -> None:
        self._blob = blob
        self._chunk = chunk
        self._off = 0
        self._d = zlib.decompressobj(wbits=31)
        self._buf = bytearray()

    def _pump(self) -> bool:
        """Decompress one more input chunk into the buffer."""
        if self._d.eof:
            # member finished: a following gzip magic starts a new member;
            # anything else is trailing garbage -> done
            tail = self._d.unused_data
            if tail[:2] == b"\x1f\x8b":
                self._d = zlib.decompressobj(wbits=31)
                self._buf += self._d.decompress(tail)
                return True
            return False
        if self._off >= len(self._blob):
            return False
        piece = self._blob[self._off : self._off + self._chunk]
        self._off += self._chunk
        self._buf += self._d.decompress(piece)
        return True

    def read(self, n: int = 1) -> bytes:
        while len(self._buf) < n:
            if not self._pump():
                raise EOFError
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out


def decode_nexus_entries(
    reader: _GunzipReader, fields: frozenset[str] = NEXUS_ENTRY_FIELDS
) -> Iterator[dict[str, str]]:
    """Decode the java-serialized record stream (maven.py:432-528):
    header = 1 version byte (must be 1) + 8-byte ms timestamp; each entry
    = int32 field count, then per field [1 flag byte][2-byte-len modified-
    UTF-8 name][int32-len modified-UTF-8 value] — the int32 value length is
    the Nexus extension that bypasses Java readUTF's 64K limit."""
    version = _read_int(reader, 1, signed=False)
    if version != 1:
        return  # unsupported index format: nothing decodable
    _timestamp_ms = _read_int(reader, 8)  # noqa: F841 — header, unused
    while True:
        try:
            field_count = _read_int(reader, 4)
        except EOFError:
            return
        entry: dict[str, str] = {}
        try:
            for _ in range(field_count):
                reader.read(1)  # lucene indexing flags: ignored
                name = decode_modified_utf8(reader.read(_read_int(reader, 2, signed=False)))
                value_len = _read_int(reader, 4)
                value = decode_modified_utf8(reader.read(value_len))
                if name in fields:
                    entry[name] = value
        except EOFError:
            return  # truncated trailing entry: drop it, like the reference
        if entry:
            yield entry


def _read_int(reader: _GunzipReader, nbytes: int, signed: bool = True) -> int:
    return int.from_bytes(reader.read(nbytes), "big", signed=signed)


def _java_time_iso(ms: int) -> str:
    """Java ms-epoch -> UTC ISO timestamp string (maven.py:529-537)."""
    from datetime import datetime, timezone

    return datetime.fromtimestamp(ms / 1000, tz=timezone.utc).isoformat()


def build_nexus_artifact(entry: dict[str, str]) -> Row | None:
    """Entry mapping -> artifact row, the expandUinfo/expandAddedArtifact
    semantics of the reference (maven.py:226-327): u = g|a|v|classifier
    [|extension] with NA -> null classifier; i = packaging|lastmod|size|
    srcExists|jdocExists|sigExists[|extension], null/NA packaging dropped,
    non-digit size -> null, extension falling back to packaging for
    pom/war/ear or classified artifacts else 'jar'."""
    NA, NULL, PRESENT = "NA", "null", "1"
    uinfo = entry.get("u")
    if not uinfo:
        return None
    u = uinfo.split("|")
    if len(u) < 4:
        return None
    gid, aid, version, classifier = u[0], u[1], u[2], u[3]
    if classifier == NA:
        classifier = None
    extension = u[4] if len(u) > 4 else None

    packaging = None
    size = None
    last_modified = None
    src_exist = jdoc_exist = sig_exist = False
    info = entry.get("i")
    if info:
        i = info.split("|")
        if len(i) >= 6:
            packaging = None if i[0] in (NA, NULL) else i[0]
            if i[1].isdigit() and i[1] != "0":
                last_modified = _java_time_iso(int(i[1]))
            size = int(i[2]) if i[2].isdigit() else None
            src_exist = i[3] == PRESENT
            jdoc_exist = i[4] == PRESENT
            sig_exist = i[5] == PRESENT
            if len(i) > 6:
                extension = i[6]
            elif classifier or packaging in ("pom", "war", "ear"):
                extension = packaging
            else:
                extension = "jar"
    return Row(
        group_id=gid,
        artifact_id=aid,
        version=version,
        packaging=packaging,
        classifier=classifier,
        extension=extension,
        last_modified=last_modified,
        size=size,
        sha1=entry.get("1"),
        name=entry.get("n"),
        description=entry.get("d"),
        src_exist=src_exist,
        jdoc_exist=jdoc_exist,
        sig_exist=sig_exist,
    )


#: (packaging, classifier, extension) triples worth indexing
#: (is_worthy_artifact, maven.py:45-98); 'archetypes' versions are skipped.
WORTHY_PACK_CLS_EXT = frozenset(
    [
        ("jar", "sources", "jar"),
        ("jar", None, "jar"),
        ("bundle", None, "jar"),
        ("war", None, "war"),
        ("zip", "source-release", "zip"),
        ("maven-plugin", None, "jar"),
        ("aar", None, "aar"),
        ("jar", "sources-commercial", "jar"),
        ("zip", "src", "zip"),
        ("tar.gz", "src", "tar.gz"),
        ("jar", None, "zip"),
        ("zip", "project-src", "zip"),
        ("jar", "src", "jar"),
    ]
)


def is_worthy_artifact(row: Row) -> bool:
    if row.version == "archetypes":
        return False
    return (row.packaging, row.classifier, row.extension) in WORTHY_PACK_CLS_EXT


def decode_nexus_blobs(rows: Iterator[Row], worthy_only: bool = False) -> Iterator[Row]:
    """mapPartitions decoder: (path, content) binaryFile rows -> artifacts."""
    for r in rows:
        reader = _GunzipReader(bytes(r.content))
        for entry in decode_nexus_entries(reader):
            art = build_nexus_artifact(entry)
            if art is not None and (not worthy_only or is_worthy_artifact(art)):
                yield art


def read_nexus_index(
    spark: SparkSession, path: str, worthy_only: bool = False
) -> DataFrame:
    """The real ~600 MB Nexus index ingest: many shard files -> partition-
    parallel streaming decode into NEXUS_ARTIFACT_SCHEMA rows; feed the
    result to sources.miners.map_maven_artifacts for URI/purl mapping."""
    blobs = spark.read.format("binaryFile").load(path).select("path", "content")
    return spark.createDataFrame(
        blobs.rdd.mapPartitions(lambda it: decode_nexus_blobs(it, worthy_only)),
        NEXUS_ARTIFACT_SCHEMA,
    )


def nexus_incremental_chunk_uris(
    props: DataFrame, text_col: str = "text", uri_col: str = "source_uri"
) -> DataFrame:
    """nexus-maven-repository-index.properties -> one URI per incremental
    index chunk (MavenNexusPropertiesVisitor semantics): every
    `nexus.index.incremental-K=N` line names chunk N, fetched as
    nexus-maven-repository-index.N.gz next to the properties file, in
    PROPERTIES-FILE ORDER (the reference iterates the parsed properties
    as-is and its expected fixture pins that order)."""
    chunks = F.regexp_extract_all(
        F.col(text_col),
        F.lit(r"(?m)^nexus\.index\.incremental-\d+=(\d+)\s*$"),
        1,
    )
    base = F.regexp_replace(
        F.col(uri_col), r"nexus-maven-repository-index\.properties$", ""
    )
    return (
        props.select(
            F.col(uri_col).alias("source_uri"),
            base.alias("_base"),
            F.posexplode(F.array_distinct(chunks)).alias("pos", "chunk"),
        )
        .select(
            F.concat(
                F.col("_base"),
                F.lit("nexus-maven-repository-index."),
                F.col("chunk"),
                F.lit(".gz"),
            ).alias("uri"),
            F.col("chunk").cast("int").alias("chunk_no"),
            F.col("pos"),
            "source_uri",
        )
        .orderBy("pos")
        .drop("pos")
    )
