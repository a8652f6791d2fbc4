"""Multimodal columns: image/audio/video as opaque BINARY columns with typed
metadata, processed via Arrow-batched Pandas UDFs (mapInPandas).

The container has no image/audio codecs, so the DECODE step is stubbed
behind `decode_media` (NotImplementedError for real codecs, a deterministic
fake for 'fake/*' media types). Everything around it — schema, batch
iteration, UDF signatures, partition sizing — is the real Spark plumbing a
codec drop-in would inherit unchanged.

Scale notes: binary payloads ride Arrow buffers between JVM and Python, so
`spark.sql.execution.arrow.maxRecordsPerBatch` (and for 100 MB+ blobs,
per-batch byte budgeting inside the generator) bounds Python memory; payload
columns should be pruned before any join (carry (id, meta), join, then
re-attach content) so blobs never shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def decode_media(media_type: str, content: bytes) -> tuple[int, int]:
    """STUB decoder. Real codecs (PIL/ffmpeg) are not in this container;
    'fake/*' types decode deterministically from the byte length so the
    pipeline is testable end-to-end."""
    if media_type.startswith("fake/"):
        n = len(content)
        return (n % 640 + 1, n % 480 + 1)
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment — plug PIL/ffmpeg "
        "into decode_media; the Spark plumbing is codec-agnostic"
    )


def extract_meta(df: DataFrame) -> DataFrame:
    """mapInPandas pass: (media_id, media_type, content) -> typed metadata.
    One Arrow batch at a time; the content column never leaves the worker."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h = [], []
            for mt, c in zip(pdf["media_type"], pdf["content"]):
                try:
                    dims = decode_media(mt, bytes(c))
                except NotImplementedError:
                    dims = (-1, -1)
                w.append(dims[0])
                h.append(dims[1])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                    "content_hash": [
                        hashlib.md5(bytes(c)).hexdigest() for c in pdf["content"]
                    ],
                    "width": pd.array(w, dtype="int32"),
                    "height": pd.array(h, dtype="int32"),
                }
            )

    return df.mapInPandas(run, schema=META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling plumbing: 1 binary row -> n_frames chunk rows (what a
    video decoder would emit). mapInPandas so a single input batch can yield
    a larger output batch without a JVM-side explode of the blob."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                b = bytes(c)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


EMBED_DIM = 16

EMBED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def embed_media(df: DataFrame) -> DataFrame:
    """Feature-extraction plumbing: binary -> fixed-dim float vector
    (deterministic hash-derived fake; a real encoder is a drop-in). Output
    feeds the knn operators directly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for c in pdf["content"]:
                d = hashlib.md5(bytes(c)).digest()
                vecs.append([b / 255.0 for b in d[:EMBED_DIM]])
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})

    return df.mapInPandas(run, schema=EMBED_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: binary in -> fixed-(width, height) binary out.
    The pixel resample itself is the codec boundary (no image libs in this
    container — a real `PIL.Image.resize` is a drop-in inside the loop);
    the deterministic stand-in cycles the source bytes to exactly
    width*height bytes so downstream schema/batch behavior is real and
    testable. Blobs stay inside their Arrow batch — no shuffle, no JVM
    copy of the payload beyond the mapInPandas exchange."""
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for c in pdf["content"]:
                b = bytes(c)
                if not b:
                    outs.append(bytes(target))
                else:
                    reps = (target // len(b)) + 1
                    outs.append((b * reps)[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array([width] * len(pdf), dtype="int32"),
                    "height": pd.array([height] * len(pdf), dtype="int32"),
                    "content": outs,
                    "n_bytes": pd.array([target] * len(pdf), dtype="int64"),
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)
