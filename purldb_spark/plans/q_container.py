"""Media-container queries: REAL MP4/MP3 container walks through the
full Arrow pipeline, oracle-checked end to end (the mm_png/mm_jpeg
recipe one layer further out).

Per document a syntactically complete container is ENCODED with every
parameter derived from doc_id — frame counts, per-frame sizes and fill
bytes, chunk grouping, sync cadence, 32/64-bit offset and version-0/1
header variants, ID3/junk/Xing presence — then PARSED back by the
pure-stdlib walkers (multimodal/mp4.py, mp3.py via the containers.py
Arrow faces). The oracle predicts every output cell arithmetically from
doc_id, so a box-offset bug, a chunk-run expansion bug, a sync-table
slip, or a frame-length table error each breaks the hash match.

Scale shape: all three queries are MAP-ONLY — encode, parse, and
extract happen inside one mapInPandas pass per partition; no shuffle,
no join, blobs never leave the worker (only integer stats do). At
100 TB that is the right plan by construction: the scan parallelizes
on parquet splits and the pipeline is embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from purldb_spark.catalog.tables import load
from purldb_spark.conf import spread_small_input
from purldb_spark.plans.registry import query

_KBPS = (32, 48, 64, 96, 128, 160, 192, 224)
_SR = (44100, 48000, 32000)

_KBPS_SQL = """CASE doc_id % 8
  WHEN 0 THEN 32 WHEN 1 THEN 48 WHEN 2 THEN 64 WHEN 3 THEN 96
  WHEN 4 THEN 128 WHEN 5 THEN 160 WHEN 6 THEN 192 ELSE 224 END"""
_SR_SQL = """CASE doc_id % 3
  WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END"""


def _mp4_enc(batches):
    """Per document, a complete MP4: n = doc%24+2 frames of ramp bytes
    (byte j of frame k = (doc + 37k + j) % 256, size (doc + 11k) % 64
    + 8), delta doc%40+10 ms at timescale 1000, doc%3+1 samples per
    chunk, sync every doc%4+1 (cadence 1 exercises the omitted-stss
    branch), co64 when doc%7=0, version-1 headers when doc%5=0.
    A fuse() stage (r16): every consumer chains its container walk onto
    this encode inside ONE mapInPandas pass, so the blob never crosses
    the Arrow boundary."""
    import pandas as pd

    from purldb_spark.multimodal.mp4 import encode_mp4

    for pdf in batches:
        outs = []
        for i in pdf["doc_id"]:
            i = int(i)
            n = i % 24 + 2
            payloads = [
                bytes(
                    ((i + 37 * k + j) % 256)
                    for j in range((i + 11 * k) % 64 + 8)
                )
                for k in range(n)
            ]
            outs.append(
                encode_mp4(
                    16 * (i % 20 + 1),
                    16 * (i % 12 + 1),
                    payloads,
                    delta=i % 40 + 10,
                    sync_every=i % 4 + 1,
                    samples_per_chunk=i % 3 + 1,
                    use_co64=(i % 7 == 0),
                    v1=(i % 5 == 0),
                )
            )
        yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})


def _mp4_fused(spark: SparkSession, sf_dir: str, stats_batches, schema):
    """documents -> _mp4_enc -> stats_batches in one fused Arrow pass."""
    from purldb_spark.multimodal.binaryops import fuse

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(fuse(_mp4_enc, stats_batches), schema=schema)
    )


@query(
    "mm_mp4_meta",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 24 + 2 AS n, doc_id % 40 + 10 AS delta,
             doc_id % 3 + 1 AS spc, doc_id % 4 + 1 AS g
      FROM documents
    ),
    sb AS (
      SELECT p.doc_id,
             CAST(sum((p.doc_id + 11 * t.k) % 64 + 8) AS BIGINT)
               AS sample_bytes
      FROM p, unnest(generate_series(0, p.n - 1)) AS t(k)
      GROUP BY p.doc_id
    )
    SELECT p.doc_id AS media_id,
           'isom' AS brand, 'mp4v' AS codec,
           CAST(16 * (p.doc_id % 20 + 1) AS INTEGER) AS width,
           CAST(16 * (p.doc_id % 12 + 1) AS INTEGER) AS height,
           CAST(p.n AS BIGINT) AS n_samples,
           CAST((p.n + p.spc - 1) // p.spc AS BIGINT) AS n_chunks,
           CAST((p.n - 1) // p.g + 1 AS BIGINT) AS n_sync,
           CAST(p.n * p.delta AS BIGINT) AS duration_ms,
           sb.sample_bytes
    FROM p JOIN sb ON sb.doc_id = p.doc_id
    """,
)
def mm_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 container metadata through the full Arrow pipeline: per
    document a complete ISO-BMFF file (frame payloads, chunk offsets,
    sample tables all real) is parsed back by the pure-stdlib box walk;
    brand, codec, dims (16.16 fixed-point tkhd), resolved sample/chunk/
    sync counts, mvhd duration and total payload volume are all
    oracle-predicted arithmetically from doc_id. The co64 / version-1 /
    omitted-stss variants rotate by doc_id, so every parse branch is
    hash-checked across the corpus, not just unit-tested."""
    from purldb_spark.multimodal.containers import (
        MP4_META_SCHEMA,
        mp4_meta_batches,
    )

    return _mp4_fused(spark, sf_dir, mp4_meta_batches, MP4_META_SCHEMA)


@query(
    "mm_mp4_frame_sample",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 24 + 2 AS n, doc_id % 40 + 10 AS delta,
             doc_id % 4 + 1 AS g
      FROM documents
    ),
    f AS (
      SELECT p.doc_id, t.m * p.g AS k, p.delta
      FROM p, unnest(generate_series(0, (p.n - 1) // p.g)) AS t(m)
    ),
    s AS (
      SELECT doc_id, k, delta,
             (doc_id + 37 * k) % 256 AS a,
             (doc_id + 11 * k) % 64 + 8 AS sz
      FROM f
    )
    SELECT doc_id AS media_id,
           CAST(k + 1 AS BIGINT) AS sample_no,
           CAST(k * delta AS BIGINT) AS ts_ms,
           CAST(sz AS BIGINT) AS n_bytes,
           CAST(sz * a + sz * (sz - 1) // 2
                - 256 * greatest(0, a + sz - 256) AS BIGINT) AS byte_sum
    FROM s
    """,
)
def mm_mp4_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame-sampling end to end: the sync samples named by
    stss are EXTRACTED from mdat via the resolved stsc/stco/stsz tables
    — one row per keyframe with its 1-based sample number, stts decode
    timestamp in ms, and the extracted payload's length and byte sum.
    Frame k's payload is the mod-256 ramp starting at (doc + 37k), so
    the oracle predicts the byte sum in closed form (ramp sum minus one
    wrap correction — sizes < 256 wrap at most once); an extraction
    that is off by ONE byte, or that reads the neighboring frame,
    breaks both sum and size. Map-only: blobs never leave the worker,
    only (id, frame stats) rows do — at 100 TB the keyframe index build
    over a video corpus is a single scan."""
    from purldb_spark.multimodal.containers import (
        MP4_FRAME_SCHEMA,
        mp4_sync_frames_batches,
    )

    return _mp4_fused(
        spark, sf_dir, mp4_sync_frames_batches, MP4_FRAME_SCHEMA
    )


@query(
    "mm_mp3_meta",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             {_KBPS_SQL} AS kbps,
             {_SR_SQL} AS sr,
             doc_id % 30 + 3 AS n,
             CASE WHEN doc_id % 4 = 0 THEN 0
                  ELSE 11 + doc_id % 100 END AS id3_bytes,
             CASE WHEN doc_id % 5 = 1 THEN doc_id % 7 + 1
                  ELSE 0 END AS junk_bytes,
             doc_id % 6 = 0 AS vbr
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(sr AS INTEGER) AS sample_rate,
           CAST(kbps AS INTEGER) AS bitrate_kbps,
           CAST(n AS BIGINT) AS n_frames,
           CAST(CASE WHEN vbr THEN n - 1 ELSE n END AS BIGINT)
             AS audio_frames,
           vbr AS is_vbr,
           CAST((CASE WHEN vbr THEN n - 1 ELSE n END) * 1152 * 1000 // sr
                AS BIGINT) AS duration_ms,
           CAST(id3_bytes AS BIGINT) AS id3_bytes,
           CAST(junk_bytes AS BIGINT) AS junk_bytes,
           CAST(n * (144000 * kbps // sr) AS BIGINT) AS stream_bytes
    FROM p
    """,
)
def mm_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL mp3 frame-layer metadata through the full Arrow pipeline:
    per document a complete CBR mono MPEG-1 Layer III stream — bitrate
    and sample rate rotating through the real header tables, an ID3v2
    tag (syncsafe size, absent when doc%4=0), zero-junk before the
    first sync when doc%5=1 (drives the bounded resync scan), a Xing
    block claiming n-1 audio frames when doc%6=0 — walked back frame by
    frame. Frame count, Xing-aware audio frames and duration, tag/junk/
    stream byte accounting are all oracle-predicted from doc_id; a
    frame-length table error of one byte desynchronizes the walk and
    zeroes the match. Map-only, same 100 TB shape as mm_mp4_meta."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import fuse
    from purldb_spark.multimodal.containers import (
        MP3_META_SCHEMA,
        mp3_meta_batches,
    )
    from purldb_spark.multimodal.mp3 import encode_mp3

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                n = i % 30 + 3
                outs.append(
                    encode_mp3(
                        _KBPS[i % 8],
                        _SR[i % 3],
                        n,
                        lambda k, i=i: i + 13 * k,
                        id3_payload=None if i % 4 == 0 else i % 100 + 1,
                        junk=i % 7 + 1 if i % 5 == 1 else 0,
                        xing_frames=n - 1 if i % 6 == 0 else None,
                    )
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(fuse(enc, mp3_meta_batches), schema=MP3_META_SCHEMA)
    )

_FRAME_SIG_CTES = """
    p AS (
      SELECT doc_id, doc_id % 24 + 2 AS n, doc_id % 40 + 10 AS delta,
             doc_id % 4 + 1 AS g
      FROM documents
    ),
    f AS (
      SELECT p.doc_id, t.m * p.g AS k, p.delta
      FROM p, unnest(generate_series(0, (p.n - 1) // p.g)) AS t(m)
    ),
    s AS (
      SELECT doc_id, k, delta,
             (doc_id + 37 * k) % 256 AS a,
             (doc_id + 11 * k) % 64 + 8 AS sz
      FROM f
    ),
    sig AS (
      SELECT doc_id AS media_id, k + 1 AS sample_no, k * delta AS ts_ms,
             (sz * a + sz * (sz - 1) // 2
              - 256 * greatest(0, a + sz - 256)) * 1000 // sz AS sig_e3
      FROM s
    ),
    flagged AS (
      SELECT *,
             CASE WHEN lag(sig_e3) OVER w IS NULL THEN 1
                  WHEN abs(sig_e3 - lag(sig_e3) OVER w) > 64000 THEN 1
                  ELSE 0 END AS boundary
      FROM sig
      WINDOW w AS (PARTITION BY media_id ORDER BY sample_no)
    ),
    shots AS (
      SELECT *, sum(boundary) OVER (
        PARTITION BY media_id ORDER BY sample_no
        ROWS UNBOUNDED PRECEDING) AS shot_id
      FROM flagged
    )
"""


@query(
    "mm_shot_segmentation",
    oracle=f"""
    WITH {_FRAME_SIG_CTES}
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(shot_id AS BIGINT) AS shot_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(min(sample_no) AS BIGINT) AS start_sample,
           CAST(max(sample_no) AS BIGINT) AS end_sample,
           CAST(min(ts_ms) AS BIGINT) AS start_ts_ms,
           CAST(max(ts_ms) AS BIGINT) AS end_ts_ms
    FROM shots
    GROUP BY media_id, shot_id
    """,
)
def mm_shot_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot/scene segmentation over REAL extracted keyframes — the video
    training-data op (shot boundaries feed clip-level captioning and
    dedup): each sync sample's e3 mean byte value is its signature, a
    lag diff over the per-video frame order flags a boundary when the
    signature jumps > 64 e3-units (the first frame always opens shot 1),
    a running sum of flags numbers the shots, and shots roll up to
    (n_frames, start/end sample and timestamp). Everything downstream
    of the container walk is built-in window/agg functions — the lag,
    the flag, the cumulative sum and the rollup all run JVM-side; the
    ONE shuffle partitions by media_id (frames per video are bounded by
    the container, so no skew), and the oracle replays the identical
    closed-form signatures and window chain in SQL. At 100 TB: map-only
    extraction, a single bounded-fanout shuffle, then a group-by that
    AQE coalesces — the same shape as w6_span_merge_sessionize."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from purldb_spark.multimodal.containers import (
        MP4_FRAME_SCHEMA,
        mp4_sync_frames_batches,
    )

    frames = _mp4_fused(
        spark, sf_dir, mp4_sync_frames_batches, MP4_FRAME_SCHEMA
    ).select(
        "media_id",
        "sample_no",
        "ts_ms",
        (F.col("byte_sum") * 1000 / F.col("n_bytes"))
        .cast("long")
        .alias("sig_e3"),
    )
    w = Window.partitionBy("media_id").orderBy("sample_no")
    flagged = frames.withColumn(
        "boundary",
        F.when(F.lag("sig_e3").over(w).isNull(), F.lit(1))
        .when(
            F.abs(F.col("sig_e3") - F.lag("sig_e3").over(w)) > 64000,
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    )
    shots = flagged.withColumn(
        "shot_id",
        F.sum("boundary").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return shots.groupBy("media_id", "shot_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("sample_no").alias("start_sample"),
        F.max("sample_no").alias("end_sample"),
        F.min("ts_ms").alias("start_ts_ms"),
        F.max("ts_ms").alias("end_ts_ms"),
    )


@query(
    "dedup_video_shots",
    oracle=f"""
    WITH {_FRAME_SIG_CTES},
    shot_sigs AS (
      SELECT media_id, shot_id,
             count(*) AS n_frames,
             string_agg(CAST(sig_e3 AS VARCHAR), ',' ORDER BY sample_no)
               AS sig_key
      FROM shots
      GROUP BY media_id, shot_id
    )
    SELECT sig_key,
           CAST(min(n_frames) AS BIGINT) AS n_frames,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT media_id) AS BIGINT) AS n_media,
           CAST(min(media_id) AS BIGINT) AS example_media
    FROM shot_sigs
    GROUP BY sig_key
    HAVING count(*) > 1
    """,
)
def dedup_video_shots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-video duplicate-SHOT detection — the video-corpus analogue
    of exact text dedup (intros, logo stings and boilerplate clips
    repeat across a scraped corpus and must not be oversampled in
    training): shots from mm_shot_segmentation's chain are keyed by
    their ordered frame-signature sequence (string-joined e3 values —
    an exact key, not a sketch), and keys occurring more than once
    across the corpus come back with occurrence/media counts and an
    example. The signature alphabet folds (a, size) into 1000a +
    500(size-1), so distinct frames genuinely collide and the dup
    groups are non-trivial. Plan shape: the map-only frame extraction,
    ONE shuffle by media_id for the shot chain (bounded fanout), one
    groupBy on the signature key (map-side combined) — exact-dedup's
    hash-groupBy shape, no joins anywhere. At 100 TB the key-space is
    bounded by content, not corpus, and AQE handles the residual skew
    the HAVING filter targets."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from purldb_spark.multimodal.containers import (
        MP4_FRAME_SCHEMA,
        mp4_sync_frames_batches,
    )

    frames = _mp4_fused(
        spark, sf_dir, mp4_sync_frames_batches, MP4_FRAME_SCHEMA
    ).select(
        "media_id",
        "sample_no",
        (F.col("byte_sum") * 1000 / F.col("n_bytes"))
        .cast("long")
        .alias("sig_e3"),
    )
    w = Window.partitionBy("media_id").orderBy("sample_no")
    shots = (
        frames.withColumn(
            "boundary",
            F.when(F.lag("sig_e3").over(w).isNull(), F.lit(1))
            .when(
                F.abs(F.col("sig_e3") - F.lag("sig_e3").over(w)) > 64000,
                F.lit(1),
            )
            .otherwise(F.lit(0)),
        )
        .withColumn(
            "shot_id",
            F.sum("boundary").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    shot_sigs = shots.groupBy("media_id", "shot_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("sample_no", "sig_e3"))
                ),
                lambda s: s["sig_e3"].cast("string"),
            ),
        ).alias("sig_key"),
    )
    return (
        shot_sigs.groupBy("sig_key")
        .agg(
            F.min("n_frames").alias("n_frames"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("media_id").alias("n_media"),
            F.min("media_id").alias("example_media"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


@query(
    "shot_incremental_fold",
    oracle=f"""
    WITH {_FRAME_SIG_CTES}
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(sample_no AS BIGINT) AS sample_no,
           CAST(ts_ms AS BIGINT) AS ts_ms,
           CAST(sig_e3 AS BIGINT) AS sig_e3,
           CAST(shot_id AS BIGINT) AS shot_id
    FROM shots
    """,
)
def shot_incremental_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine check for the 19th streaming face's fold algebra (the
    kmeans_minibatch_merge discipline applied to a SEQUENTIAL fold):
    the corpus's keyframe rows are split into three epoch slices by
    sample_no and folded through streaming/shot_stream.extend_shot_chains
    exactly as micro-batches would be — each epoch extends the frontier
    the previous epoch left — and the unioned assignments must equal the
    DIRECT single-pass chain, which is what the oracle computes. A
    frontier bug (wrong carried signature, off-by-one shot offset, a
    dropped or double-counted boundary at an epoch seam) shifts shot ids
    and breaks the hash. Unlike the monoid proofs this one is
    order-SENSITIVE: the epochs compose in sequence, which is precisely
    the property being certified. Plan shape: the same map-only
    extraction three times (one per slice) + one window chain per
    slice + a broadcast frontier join between slices — per-epoch cost
    is O(epoch + active videos), the streaming contract."""
    from pyspark.sql import functions as F

    from purldb_spark.multimodal.containers import (
        MP4_FRAME_SCHEMA,
        mp4_sync_frames_batches,
    )
    from purldb_spark.streaming.shot_stream import extend_shot_chains

    frames = _mp4_fused(
        spark, sf_dir, mp4_sync_frames_batches, MP4_FRAME_SCHEMA
    ).select(
        "media_id",
        "sample_no",
        "ts_ms",
        (F.col("byte_sum") * 1000 / F.col("n_bytes"))
        .cast("long")
        .alias("sig_e3"),
    )
    # stabilize the source so the three slices + frontier joins read one
    # computation, not three re-executions of the Arrow pipeline (r15:
    # lazy — the first epoch's materialization computes and caches it;
    # eager paid a separate up-front job)
    frames = frames.localCheckpoint(eager=False)
    state = spark.createDataFrame(
        [], "media_id long, last_sample_no long, last_sig_e3 long, shots_so_far long"
    )
    outs = []
    for lo, hi in ((1, 2), (3, 5), (6, 1 << 30)):
        batch = frames.filter(
            (F.col("sample_no") >= lo) & (F.col("sample_no") <= hi)
        )
        assignments, state = extend_shot_chains(batch, state)
        # materialize the frontier between epochs — the stream persists
        # it as the generation snapshot; without this the lineage
        # re-derives every prior epoch inside each later one.  r15: lazy —
        # the cache fills when the next epoch (or the final union action)
        # first computes it, inside that job, instead of paying one eager
        # job per epoch; lineage truncation is identical.
        state = state.localCheckpoint(eager=False)
        outs.append(assignments)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _mp4_av_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_mp4_enc's video track plus a tx3g caption track: doc%6+1
    captions 'cap <doc>-<k>' of doc%35+20 ms each, in the same mdat."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.mp4 import encode_mp4

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                n = i % 24 + 2
                payloads = [
                    bytes(
                        ((i + 37 * k + j) % 256)
                        for j in range((i + 11 * k) % 64 + 8)
                    )
                    for k in range(n)
                ]
                outs.append(
                    encode_mp4(
                        16 * (i % 20 + 1),
                        16 * (i % 12 + 1),
                        payloads,
                        delta=i % 40 + 10,
                        sync_every=i % 4 + 1,
                        samples_per_chunk=i % 3 + 1,
                        use_co64=(i % 7 == 0),
                        v1=(i % 5 == 0),
                        captions=[
                            f"cap {i}-{k}" for k in range(i % 6 + 1)
                        ],
                        caption_delta=i % 35 + 20,
                    )
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(enc, schema="media_id long, content binary")
    )


@query(
    "mm_clip_caption_pairs",
    oracle=f"""
    WITH {_FRAME_SIG_CTES},
    shot_spans AS (
      SELECT media_id, shot_id,
             min(ts_ms) AS ss,
             max(ts_ms) + media_id % 40 + 10 AS se_excl
      FROM shots
      GROUP BY media_id, shot_id
    ),
    caps AS (
      SELECT d.doc_id AS media_id,
             t.k + 1 AS caption_idx,
             t.k * (d.doc_id % 35 + 20) AS cs,
             (t.k + 1) * (d.doc_id % 35 + 20) AS ce,
             'cap ' || CAST(d.doc_id AS VARCHAR) || '-'
                    || CAST(t.k AS VARCHAR) AS caption_text
      FROM documents d,
           unnest(generate_series(0, d.doc_id % 6)) AS t(k)
    )
    SELECT CAST(s.media_id AS BIGINT) AS media_id,
           CAST(s.shot_id AS BIGINT) AS shot_id,
           CAST(c.caption_idx AS BIGINT) AS caption_idx,
           c.caption_text,
           CAST(least(c.ce, s.se_excl) - greatest(c.cs, s.ss) AS BIGINT)
             AS overlap_ms
    FROM shot_spans s JOIN caps c
      ON c.media_id = s.media_id
     AND c.cs < s.se_excl AND c.ce > s.ss
    """,
)
def mm_clip_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip-caption training-pair assembly — the op a video-captioning
    corpus build actually runs: shots (from the keyframe chain) align
    with subtitle-track captions by TIME-INTERVAL OVERLAP, yielding
    (clip, caption text) pairs with their overlap in ms. Both sides are
    REAL extractions from one container: the shot chain off the video
    track's sync samples, the captions off a tx3g timed-text track in
    the same mdat (u16-length + utf-8 samples — mp4_text_samples
    decodes the actual bytes; the oracle regenerates the strings from
    doc_id, so a mis-extracted caption byte breaks the string match,
    not just a count). The overlap join is per-media (equi-join on
    media_id + interval predicates over per-video bounded rows — the
    j15 discipline at a bounded grain, no bin-explode needed because
    shots-per-video and captions-per-video are container-bounded, not
    corpus-bounded). At 100 TB: map-only extraction of both tracks in
    ONE container pass each, one bounded-fanout shuffle for the chain,
    one media_id equi-join — no all-pairs anywhere."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from purldb_spark.multimodal.containers import (
        mp4_sync_frames,
        mp4_text_samples,
    )

    media = _mp4_av_media(spark, sf_dir)
    # one encode pass feeds both track extractions
    media = media.localCheckpoint(eager=True)
    frames = mp4_sync_frames(media).select(
        "media_id",
        "sample_no",
        "ts_ms",
        (F.col("byte_sum") * 1000 / F.col("n_bytes"))
        .cast("long")
        .alias("sig_e3"),
    )
    w = Window.partitionBy("media_id").orderBy("sample_no")
    shots = (
        frames.withColumn(
            "boundary",
            F.when(F.lag("sig_e3").over(w).isNull(), F.lit(1))
            .when(
                F.abs(F.col("sig_e3") - F.lag("sig_e3").over(w)) > 64000,
                F.lit(1),
            )
            .otherwise(F.lit(0)),
        )
        .withColumn(
            "shot_id",
            F.sum("boundary").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("media_id", "shot_id")
        .agg(
            F.min("ts_ms").alias("ss"),
            (F.max("ts_ms") + F.col("media_id") % 40 + 10).alias("se_excl"),
        )
    )
    caps = mp4_text_samples(media).select(
        "media_id",
        "caption_idx",
        F.col("ts_ms").alias("cs"),
        F.col("end_ts_ms").alias("ce"),
        F.col("text").alias("caption_text"),
    )
    return (
        shots.join(caps, "media_id")
        .filter((F.col("cs") < F.col("se_excl")) & (F.col("ce") > F.col("ss")))
        .select(
            "media_id",
            "shot_id",
            "caption_idx",
            "caption_text",
            (
                F.least("ce", "se_excl") - F.greatest("cs", "ss")
            ).alias("overlap_ms"),
        )
    )


@query(
    "mm_fmp4_fragments",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 5 + 1 AS nf, doc_id % 6 + 2 AS m,
             doc_id % 20 + 10 AS delta, doc_id % 3 = 0 AS uniform
      FROM documents
    ),
    fs AS (
      SELECT p.*, t.f
      FROM p, unnest(generate_series(0, p.nf - 1)) AS t(f)
    ),
    smp AS (
      SELECT fs.doc_id, fs.f, fs.m, fs.delta, u.s,
             CASE WHEN fs.uniform
                  THEN (fs.doc_id + 9 * fs.f) % 48 + 6
                  ELSE (fs.doc_id + 9 * fs.f + 5 * u.s) % 48 + 6
             END AS sz,
             (fs.doc_id + 23 * fs.f + 7 * u.s) % 256 AS a
      FROM fs, unnest(generate_series(0, fs.m - 1)) AS u(s)
    )
    SELECT doc_id AS media_id,
           CAST(f + 1 AS BIGINT) AS seq,
           CAST(f * m * delta AS BIGINT) AS base_ts_ms,
           CAST(m AS BIGINT) AS n_samples,
           CAST(sum(sz) AS BIGINT) AS frag_bytes,
           CAST(sum(sz * a + sz * (sz - 1) // 2
                    - 256 * greatest(0, a + sz - 256)) AS BIGINT)
             AS byte_sum
    FROM smp
    GROUP BY doc_id, f, m, delta
    """,
)
def mm_fmp4_fragments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL fragmented-MP4 walk through the full Arrow pipeline — the
    DASH/HLS container form large-scale video ingest actually sees:
    per document an fMP4 (init segment with empty sample tables +
    mvex/trex defaults, then moof+mdat pairs with mfhd sequence
    numbers, tfdt base decode times and trun sample tables) is parsed
    back fragment by fragment, samples EXTRACTED via the trun's
    moof-relative data_offset. Docs with doc%3=0 take the
    default-sample-size branch (tfhd default, trun omits sizes) and the
    rest the per-sample-size branch, so BOTH fragment-layer size paths
    are hash-checked corpus-wide; byte sums use the closed-form ramp
    recipe. Map-only, zero shuffle — the progressive-upload ingest
    shape: each fragment indexes without reading the others."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import fuse
    from purldb_spark.multimodal.containers import (
        MP4_FRAG_SCHEMA,
        mp4_fragment_batches,
    )
    from purldb_spark.multimodal.mp4 import encode_fmp4

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                nf, m = i % 5 + 1, i % 6 + 2
                uniform = i % 3 == 0
                frags = []
                for f in range(nf):
                    payloads = []
                    for s in range(m):
                        if uniform:
                            sz = (i + 9 * f) % 48 + 6
                        else:
                            sz = (i + 9 * f + 5 * s) % 48 + 6
                        a = (i + 23 * f + 7 * s) % 256
                        payloads.append(
                            bytes((a + j) % 256 for j in range(sz))
                        )
                    frags.append(payloads)
                outs.append(
                    encode_fmp4(
                        320, 240, frags,
                        delta=i % 20 + 10,
                        uniform_size=uniform,
                    )
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(
            fuse(enc, mp4_fragment_batches), schema=MP4_FRAG_SCHEMA
        )
    )


@query(
    "mm_mp4_audio_meta",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 12 + 2 AS na,
             CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                  ELSE 32000 END AS rate,
             doc_id % 2 + 1 AS ch,
             256 * (doc_id % 4 + 1) AS adelta
      FROM documents
    ),
    sb AS (
      SELECT p.doc_id,
             CAST(sum((p.doc_id + 5 * t.k) % 40 + 4) AS BIGINT)
               AS sample_bytes
      FROM p, unnest(generate_series(0, p.na - 1)) AS t(k)
      GROUP BY p.doc_id
    )
    SELECT p.doc_id AS media_id,
           'mp4a' AS codec,
           CAST(p.ch AS INTEGER) AS channels,
           CAST(p.rate AS INTEGER) AS sample_rate,
           CAST(p.na AS BIGINT) AS n_samples,
           sb.sample_bytes,
           CAST(p.na * p.adelta * 1000 // p.rate AS BIGINT) AS duration_ms
    FROM p JOIN sb ON sb.doc_id = p.doc_id
    """,
)
def mm_mp4_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 AUDIO-track metadata through the full Arrow pipeline: per
    document the A/V container gains a real 'soun' trak — smhd, mp4a
    AudioSampleEntry (channel count and 16.16 sample rate are REAL
    parsed fields, rotating by doc_id), its own sample tables in the
    shared mdat — and the walk reports entry fields + resolved sample
    volume + duration at the audio media timescale (= the sample rate,
    the audio convention; deltas are multiples of 256 so the ms
    division is exact in both engines). The audio PAYLOAD stays opaque
    (AAC is the codec boundary); the container metadata a corpus
    catalog needs is all here. Map-only, zero shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import fuse
    from purldb_spark.multimodal.containers import (
        MP4_AUDIO_SCHEMA,
        mp4_audio_batches,
    )
    from purldb_spark.multimodal.mp4 import encode_mp4

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                na = i % 12 + 2
                aud = [
                    bytes(((i + 11 * k + j) % 256) for j in range((i + 5 * k) % 40 + 4))
                    for k in range(na)
                ]
                outs.append(
                    encode_mp4(
                        16, 16, [b"v"],
                        audio_payloads=aud,
                        audio_rate=(8000, 16000, 32000)[i % 3],
                        audio_channels=i % 2 + 1,
                        audio_delta=256 * (i % 4 + 1),
                    )
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(
            fuse(enc, mp4_audio_batches), schema=MP4_AUDIO_SCHEMA
        )
    )
