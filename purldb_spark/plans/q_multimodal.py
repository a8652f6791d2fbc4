"""Multimodal-column queries: binary payloads synthesized from documents
so the Pandas-UDF plumbing is exercised end-to-end AND oracle-checkable.

Two tiers: the fake/* tier (content = utf-8 text bytes, stub decode —
md5 and byte-length facts DuckDB can restate), and since r13 the REAL
tier: mm_bmp_roundtrip / mm_wav_roundtrip encode genuine uncompressed
BMP / RIFF-PCM WAV blobs per document and decode them with the
pure-Python parsers (multimodal/binaryops.decode_bmp / decode_wav) —
dimensions, channel means, sample rate, duration, RMS all come off real
binary columns, with the oracle predicting each stat arithmetically
from doc_id. r14 added real PNG (stdlib zlib), r15 real baseline JPEG
(multimodal/jpeg.py — huffman + IDCT + YCbCr, with DC-only mosaics that
roundtrip pixel-exactly despite the codec being lossy). Only mp3/mp4
remain behind NotImplementedError.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.conf import spread_small_input
from purldb_spark.multimodal.binaryops import extract_meta, sample_frames
from purldb_spark.plans.registry import query


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("fake/image").alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
    )


@query(
    "mm_decode_meta",
    oracle="""
    SELECT doc_id AS media_id,
           'fake/image' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash,
           CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height
    FROM documents
    """,
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction through mapInPandas (Arrow batches,
    stub decoder): the full multimodal plumbing — schema, batch iteration,
    hash, decode — verified against a SQL oracle computing the same
    deterministic facts."""
    return extract_meta(_media(spark, sf_dir))


@query(
    "mm_frame_stats",
    oracle="""
    SELECT doc_id AS media_id, CAST(4 AS BIGINT) AS n_frames,
           CAST(octet_length(encode(text)) // 4 * 4 AS BIGINT) AS sampled_bytes
    FROM documents
    WHERE octet_length(encode(text)) >= 4
    """,
)
def mm_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: 1 blob -> 4 chunk rows inside mapInPandas,
    then an aggregate over the exploded frames (count + bytes). Oracle
    reproduces the chunk arithmetic (4 chunks of floor(n/4) bytes)."""
    frames = sample_frames(_media(spark, sf_dir), n_frames=4)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.length("frame")).alias("sampled_bytes"),
        )
        .filter(F.col("sampled_bytes") >= 4)  # == oracle's octet_length >= 4
    )


@query(
    "mm_bmp_roundtrip",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(doc_id % 16 + 1 AS INTEGER) AS width,
           CAST(doc_id % 8 + 1 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST((doc_id % 16 + 1) * (doc_id % 8 + 1) AS BIGINT) AS n_pixels,
           CAST((doc_id % 256) * 1000 AS BIGINT) AS mean_b_e3,
           CAST(((doc_id // 3) % 256) * 1000 AS BIGINT) AS mean_g_e3,
           CAST(((doc_id // 7) % 256) * 1000 AS BIGINT) AS mean_r_e3
    FROM documents
    """,
)
def mm_bmp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image bytes through the full Arrow pipeline: per document,
    ENCODE a genuine 24-bit padded bottom-up BMP (solid color + dims
    derived from doc_id), then DECODE it with the pure-Python header/
    pixel parser (binaryops.decode_bmp via image_stats) — exercising row
    padding (widths 1..16), pixel offsets, and per-channel means on real
    binary columns. The oracle predicts every decoded stat arithmetically
    from doc_id, so an encoder/decoder bug that shifts a byte or counts a
    padding column breaks the match. Blobs are built and decoded inside
    ONE fused mapInPandas pass (r16, guide §4) — nothing but (id, stats)
    leaves the worker, and the blob never crosses Arrow at all."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        IMAGE_STATS_SCHEMA,
        encode_bmp,
        fuse,
        image_stats_batches,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": [
                        encode_bmp(
                            int(i) % 16 + 1,
                            int(i) % 8 + 1,
                            (
                                int(i) % 256,
                                (int(i) // 3) % 256,
                                (int(i) // 7) % 256,
                            ),
                        )
                        for i in pdf["doc_id"]
                    ],
                }
            )

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(
            fuse(enc, image_stats_batches), schema=IMAGE_STATS_SCHEMA
        )
    )


@query(
    "mm_wav_roundtrip",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS channels,
           CAST(16 AS INTEGER) AS bits,
           CAST((doc_id % 50 + 1) * 8 AS BIGINT) AS n_frames,
           CAST(doc_id % 50 + 1 AS BIGINT) AS duration_ms,
           CAST((doc_id % 8) * 125 AS BIGINT) AS rms_e3
    FROM documents
    """,
)
def mm_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio bytes through the full Arrow pipeline: per document,
    ENCODE a genuine RIFF/PCM WAV (8 kHz mono 16-bit alternating-sign
    square wave, amplitude (doc_id % 8) x 4096 so the decoded RMS is an
    exact integer multiple of 125 e3-units), then DECODE with the
    pure-Python chunk walker (binaryops.decode_wav via audio_stats). The
    oracle predicts rate/frames/duration/RMS arithmetically from doc_id —
    a chunk-alignment or sample-width bug breaks the match."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        AUDIO_STATS_SCHEMA,
        audio_stats_batches,
        encode_wav,
        fuse,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                amp = (i % 8) * 4096
                n = (i % 50 + 1) * 8
                samples = [amp if k % 2 == 0 else -amp for k in range(n)]
                outs.append(encode_wav(8000, 1, 16, samples))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(
            fuse(enc, audio_stats_batches), schema=AUDIO_STATS_SCHEMA
        )
    )


@query(
    "mm_png_roundtrip",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(doc_id % 12 + 1 AS INTEGER) AS width,
           CAST(doc_id % 6 + 1 AS INTEGER) AS height,
           CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
                AS INTEGER) AS channels,
           CAST((doc_id % 12 + 1) * (doc_id % 6 + 1) AS BIGINT) AS n_pixels,
           CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 256
                     ELSE (doc_id // 11) % 256 END * 1000 AS BIGINT)
             AS mean_b_e3,
           CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 256
                     ELSE (doc_id // 5) % 256 END * 1000 AS BIGINT)
             AS mean_g_e3,
           CAST(doc_id % 256 * 1000 AS BIGINT) AS mean_r_e3
    FROM documents
    """,
)
def mm_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image bytes through the full Arrow pipeline (r13
    verdict gap 1): per document, ENCODE a genuine PNG — IHDR/IDAT/IEND
    chunks, zlib-DEFLATEd scanlines, the row filter CYCLING through all
    five types (None/Sub/Up/Average/Paeth) — then DECODE it with the
    pure-Python chunk walker + unfilter (binaryops.decode_png via
    image_stats' magic-byte dispatch). Color type varies by doc_id
    (grayscale / RGB / RGBA), so channel handling, alpha exclusion, and
    every unfilter branch are all oracle-checked: the oracle predicts
    each decoded stat arithmetically from doc_id, and a single
    mis-reconstructed filter byte shifts a mean and breaks the match."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        IMAGE_STATS_SCHEMA,
        encode_png,
        fuse,
        image_stats_batches,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                ct = (0, 2, 6)[i % 3]
                rgb = (i % 256, (i // 5) % 256, (i // 11) % 256)
                outs.append(
                    encode_png(i % 12 + 1, i % 6 + 1, ct, rgb)
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(
            fuse(enc, image_stats_batches), schema=IMAGE_STATS_SCHEMA
        )
    )


@query(
    "mm_jpeg_roundtrip",
    oracle="""
    WITH gray AS (
      SELECT doc_id, doc_id % 21 + 4 AS w, doc_id % 13 + 4 AS h
      FROM documents WHERE doc_id % 2 = 0
    ),
    gsum AS (
      SELECT g.doc_id,
             CAST(sum(((g.doc_id + 37 * t.bx + 59 * u.by) % 256)
                  * least(8, g.w - 8 * t.bx)
                  * least(8, g.h - 8 * u.by)) AS BIGINT) AS s
      FROM gray g,
           unnest(generate_series(0, (g.w + 7) // 8 - 1)) AS t(bx),
           unnest(generate_series(0, (g.h + 7) // 8 - 1)) AS u(by)
      GROUP BY g.doc_id
    ),
    color AS (
      SELECT doc_id, doc_id % 19 + 2 AS w, doc_id % 11 + 2 AS h,
             doc_id % 256 AS y,
             (doc_id // 5) % 64 + 96 AS cb,
             (doc_id // 11) % 64 + 80 AS cr
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT g.doc_id AS media_id, CAST(g.w AS INTEGER) AS width,
           CAST(g.h AS INTEGER) AS height, CAST(1 AS INTEGER) AS channels,
           CAST(g.w * g.h AS BIGINT) AS n_pixels,
           gs.s AS sum_r, gs.s AS sum_g, gs.s AS sum_b
    FROM gray g JOIN gsum gs ON gs.doc_id = g.doc_id
    UNION ALL
    SELECT doc_id AS media_id, CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height, CAST(3 AS INTEGER) AS channels,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(w * h * least(255, greatest(0,
                CAST(floor(y + 1.402 * (cr - 128) + 0.5) AS BIGINT)))
             AS BIGINT) AS sum_r,
           CAST(w * h * least(255, greatest(0,
                CAST(floor(y - 0.344136 * (cb - 128)
                             - 0.714136 * (cr - 128) + 0.5) AS BIGINT)))
             AS BIGINT) AS sum_g,
           CAST(w * h * least(255, greatest(0,
                CAST(floor(y + 1.772 * (cb - 128) + 0.5) AS BIGINT)))
             AS BIGINT) AS sum_b
    FROM color
    """,
)
def mm_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG bytes through the full Arrow pipeline (r14
    verdict #4, the PNG recipe one codec further): per EVEN document,
    encode a grayscale BLOCK MOSAIC — every 8x8 block solid, so DC-only
    coefficients under a DC quant step of 8 make the lossy codec
    pixel-exact while the block-to-block DC-difference chain exercises
    the real huffman path and non-multiple-of-8 dims exercise edge
    cropping; per ODD document a solid-color 3-component JPEG (4:4:4,
    or 4:2:0 when doc_id % 4 == 3 — solid planes keep subsampling
    lossless) through the floor(x+0.5) YCbCr->RGB transform. Decoded
    with multimodal/jpeg.decode_jpeg_pixels and reported as
    INTEGER-EXACT per-channel pixel sums (jpeg_sum_stats — no float
    mean rounding anywhere), so the oracle predicts every output cell
    arithmetically from doc_id; the chroma ranges (cb 96..159,
    cr 80..143) sit provably clear of the transform's floor boundaries
    (tests/test_jpeg.py scans them)."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        IMAGE_SUMS_SCHEMA,
        fuse,
        jpeg_sum_stats_batches,
    )
    from purldb_spark.multimodal.jpeg import (
        encode_jpeg_gray_mosaic,
        encode_jpeg_solid_ycbcr,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i % 2 == 0:
                    outs.append(
                        encode_jpeg_gray_mosaic(
                            i % 21 + 4,
                            i % 13 + 4,
                            lambda bx, by, i=i: (i + 37 * bx + 59 * by)
                            % 256,
                        )
                    )
                else:
                    outs.append(
                        encode_jpeg_solid_ycbcr(
                            i % 19 + 2,
                            i % 11 + 2,
                            (
                                i % 256,
                                (i // 5) % 64 + 96,
                                (i // 11) % 64 + 80,
                            ),
                            subsample=(i % 4 == 3),
                        )
                    )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(
            fuse(enc, jpeg_sum_stats_batches), schema=IMAGE_SUMS_SCHEMA
        )
    )


def _cell_w(n_docs: int) -> int:
    """Corpus-scaled e3 grid-cell width for the media-feature ANN
    queries — the lsh_band_plan discipline (BENCH_scale finding 1)
    applied to the color grid: a FIXED 250-wide cell (5^3 = 125 cells)
    densifies linearly with N, making the cell join quadratic at scale;
    the ladder keeps expected cell occupancy roughly constant. An
    integer CASE ladder rather than a cube root so both engines derive
    the identical width with no float boundary risk."""
    if n_docs <= 2_000:
        return 250
    if n_docs <= 20_000:
        return 125
    if n_docs <= 200_000:
        return 50
    return 20


_CELL_W_SQL = """(CASE WHEN (SELECT count(*) FROM documents) <= 2000
                       THEN 250
                       WHEN (SELECT count(*) FROM documents) <= 20000
                       THEN 125
                       WHEN (SELECT count(*) FROM documents) <= 200000
                       THEN 50
                       ELSE 20 END)"""



@query(
    "mm_embed_ann_search",
    oracle=f"""
    WITH feat AS (
      SELECT doc_id,
             CAST(round((doc_id % 256) * 1000.0 / 255) AS BIGINT) AS b_e3,
             CAST(round(((doc_id // 3) % 256) * 1000.0 / 255) AS BIGINT)
               AS g_e3,
             CAST(round(((doc_id // 7) % 256) * 1000.0 / 255) AS BIGINT)
               AS r_e3
      FROM documents
    ),
    cand AS (
      SELECT *, b_e3 // {_CELL_W_SQL} AS cb, g_e3 // {_CELL_W_SQL} AS cg, r_e3 // {_CELL_W_SQL} AS cr
      FROM feat
    ),
    q AS (SELECT * FROM cand WHERE doc_id % 7 = 0),
    pairs AS (
      SELECT q.doc_id AS query_id, c.doc_id AS cand_id,
             abs(q.b_e3 - c.b_e3) + abs(q.g_e3 - c.g_e3)
               + abs(q.r_e3 - c.r_e3) AS dist_e3
      FROM q JOIN cand c
        ON q.cb = c.cb AND q.cg = c.cg AND q.cr = c.cr
       AND q.doc_id != c.doc_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY dist_e3, cand_id) AS rnk
      FROM pairs
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(cand_id AS BIGINT) AS cand_id,
           CAST(rnk AS BIGINT) AS rnk,
           CAST(dist_e3 AS BIGINT) AS dist_e3
    FROM ranked WHERE rnk <= 3
    """,
)
def mm_embed_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal-to-ANN capstone as a registry query (r13 verdict
    item 5): REAL bytes -> REAL decode -> REAL feature extraction -> cell
    index -> equi-join probe -> exact re-rank, end to end. Per document a
    genuine solid-color BMP is encoded (dims/color from doc_id, the
    mm_bmp_roundtrip recipe), embed_media extracts the 16-dim color
    descriptor inside Arrow batches (bmp_features — real pixel decode
    through the palette-aware parser), and the channel-mean dims are
    e3-integer-scaled into a grid-cell code whose width is
    CORPUS-SCALED (r15, _cell_w ladder 250->20 — the lsh_band_plan
    discipline: a fixed 5x5x5 grid densifies linearly with N, going
    quadratic in the cell join; the ladder keeps expected occupancy
    roughly constant). Query docs (doc_id %
    7 == 0) probe ONLY their own cell — the banded/cell-bounded shape
    every ANN query in the registry uses (no all-pairs scan) — and
    candidates re-rank by exact integer L1 distance with a deterministic
    id tie-break, top 3 per query. Integer-scaled features make the
    whole pipeline oracle-checkable: DuckDB re-derives the identical
    e3 codes arithmetically from doc_id (float32 embedding error is
    ~6e-5 e3-units, provably inside the >=1/510 e3 gap between any
    channel value and a rounding boundary, so the longs match exactly).
    At 100 TB: feature extraction is map-only Arrow batches, the probe
    is a cell equi-join (AQE-broadcast while the query set is small), the re-rank a
    per-query window over cell-bounded candidates."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import Window

    from purldb_spark.multimodal.binaryops import (
        EMBED_SCHEMA,
        embed_media_batches,
        encode_bmp,
        fuse,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                outs.append(
                    encode_bmp(
                        i % 16 + 1,
                        i % 8 + 1,
                        (i % 256, (i // 3) % 256, (i // 7) % 256),
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": ["image/bmp"] * len(pdf),
                    "content": outs,
                }
            )

    docs = load(spark, sf_dir, "documents")
    w_cell = _cell_w(docs.count())
    feats = (
        docs.select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(fuse(enc, embed_media_batches), schema=EMBED_SCHEMA)
    )
    # bmp_features layout: dims 1/5/9 (1-based) are the B/G/R channel
    # means scaled to [0,1]; e3-integer-scale them into grid-cell codes
    coded = feats.select(
        F.col("media_id"),
        F.round(F.element_at("embedding", 1) * 1000)
        .cast("long")
        .alias("b_e3"),
        F.round(F.element_at("embedding", 5) * 1000)
        .cast("long")
        .alias("g_e3"),
        F.round(F.element_at("embedding", 9) * 1000)
        .cast("long")
        .alias("r_e3"),
    ).select(
        "*",
        F.expr(f"b_e3 div {w_cell}").alias("cb"),
        F.expr(f"g_e3 div {w_cell}").alias("cg"),
        F.expr(f"r_e3 div {w_cell}").alias("cr"),
    )
    q = coded.filter(F.col("media_id") % 7 == 0).select(
        F.col("media_id").alias("query_id"),
        F.col("b_e3").alias("qb"),
        F.col("g_e3").alias("qg"),
        F.col("r_e3").alias("qr"),
        "cb", "cg", "cr",
    )
    # no broadcast hint: the query side here is a fixed FRACTION of the
    # corpus (doc_id % 7), so forcing a broadcast would grow linearly
    # with N and OOM a real cluster — AQE broadcasts it while small and
    # falls back to a shuffled cell equi-join at scale (the correct
    # shape; in production the query set is workload-pinned and small)
    pairs = (
        q
        .join(coded, ["cb", "cg", "cr"])
        .filter(F.col("query_id") != F.col("media_id"))
        .select(
            "query_id",
            F.col("media_id").alias("cand_id"),
            (
                F.abs(F.col("qb") - F.col("b_e3"))
                + F.abs(F.col("qg") - F.col("g_e3"))
                + F.abs(F.col("qr") - F.col("r_e3"))
            ).alias("dist_e3"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_e3"), F.asc("cand_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "cand_id", "rnk", "dist_e3")
    )


_PAIR_TXT = """
  SELECT doc_id,
         CAST(round((doc_id % 256) * 1000.0 / 255) AS BIGINT) AS tb,
         CAST(round(((doc_id // 3) % 256) * 1000.0 / 255) AS BIGINT) AS tg,
         CAST(round(((doc_id // 7) % 256) * 1000.0 / 255) AS BIGINT) AS tr
  FROM documents
"""

_PAIR_IMG = """
  SELECT doc_id,
         CAST(round((CASE WHEN doc_id % 17 = 3
                          THEN (doc_id % 256 + 64) % 256
                          ELSE doc_id % 256 END) * 1000.0 / 255)
              AS BIGINT) AS ib,
         CAST(round((CASE WHEN doc_id % 17 = 3
                          THEN ((doc_id // 3) % 256 + 64) % 256
                          ELSE (doc_id // 3) % 256 END) * 1000.0 / 255)
              AS BIGINT) AS ig,
         CAST(round((CASE WHEN doc_id % 17 = 3
                          THEN ((doc_id // 7) % 256 + 64) % 256
                          ELSE (doc_id // 7) % 256 END) * 1000.0 / 255)
              AS BIGINT) AS ir
  FROM documents
"""


@query(
    "mm_pair_alignment_qa",
    oracle=f"""
    WITH t AS ({_PAIR_TXT}),
    img AS ({_PAIR_IMG}),
    tc AS (SELECT *, tb // {_CELL_W_SQL} AS cb, tg // {_CELL_W_SQL} AS cg,
                  tr // {_CELL_W_SQL} AS cr
           FROM t),
    ic AS (SELECT *, ib // {_CELL_W_SQL} AS cb, ig // {_CELL_W_SQL} AS cg,
                  ir // {_CELL_W_SQL} AS cr
           FROM img),
    cand AS (
      SELECT tc.doc_id AS pair_id, ic.doc_id AS cand_id,
             abs(tc.tb - ic.ib) + abs(tc.tg - ic.ig) + abs(tc.tr - ic.ir)
               AS d
      FROM tc JOIN ic ON ic.cb = tc.cb AND ic.cg = tc.cg AND ic.cr = tc.cr
    ),
    best AS (
      SELECT pair_id, cand_id, d, row_number() OVER (
        PARTITION BY pair_id ORDER BY d, cand_id) AS rnk
      FROM cand
    )
    SELECT t.doc_id AS pair_id,
           CAST(COALESCE(b.cand_id, -1) AS BIGINT) AS retrieved_id,
           CAST(COALESCE(b.d, -1) AS BIGINT) AS dist_e3,
           COALESCE(b.cand_id, -1) = t.doc_id AS aligned,
           t.doc_id % 17 = 3 AS corrupted
    FROM t LEFT JOIN (SELECT * FROM best WHERE rnk = 1) b
      ON b.pair_id = t.doc_id
    """,
)
def mm_pair_alignment_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired-data alignment QA by cross-modal retrieval — the
    LAION-style filtering op for (text, image) training pairs: verify
    each pair by retrieving the text's nearest IMAGE by content and
    checking it is the paired one. Per document the "text encoder"
    stand-in is the deterministic e3 color triple (the capstone's
    doc_id arithmetic — documented fake, like the md5 embedding
    fallback), and the paired image is a REAL solid-color blob carrying
    that triple — BMP for even doc_ids, PNG for odd (cross-codec
    through the r15-canonical BGR feature space). A deterministic
    corruption (doc_id % 17 == 3: every channel shifted +64 mod 256)
    models scraped misaligned pairs; the +64 shift provably moves the
    image out of the text's 250-wide e3 cell, so a corrupted pair can
    never retrieve itself. Text vectors probe ONLY their own cell (the
    registry's standard cell-bounded ANN shape), candidates re-rank by
    exact integer L1 with id tie-break, and the verdict per pair is
    (retrieved_id, dist, aligned = retrieved-self, corrupted = ground
    truth) — the precision/recall of the flag is readable off the
    aligned x corrupted table, and the oracle re-derives the whole
    chain arithmetically from doc_id. The cell width is CORPUS-SCALED
    (_cell_w ladder, the lsh_band_plan discipline) so expected cell
    occupancy — and with it candidate volume per pair — stays roughly
    constant at scale; every ladder width is <= 250, below the
    corruption shift, so the never-retrieves-itself lemma is
    width-independent. At 100 TB: encode/decode/feature are map-only
    Arrow passes, the probe one cell equi-join, the re-rank a per-pair
    window over cell-bounded candidates — identical scale shape to
    mm_embed_ann_search."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import Window

    from purldb_spark.multimodal.binaryops import (
        EMBED_SCHEMA,
        embed_media_batches,
        encode_bmp,
        encode_png,
        fuse,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, types = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                b, g, r = i % 256, (i // 3) % 256, (i // 7) % 256
                if i % 17 == 3:
                    b, g, r = (b + 64) % 256, (g + 64) % 256, (r + 64) % 256
                if i % 2 == 0:
                    outs.append(encode_bmp(i % 9 + 1, i % 5 + 1, (b, g, r)))
                    types.append("image/bmp")
                else:
                    outs.append(
                        encode_png(i % 9 + 1, i % 5 + 1, 2, (r, g, b))
                    )
                    types.append("image/png")
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": types,
                    "content": outs,
                }
            )

    docs = load(spark, sf_dir, "documents")
    w_cell = _cell_w(docs.count())
    img = (
        docs.select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(fuse(enc, embed_media_batches), schema=EMBED_SCHEMA)
        .select(
            F.col("media_id").alias("cand_id"),
            F.round(F.element_at("embedding", 1) * 1000)
            .cast("long")
            .alias("ib"),
            F.round(F.element_at("embedding", 5) * 1000)
            .cast("long")
            .alias("ig"),
            F.round(F.element_at("embedding", 9) * 1000)
            .cast("long")
            .alias("ir"),
        )
        .select(
            "*",
            F.expr(f"ib div {w_cell}").alias("cb"),
            F.expr(f"ig div {w_cell}").alias("cg"),
            F.expr(f"ir div {w_cell}").alias("cr"),
        )
    )
    txt = (
        docs
        .select(
            F.col("doc_id").alias("pair_id"),
            F.round(F.expr("doc_id % 256") * 1000 / 255)
            .cast("long")
            .alias("tb"),
            F.round(F.expr("(doc_id div 3) % 256") * 1000 / 255)
            .cast("long")
            .alias("tg"),
            F.round(F.expr("(doc_id div 7) % 256") * 1000 / 255)
            .cast("long")
            .alias("tr"),
        )
        .select(
            "*",
            F.expr(f"tb div {w_cell}").alias("cb"),
            F.expr(f"tg div {w_cell}").alias("cg"),
            F.expr(f"tr div {w_cell}").alias("cr"),
        )
    )
    cand = txt.join(img, ["cb", "cg", "cr"]).select(
        "pair_id",
        "cand_id",
        (
            F.abs(F.col("tb") - F.col("ib"))
            + F.abs(F.col("tg") - F.col("ig"))
            + F.abs(F.col("tr") - F.col("ir"))
        ).alias("d"),
    )
    w = Window.partitionBy("pair_id").orderBy(F.asc("d"), F.asc("cand_id"))
    best = (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("pair_id", "cand_id", "d")
    )
    return (
        txt.select("pair_id")
        .join(best, "pair_id", "left")
        .select(
            "pair_id",
            F.coalesce("cand_id", F.lit(-1))
            .cast("long")
            .alias("retrieved_id"),
            F.coalesce("d", F.lit(-1)).cast("long").alias("dist_e3"),
            (
                F.coalesce("cand_id", F.lit(-1)) == F.col("pair_id")
            ).alias("aligned"),
            (F.col("pair_id") % 17 == 3).alias("corrupted"),
        )
    )


@query(
    "mm_resize_roundtrip",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(3 AS INTEGER) AS width,
           CAST(3 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(9 AS BIGINT) AS n_pixels,
           CAST(round((4 * (doc_id % 256) + 2 * ((doc_id + 7) % 256)
                       + 2 * ((doc_id + 13) % 256) + (doc_id + 20) % 256)
                      * 1000.0 / 9) AS BIGINT) AS mean_b_e3,
           CAST(round((4 * ((doc_id + 29) % 256) + 2 * ((doc_id + 36) % 256)
                       + 2 * ((doc_id + 42) % 256) + (doc_id + 49) % 256)
                      * 1000.0 / 9) AS BIGINT) AS mean_g_e3,
           CAST(round((4 * ((doc_id + 58) % 256) + 2 * ((doc_id + 65) % 256)
                       + 2 * ((doc_id + 71) % 256) + (doc_id + 78) % 256)
                      * 1000.0 / 9) AS BIGINT) AS mean_r_e3
    FROM documents
    """,
)
def mm_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resample through the full Arrow pipeline (r14: resize_media
    upgraded from byte-cycling stub to nearest-neighbor): per document a
    2x2 24-bit BMP with four DISTINCT pixels (channel value
    (doc_id + 7x + 13y + 29ci) % 256) is NN-resized to 3x3 — source
    column/row 0 duplicates, so the output means are the exact weighted
    sums 4:2:2:1 over the four source pixels — then decoded back
    (image_stats). The oracle restates the weighting arithmetically from
    doc_id: an off-by-one in the NN index map, a channel-order flip, or
    a stride bug in the grid encoder each shifts a mean and breaks the
    match. (round() never lands on .5 here: 9 | weighted-sum would force
    an even quotient against 2000's parity — both engines round the
    same.)"""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        IMAGE_STATS_SCHEMA,
        encode_bmp_pixels,
        fuse,
        image_stats_batches,
        resize_media_batches,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                arr = np.zeros((2, 2, 3), dtype=np.uint8)
                for y in range(2):
                    for x in range(2):
                        for ci in range(3):
                            arr[y, x, ci] = (i + 7 * x + 13 * y + 29 * ci) % 256
                outs.append(encode_bmp_pixels(arr))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    # encode -> resize -> decode in ONE fused Arrow pass (the resize
    # stage's extra meta columns pass through; the stats stage reads
    # only media_id/content) — two JVM<->Python blob roundtrips removed
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(
            fuse(enc, resize_media_batches(3, 3), image_stats_batches),
            schema=IMAGE_STATS_SCHEMA,
        )
    )


@query(
    "mm_wav_windows",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS window_idx,
           CAST(8 * (doc_id % 50 + 1) AS BIGINT) AS n_frames,
           CAST(doc_id % 50 + 1 AS BIGINT) AS duration_ms,
           CAST((doc_id % 8) * 125 AS BIGINT) AS rms_e3
    FROM documents, unnest([0, 1, 2, 3]) AS t(w)
    """,
)
def mm_wav_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio frame-sampling end to end (r14: the frame-sample verb
    upgraded from byte-chunking): per document a genuine RIFF/PCM WAV
    (8 kHz mono 16-bit alternating-sign square wave, 32*(doc_id%50+1)
    frames so every quarter-window is a whole number of milliseconds —
    a frame count divisible by 4*8 keeps duration_ms off the .5
    rounding boundary where Python's banker's rounding and SQL's
    half-away diverge), sliced into FOUR frame-aligned windows each
    re-wrapped as a complete WAV, each decoded independently
    (binaryops.audio_window_stats). The oracle predicts every window's
    frame count, duration, and RMS arithmetically: a frame-misaligned
    slice or a dropped fmt chunk breaks the decode, a remainder-frame
    bug breaks the counts, and the alternating wave keeps per-window
    RMS exactly (doc_id % 8) * 125 e3-units."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        WINDOW_STATS_SCHEMA,
        audio_window_stats_batches,
        encode_wav,
        fuse,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                amp = (i % 8) * 4096
                n = (i % 50 + 1) * 32
                samples = [amp if k % 2 == 0 else -amp for k in range(n)]
                outs.append(encode_wav(8000, 1, 16, samples))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(
            fuse(enc, audio_window_stats_batches(4)),
            schema=WINDOW_STATS_SCHEMA,
        )
    )
