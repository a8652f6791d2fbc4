"""Second-wave image codec queries: Adam7-interlaced PNG and 16-bit
RGB555 BMP — two layouts the r14 codec boundary still named, now real
(`binaryops._png_adam7_pixels`, the 16-bit branch in `_bmp_pixels`)
and hash-checked corpus-wide through the standard recipe: encode from
doc_id arithmetic inside Arrow batches, decode with the pure-Python
parsers, oracle re-derives every stat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from purldb_spark.catalog.tables import load
from purldb_spark.conf import spread_small_input
from purldb_spark.plans.registry import query


@query(
    "mm_png_adam7_roundtrip",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 13 + 1 AS w,
             2 * (doc_id % 4) + 1 AS h,
             doc_id % 3 AS ctv
      FROM documents
    ),
    px AS (
      SELECT p.doc_id, p.w, p.h, p.ctv, t.x, u.y
      FROM p,
           unnest(generate_series(0, p.w - 1)) AS t(x),
           unnest(generate_series(0, p.h - 1)) AS u(y)
    ),
    sums AS (
      SELECT doc_id, w, h, ctv,
             sum((doc_id + 7 * x + 13 * y) % 256) AS s0,
             sum((doc_id + 7 * x + 13 * y + 29) % 256) AS s1,
             sum((doc_id + 7 * x + 13 * y + 58) % 256) AS s2
      FROM px
      GROUP BY doc_id, w, h, ctv
    )
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(CASE ctv WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
                AS INTEGER) AS channels,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(round((CASE WHEN ctv = 0 THEN s0 ELSE s2 END)
                      * 1000.0 / (w * h)) AS BIGINT) AS mean_b_e3,
           CAST(round((CASE WHEN ctv = 0 THEN s0 ELSE s1 END)
                      * 1000.0 / (w * h)) AS BIGINT) AS mean_g_e3,
           CAST(round(s0 * 1000.0 / (w * h)) AS BIGINT) AS mean_r_e3
    FROM sums
    """,
)
def mm_png_adam7_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAM7-INTERLACED PNG through the full Arrow pipeline — the
    boundary the r14 codec note still named, now real: per document the
    pixel grid (x, y, ci) -> (doc + 7x + 13y + 29ci) % 256 (every pixel
    distinct — the strong content for filter bugs) is written as a
    7-pass interlaced PNG (encode_png_adam7: per-pass filter chains,
    cycling types within each pass) and decoded by the deinterlacer
    (_png_adam7_pixels: per-pass unfilter + lattice scatter, empty
    passes skipped — the small-image subtlety). Color type cycles
    gray/RGB/RGBA by doc_id; widths sweep 1..13 and heights the odd
    values 1/3/5/7 — pass emptiness and 1-pixel lattices are all
    hash-checked, and odd heights keep 16 from dividing w*h, which
    PROVES the e3 means never land on a .5 rounding boundary
    (v2(2000*sum) >= 4 > v2(w*h) — the banker's-vs-half-away guard). The oracle
    re-derives each channel sum arithmetically: one misplaced lattice
    pixel or a filter chain crossing a pass boundary shifts a mean and
    breaks the match. Map-only, zero shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        IMAGE_STATS_SCHEMA,
        encode_png_adam7,
        fuse,
        image_stats_batches,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = i % 13 + 1, 2 * (i % 4) + 1
                ct = (0, 2, 6)[i % 3]
                nch = {0: 1, 2: 3, 6: 4}[ct]
                rows = []
                for y in range(h):
                    row = bytearray()
                    for x in range(w):
                        for c in range(nch):
                            row.append((i + 7 * x + 13 * y + 29 * c) % 256)
                    rows.append(bytes(row))
                outs.append(encode_png_adam7(rows, ct))
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
    "mm_bmp16_roundtrip",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(doc_id % 11 + 1 AS INTEGER) AS width,
           CAST(doc_id % 7 + 1 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST((doc_id % 11 + 1) * (doc_id % 7 + 1) AS BIGINT) AS n_pixels,
           CAST((doc_id % 32) * 255 // 31 * 1000 AS BIGINT) AS mean_b_e3,
           CAST(((doc_id // 5) % 32) * 255 // 31 * 1000 AS BIGINT)
             AS mean_g_e3,
           CAST(((doc_id // 11) % 32) * 255 // 31 * 1000 AS BIGINT)
             AS mean_r_e3
    FROM documents
    """,
)
def mm_bmp16_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit RGB555 BMP through the full Arrow pipeline — the second
    named boundary closed: per document a solid-color 16-bit BMP
    (5-bit components from doc_id, u16 little-endian rows, 4-byte
    padding exercised by odd widths) decodes through the RGB555 branch
    with floor(x * 255 / 31) channel scaling — an integer expression
    the oracle replays verbatim, so an endianness flip or a 5-bit mask
    error breaks the match. Map-only, zero shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        IMAGE_STATS_SCHEMA,
        encode_bmp16,
        fuse,
        image_stats_batches,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                outs.append(
                    encode_bmp16(
                        i % 11 + 1,
                        i % 7 + 1,
                        ((i // 11) % 32, (i // 5) % 32, i % 32),
                    )
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
    "mm_bmp_rle_roundtrip",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 14 + 2 AS w, 2 * (doc_id % 3) + 1 AS h
      FROM documents
    ),
    rows_ AS (
      SELECT p.doc_id, p.w, p.h, t.y,
             (p.w + 1) // 2 AS n1,
             p.w - (p.w + 1) // 2 AS n2,
             (p.doc_id + t.y) % 4 AS a,
             (p.doc_id + t.y + 1) % 4 AS b
      FROM p, unnest(generate_series(0, p.h - 1)) AS t(y)
    ),
    sums AS (
      SELECT doc_id, w, h,
             sum(n1 * (10 + 60 * a) + n2 * (10 + 60 * b)) AS sb,
             sum(n1 * (20 + 60 * a) + n2 * (20 + 60 * b)) AS sg,
             sum(n1 * (30 + 60 * a) + n2 * (30 + 60 * b)) AS sr
      FROM rows_
      GROUP BY doc_id, w, h
    )
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(round(sb * 1000.0 / (w * h)) AS BIGINT) AS mean_b_e3,
           CAST(round(sg * 1000.0 / (w * h)) AS BIGINT) AS mean_g_e3,
           CAST(round(sr * 1000.0 / (w * h)) AS BIGINT) AS mean_r_e3
    FROM sums
    """,
)
def mm_bmp_rle_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BI_RLE8 BMP through the full Arrow pipeline — real run-length
    DECOMPRESSION, the first compressed-BMP layout to cross the
    boundary: per document each row y splits into two runs (palette
    index (doc+y)%4 then (doc+y+1)%4, palette entry j = (10+60j,
    20+60j, 30+60j) BGR), encoded with runs + end-of-line + end-of-
    bitmap markers and decoded back through the RLE walk + palette
    expansion (odd heights keep 16 from dividing w*h — the .5 rounding
    guard, as mm_png_adam7_roundtrip)
    expansion. The oracle re-derives per-row run lengths and palette
    sums arithmetically: a run-length slip, a bottom-up flip error, or
    an escape-code confusion shifts a mean and breaks the match (the
    absolute-mode and delta escapes are pinned by unit tests —
    test_multimodal_codecs). Map-only, zero shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        IMAGE_STATS_SCHEMA,
        encode_bmp_rle8,
        fuse,
        image_stats_batches,
    )

    _PAL = [(10 + 60 * j, 20 + 60 * j, 30 + 60 * j) for j in range(4)]

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = i % 14 + 2, 2 * (i % 3) + 1
                n1 = (w + 1) // 2
                idxs = []
                for y in range(h):
                    a, b = (i + y) % 4, (i + y + 1) % 4
                    idxs += [a] * n1 + [b] * (w - n1)
                outs.append(encode_bmp_rle8(w, h, idxs, _PAL))
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
    "mm_png16_roundtrip",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 7 + 1 AS w, 2 * (doc_id % 4) + 1 AS h,
             doc_id % 4 AS ctv
      FROM documents
    ),
    px AS (
      SELECT p.doc_id, p.w, p.h, p.ctv, t.x, u.y
      FROM p,
           unnest(generate_series(0, p.w - 1)) AS t(x),
           unnest(generate_series(0, p.h - 1)) AS u(y)
    ),
    sums AS (
      SELECT doc_id, w, h, ctv,
             sum((doc_id + 7 * x + 13 * y) % 256) AS s0,
             sum((doc_id + 7 * x + 13 * y + 29) % 256) AS s1,
             sum((doc_id + 7 * x + 13 * y + 58) % 256) AS s2
      FROM px
      GROUP BY doc_id, w, h, ctv
    )
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(CASE ctv WHEN 0 THEN 1 WHEN 1 THEN 3
                         WHEN 2 THEN 2 ELSE 4 END AS INTEGER) AS channels,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(round((CASE WHEN ctv IN (0, 2) THEN s0 ELSE s2 END)
                      * 1000.0 / (w * h)) AS BIGINT) AS mean_b_e3,
           CAST(round((CASE WHEN ctv IN (0, 2) THEN s0 ELSE s1 END)
                      * 1000.0 / (w * h)) AS BIGINT) AS mean_g_e3,
           CAST(round(s0 * 1000.0 / (w * h)) AS BIGINT) AS mean_r_e3
    FROM sums
    """,
)
def mm_png16_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-BIT-DEPTH and GRAY+ALPHA PNG through the full Arrow pipeline —
    the last named PNG layouts, now real: per document u16 big-endian
    samples whose HIGH byte carries (doc + 7x + 13y + 29c) % 256 and
    whose LOW byte is unrelated noise ((doc + 3x + 5y) % 256), so a
    decoder that mixes sample bytes — or unfilters at 8-bit bpp instead
    of the spec's channels x 2 — corrupts the means and breaks the
    hash. Color type cycles gray / RGB / GRAY+ALPHA / RGBA by doc_id
    (ct 4 exercises the alpha-excluded 2-channel mean path); odd
    heights keep the .5 rounding guard (v2(2000*sum) >= 4 > v2(w*h)).
    Map-only, zero shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        IMAGE_STATS_SCHEMA,
        encode_png_pixels16,
        fuse,
        image_stats_batches,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = i % 7 + 1, 2 * (i % 4) + 1
                ct = (0, 2, 4, 6)[i % 4]
                nch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
                rows = []
                for y in range(h):
                    row = []
                    for x in range(w):
                        for c in range(nch):
                            hi = (i + 7 * x + 13 * y + 29 * c) % 256
                            lo = (i + 3 * x + 5 * y) % 256
                            row.append(hi << 8 | lo)
                    rows.append(row)
                outs.append(encode_png_pixels16(rows, ct))
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
    "mm_png_sub8_roundtrip",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 10 + 1 AS w, 2 * (doc_id % 4) + 1 AS h,
             CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS d,
             doc_id % 2 = 1 AS pal
      FROM documents
    ),
    px AS (
      SELECT p.doc_id, p.w, p.h, p.d, p.pal,
             (p.doc_id + 3 * t.x + 5 * u.y) % (1 << p.d) AS v
      FROM p,
           unnest(generate_series(0, p.w - 1)) AS t(x),
           unnest(generate_series(0, p.h - 1)) AS u(y)
    ),
    sums AS (
      SELECT doc_id, w, h, d, pal, sum(v) AS sv, count(*) AS n
      FROM px
      GROUP BY doc_id, w, h, d, pal
    )
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(CASE WHEN pal THEN 3 ELSE 1 END AS INTEGER) AS channels,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(round((CASE WHEN pal THEN 13 * n + 16 * sv
                            ELSE sv * (255 // ((1 << d) - 1)) END)
                      * 1000.0 / n) AS BIGINT) AS mean_b_e3,
           CAST(round((CASE WHEN pal THEN 11 * n + 16 * sv
                            ELSE sv * (255 // ((1 << d) - 1)) END)
                      * 1000.0 / n) AS BIGINT) AS mean_g_e3,
           CAST(round((CASE WHEN pal THEN 7 * n + 16 * sv
                            ELSE sv * (255 // ((1 << d) - 1)) END)
                      * 1000.0 / n) AS BIGINT) AS mean_r_e3
    FROM sums
    """,
)
def mm_png_sub8_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUB-8-BIT PNG (1/2/4-bit packed samples) through the full Arrow
    pipeline — PNG's remaining depth family, now real: samples pack
    MSB-first into byte-aligned scanlines, the filters run bytewise at
    bpp = 1 (the spec's sub-byte rule), and the decoder unpacks d-bit
    groups and scales gray by the EXACT integer 255/(2^d - 1) (255, 85
    or 17 — all odd, which with odd heights keeps the .5 rounding
    guard: v2(2000*sum) >= 4 > v2(w*h)). Depth cycles 1/2/4 and even
    documents decode as gray, odd as PALETTED (PLTE entries 16j-spaced
    so every index is distinguishable), so bit order, row-tail
    discard, scaling, and palette expansion are all hash-checked
    corpus-wide. Map-only, zero shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        IMAGE_STATS_SCHEMA,
        encode_png_sub8,
        fuse,
        image_stats_batches,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                d = (1, 2, 4)[i % 3]
                w, h = i % 10 + 1, 2 * (i % 4) + 1
                mx = 1 << d
                rows = [
                    [(i + 3 * x + 5 * y) % mx for x in range(w)]
                    for y in range(h)
                ]
                if i % 2 == 1:
                    pal = [
                        (7 + 16 * j, 11 + 16 * j, 13 + 16 * j)
                        for j in range(mx)
                    ]
                    outs.append(encode_png_sub8(rows, d, 3, palette=pal))
                else:
                    outs.append(encode_png_sub8(rows, d, 0))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": outs})

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(spread_small_input)
        .mapInPandas(
            fuse(enc, image_stats_batches), schema=IMAGE_STATS_SCHEMA
        )
    )
