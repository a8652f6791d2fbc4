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
from purldb_spark.plans.registry import query


@query(
    "mm_png_adam7_roundtrip",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 13 + 1 AS w, doc_id % 9 + 1 AS h,
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
    gray/RGB/RGBA by doc_id; width/height sweep 1..13 x 1..9 so pass
    emptiness and 1-pixel lattices are all hash-checked. The oracle
    re-derives each channel sum arithmetically: one misplaced lattice
    pixel or a filter chain crossing a pass boundary shifts a mean and
    breaks the match. Map-only, zero shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    from purldb_spark.multimodal.binaryops import (
        encode_png_adam7,
        image_stats,
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = i % 13 + 1, i % 9 + 1
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

    media = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .mapInPandas(enc, schema="media_id long, content binary")
    )
    return image_stats(media)


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

    from purldb_spark.multimodal.binaryops import encode_bmp16, image_stats

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

    media = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .mapInPandas(enc, schema="media_id long, content binary")
    )
    return image_stats(media)
