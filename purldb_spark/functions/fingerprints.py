"""Fingerprint algebra — SURVEY §2.7 (F1-F7).

The reference stores BAH128 halohash fingerprints as
``%08x(element_count) + 32-hex-digit hash`` and matches them by

  F1 split   -> count + hash        (matchcode/models.py:204,244)
  F2 chunk   -> four 4-byte chunks  (index keys for LSH banding)
  F3 hamming -> bit_count(xor) with threshold < 10 of 128
               (matchcode/models.py:272-291)
  F4 gate    -> only candidates whose counts are within ±5%
               (matchcode/models.py:129-141)
  F5 rank    -> tie-break by size diff + name similarity
               (matchcode/models.py:339-366)

Spark representation: the 128-bit hash becomes four LONG columns holding
32-bit chunks (`c1..c4`). That keeps every operation — equality joins on
chunks, xor, bit_count — inside whole-stage codegen on fixed-width ints: no
binary comparisons, no UDFs, and the chunk columns double as the LSH band
join keys. The same decoding exists in DuckDB ('0x'||hex cast), which the
oracle SQL uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HAMMING_THRESHOLD = 10  # matchcode/models.py:274 — match iff hd < 10
COUNT_RANGE_RATIO = 0.05  # matchcode/models.py:129-141 — ±5% element count

CHUNK_COLS = ("c1", "c2", "c3", "c4")


def hex_chunk_to_long(hex_expr: Column) -> Column:
    """8 hex digits -> long (32-bit value, always fits)."""
    return F.conv(hex_expr, 16, 10).cast("long")


def split_fingerprint(df: DataFrame, fp_col: str, prefix: str = "") -> DataFrame:
    """F1+F2: '%08x(count)' + 32-hex BAH128 -> element count + 4 int chunks."""
    fp = F.col(fp_col)
    out = df.withColumn(
        prefix + "element_count", hex_chunk_to_long(F.substring(fp, 1, 8))
    )
    for i, name in enumerate(CHUNK_COLS):
        out = out.withColumn(
            prefix + name, hex_chunk_to_long(F.substring(fp, 9 + 8 * i, 8))
        )
    return out


def attach_chunks(df: DataFrame, hash_col: str, prefix: str = "") -> DataFrame:
    """F2 only: 32-hex hash (no count prefix) -> 4 int chunks."""
    fp = F.col(hash_col)
    out = df
    for i, name in enumerate(CHUNK_COLS):
        out = out.withColumn(
            prefix + name, hex_chunk_to_long(F.substring(fp, 1 + 8 * i, 8))
        )
    return out


def hamming128(a: tuple[Column, ...], b: tuple[Column, ...]) -> Column:
    """F3: hamming distance between two 128-bit values held as 4 longs."""
    terms = [F.bit_count(x.bitwiseXOR(y)) for x, y in zip(a, b)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def hamming128_sql(a_cols: list[str], b_cols: list[str]) -> str:
    """DuckDB rendering of the same 4-chunk hamming sum."""
    return " + ".join(
        f"bit_count(xor({a}, {b}))" for a, b in zip(a_cols, b_cols)
    )


def similarity128(hd: Column) -> Column:
    """(128 - hd) / 128 — the reference's similarity score
    (matchcode/api.py:274-287). Integer inputs: deterministic double."""
    return (F.lit(128) - hd).cast("double") / F.lit(128.0)


def count_gate(query_count: Column, index_count: Column, ratio: float = COUNT_RANGE_RATIO) -> Column:
    """F4: ±ratio element-count window (both sides integer-exact).

    Both bounds truncate toward zero like the reference's
    ``int(count * ratio)`` in bah128_ranges (matchcode/models.py:129-141);
    counts are positive so floor == int() truncation.
    """
    lo = F.floor(query_count * (1 - ratio))
    hi = F.floor(query_count * (1 + ratio))
    return index_count.between(lo, hi)


def hex_to_long_sql(hex_expr: str) -> str:
    """DuckDB: 8 hex digits -> BIGINT."""
    return f"CAST('0x' || {hex_expr} AS BIGINT)"
