"""Exact difflib.SequenceMatcher.ratio() as an Arrow-batched pandas UDF.

The reference ranks approximate-match candidates by
(hamming_distance, size_difference, name_difference) where
name_difference = 1 - SequenceMatcher(a=name_a, b=name_b).ratio()
(matchcode/models.py:347-366). The main match/f5 queries substitute
levenshtein (JVM-side, available in both engines — declared in SURVEY
§2.7); THIS module provides the exact stdlib semantics for parity:
default SequenceMatcher construction (autojunk=True), a/b argument
order preserved.

Scale note: the ratio runs only on the final tie-break tier (one
candidate row per query after the size filter), never on the full
candidate join — the Arrow batch transfer is proportional to the
number of queries, not the corpus. Everything upstream stays JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_ratio_udf = None


def seqmatch_ratio(a: Column, b: Column) -> Column:
    """SequenceMatcher(a=a, b=b).ratio() — exact difflib semantics.

    The pandas UDF is created lazily: registration needs an active
    SparkSession, and this module is imported by the plan registry
    before any session exists.
    """
    global _ratio_udf
    if _ratio_udf is None:

        @pandas_udf("double")
        def _ratio(a: pd.Series, b: pd.Series) -> pd.Series:
            from difflib import SequenceMatcher

            out = []
            for x, y in zip(a, b):
                if x is None or y is None:
                    out.append(None)
                else:
                    out.append(SequenceMatcher(a=x, b=y).ratio())
            return pd.Series(out, dtype="float64")

        _ratio_udf = _ratio
    return _ratio_udf(a, b)
