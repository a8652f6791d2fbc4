"""License-expression boolean simplification query (C9 extension —
functions/licenses.py simplify_expression vs the license-expression lib's
``.simplify()`` the reference calls in minecode/indexing.py:208-215).

Simplification is symbolic, so the Spark side runs the Python simplifier
as an Arrow-batched pandas UDF (the reference runs the same algebra in
Python per row; here it's vectorized per batch and embarrassingly
parallel — no shuffle, scales linearly). The oracle can't run the
algebra, so the fixture builds expressions from six templates whose
simplified forms ARE SQL-expressible: each template's expected output is a
deterministic function of its two (always distinct) license atoms, so the
hash check proves absorption, flatten/dedup, commutative ordering, WITH
atomicity, and case normalization."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.functions.licenses import simplify_expression
from purldb_spark.plans import sqltext as S
from purldb_spark.plans.registry import query

# two disjoint atom pools -> l1 != l2 always; pool B includes a WITH-bound
# exception and a MixedCase spelling to exercise atomicity + normalization
_POOL_A = ["mit", "apache-2.0", "gpl-3.0", "mpl-2.0"]
_POOL_B = ["bsd-new", "lgpl-2.1", "gpl-2.0 WITH classpath-exception-2.0"]

_TEMPLATES_SQL = """
  SELECT p_partkey AS k,
         CASE p_partkey % 4 WHEN 0 THEN 'mit' WHEN 1 THEN 'apache-2.0'
                            WHEN 2 THEN 'gpl-3.0' ELSE 'mpl-2.0' END AS l1,
         CASE p_partkey % 3 WHEN 0 THEN 'bsd-new' WHEN 1 THEN 'lgpl-2.1'
              ELSE 'gpl-2.0 WITH classpath-exception-2.0' END AS l2
  FROM part
"""


@query(
    "x_license_simplify",
    oracle=f"""
    WITH base AS ({_TEMPLATES_SQL})
    SELECT k,
           CASE k % 6
             WHEN 0 THEN l1
             WHEN 1 THEN l1
             WHEN 2 THEN least(l1, l2) || ' AND ' || greatest(l1, l2)
             WHEN 3 THEN least(l1, l2) || ' AND ' || greatest(l1, l2)
             WHEN 4 THEN least(l1, l2) || ' OR ' || greatest(l1, l2)
             ELSE least(l1, l2) || ' OR ' || greatest(l1, l2)
           END AS simplified
    FROM base
    """,
)
def x_license_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six expression templates per part row — absorption both directions,
    commutative dedup of AND/OR pairs, idempotence, flatten — simplified by
    the boolean engine; expected outputs computed arithmetically."""
    p = load(spark, sf_dir, "part")
    k = S.col("p_partkey")
    l1 = (
        S.when(k % 4 == 0, _POOL_A[0])
        .when(k % 4 == 1, _POOL_A[1])
        .when(k % 4 == 2, _POOL_A[2])
        .otherwise(_POOL_A[3])
    )
    l2 = (
        S.when(k % 3 == 0, _POOL_B[0])
        .when(k % 3 == 1, _POOL_B[1])
        .otherwise(_POOL_B[2])
    )
    t = k % 6
    raw = (
        S.when(t == 0, S.concat(l1, " AND (", l1, " OR ", l2, ")"))
        .when(t == 1, S.concat(l1, " OR (", l1, " AND ", l2, ")"))
        .when(t == 2, S.concat("(", l1, " AND ", l2, ") OR (", l2, " AND ", l1, ")"))
        .when(t == 3, S.concat(l1, " AND ", l1, " AND ", l2))
        .when(t == 4, S.concat("(", l1, " OR ", l2, ") AND (", l2, " OR ", l1, ")"))
        .otherwise(S.concat(l1, " OR (", l2, " OR ", l1, ")"))
    )

    @F.pandas_udf("string")
    def simplify_udf(s: pd.Series) -> pd.Series:
        return s.map(simplify_expression)

    return S.sel(p, k.alias("k"), raw.alias("raw")).select(
        "k", simplify_udf("raw").alias("simplified")
    )
