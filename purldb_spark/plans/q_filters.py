"""Projection / filter / predicate queries — SURVEY §2.2 (P1-P11).

``part`` stands in for the packages catalog (FIXTURES.md §9). P1 (column
projection) is exercised by every query here via narrow ``select``s that
Catalyst prunes down to the parquet ReadSchema.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.operators.filters import (
    compile_query,
    compile_query_sql,
    multifield_search,
    multifield_search_sql,
    purl_lookups,
)
from purldb_spark.plans.registry import query

# mini-language field name -> type; the _part_view aliases physical columns
# to these public field names, so the same compiled predicate text works on
# both engines.
PART_FIELDS = {
    "name": "string",
    "brand": "string",
    "type": "string",
    "size": "int",
    "retailprice": "double",
}


def _part_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part with mini-language field aliases (the API's public field names)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("type"),
        F.col("p_size").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )


_PART_VIEW_SQL = """
  SELECT p_partkey AS partkey, p_name AS name, p_brand AS brand,
         p_type AS type, p_size AS size, p_retailprice AS retailprice
  FROM part
"""


@query(
    "p2_ci_equality",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE lower(c_mktsegment) IN ('building', 'automobile')
    """,
)
def p2_ci_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: iexact multi-value filter (packagedb/api.py:318-332
    `type/namespace/name iexact`)."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name", "c_mktsegment").filter(
        F.lower(F.col("c_mktsegment")).isin("building", "automobile")
    )


@query(
    "p3_in_list",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_brand IN ('Brand#13', 'Brand#42', 'Brand#7')
    """,
)
def p3_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: IN-list filter (packagedb/api.py:118-138 `sha1__in`). The IN
    pushes to the parquet scan as a dictionary filter."""
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", "p_name", "p_brand").filter(
        F.col("p_brand").isin("Brand#13", "Brand#42", "Brand#7")
    )


_P4_PURL = "pkg:part/brand12/small-bolt@50"


@query(
    "p4_purl_filter",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE lower(replace(p_brand, '#', '')) = 'brand12'
      AND replace(p_name, ' ', '-') = 'small-bolt'
      AND CAST(p_size AS VARCHAR) = '50'
    """,
)
def p4_purl_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: purl -> conjunctive field lookups (packagedb/api.py:276-300).

    The purl coordinates are derived columns here (namespace=brand,
    name=hyphenated p_name, version=size) since the synthetic catalog has no
    native purl fields; the parse itself is the real purl_to_lookups path.
    """
    p = load(spark, sf_dir, "part")
    derived = p.select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_size",
        F.lit("part").alias("purl_type"),
        F.lower(F.regexp_replace("p_brand", "#", "")).alias("purl_namespace"),
        F.regexp_replace("p_name", " ", "-").alias("purl_name"),
        F.col("p_size").cast("string").alias("purl_version"),
    )
    pred = purl_lookups(
        _P4_PURL,
        {
            "type": "purl_type",
            "namespace": "purl_namespace",
            "name": "purl_name",
            "version": "purl_version",
        },
    )
    return derived.filter(pred).select("p_partkey", "p_name", "p_brand", "p_size")


_P5_QUERY = 'name^:small type~:ec -brand=:Brand#12 size>:10'


@query(
    "p5_querylang",
    oracle=f"""
    SELECT partkey, name, brand, type, size
    FROM ({_PART_VIEW_SQL})
    WHERE {compile_query_sql(_P5_QUERY, PART_FIELDS, "name")}
    """,
)
def p5_querylang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: the query-string mini-language (packagedb/filters.py:20-55):
    `name^:small type~:ec -brand=:Brand#12 size>:10` — istartswith,
    icontains, negated iexact, numeric gt, AND-folded."""
    v = _part_view(spark, sf_dir)
    pred = compile_query(_P5_QUERY, PART_FIELDS, default_field="name")
    return v.filter(pred).select("partkey", "name", "brand", "type", "size")


@query(
    "p6_search_multifield",
    oracle=f"""
    SELECT partkey, name, brand, type
    FROM ({_PART_VIEW_SQL})
    WHERE {multifield_search_sql("bolt", ["name", "brand", "type"])}
    """,
)
def p6_search_multifield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: default search — OR of icontains over the search fields
    (packagedb/filters.py:88-93)."""
    v = _part_view(spark, sf_dir)
    return v.filter(multifield_search("bolt", ["name", "brand", "type"])).select(
        "partkey", "name", "brand", "type"
    )


@query(
    "p7_range_gate",
    oracle="""
    SELECT p_partkey, p_name, p_size
    FROM part
    WHERE p_size BETWEEN CAST(floor(40 * 0.95) AS INT) AND CAST(floor(40 * 1.05) AS INT)
    """,
)
def p7_range_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: ±5% count-similarity range gate
    (matchcode/models.py:129-141 `indexed_elements_count__range`)."""
    p = load(spark, sf_dir, "part")
    lo = F.floor(F.lit(40) * 0.95).cast("int")
    hi = F.floor(F.lit(40) * 1.05).cast("int")
    return p.select("p_partkey", "p_name", "p_size").filter(
        F.col("p_size").between(lo, hi)
    )


@query(
    "p8_prefix_regex",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE starts_with(p_type, 'PROMO')
      AND regexp_matches(p_name, '(red|blue) .*$')
    """,
)
def p8_prefix_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: prefix + regex path predicates (matchcode/pipes/matching.py:51-70
    `path__startswith`, `path__regex`). Prefix predicates push down; the
    regex evaluates post-scan, so it is ANDed after the cheap prefix."""
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", "p_name", "p_type").filter(
        F.col("p_type").startswith("PROMO") & F.col("p_name").rlike("(red|blue) .*$")
    )


@query(
    "p9_null_flags",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           nullif(l_returnflag, 'N') AS visit_flag
    FROM lineitem
    WHERE nullif(l_returnflag, 'N') IS NULL AND l_quantity > 45.0
    """,
)
def p9_null_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: isnull predicates (minecode/models.py:219-252
    `last_visit_date__isnull`). The synthetic tables are null-free, so the
    nullable column is derived with nullif — the predicate semantics are the
    point."""
    li = load(spark, sf_dir, "lineitem")
    flagged = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("visit_flag"),
    )
    return flagged.filter(F.col("visit_flag").isNull() & (F.col("l_quantity") > 45.0))


@query(
    "p10_status_exclusion",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderstatus NOT IN ('F')
      AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    """,
)
def p10_status_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: status-exclusion chains (matchcode/pipes/matching.py:271-276
    `.exclude(status__in=...)`)."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderstatus", "o_orderpriority").filter(
        ~F.col("o_orderstatus").isin("F")
        & ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


_P11_MD5S = [_md5("1"), _md5("2"), _md5("3")]
_P11_SHAS = [_md5("key-5"), _md5("key-6")]


@query(
    "p11_checksum_dispatch",
    oracle=f"""
    SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS md5_key,
           md5('key-' || CAST(o_orderkey AS VARCHAR)) AS sha_key
    FROM orders
    WHERE md5(CAST(o_orderkey AS VARCHAR)) IN ({", ".join(repr(h) for h in _P11_MD5S)})
       OR md5('key-' || CAST(o_orderkey AS VARCHAR)) IN ({", ".join(repr(h) for h in _P11_SHAS)})
    """,
)
def p11_checksum_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: checksum-field dispatch — OR of IN-lists across hash fields
    (packagedb/api.py:455-492). Hash columns are md5-derived from the key so
    the probe literals (computed with hashlib at plan-build time) hit real
    rows at every scale factor."""
    o = load(spark, sf_dir, "orders")
    hashed = o.select(
        "o_orderkey",
        F.md5(F.col("o_orderkey").cast("string")).alias("md5_key"),
        F.md5(F.concat(F.lit("key-"), F.col("o_orderkey").cast("string"))).alias(
            "sha_key"
        ),
    )
    return hashed.filter(
        F.col("md5_key").isin(_P11_MD5S) | F.col("sha_key").isin(_P11_SHAS)
    )
