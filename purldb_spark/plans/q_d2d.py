"""D2D request-intake query (operators/d2d.py — reference
matchcode/api.py:454-566 D2DViewSet/D2DSerializer, purldb/urls.py:58).
Fixture covers the endpoint's response matrix: clean from/to url pair,
textarea submission with embedded newlines + blank lines, unreachable-url
rejection with the literal error message, and blank-element dropping."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.operators.d2d import (
    D2D_DESCRIPTION,
    MSG_COULD_NOT_FETCH,
    RUN_NOT_STARTED,
    d2d_create,
)
from purldb_spark.plans.registry import query

_NAME_SQL = "lower(replace(p_brand, '#', '-')) || '-' || CAST(p_partkey AS VARCHAR)"
_FROM_SQL = "'https://repo.example.org/' || name || '-from.zip#from'"
_TO_SQL = "'https://repo.example.org/' || name || '-to.zip#to'"


@query(
    "x_d2d_request",
    oracle=f"""
    WITH base AS (
      SELECT p_partkey AS k, {_NAME_SQL} AS name FROM part
    ),
    u AS (
      SELECT k, {_FROM_SQL} AS u_from, {_TO_SQL} AS u_to FROM base
    )
    SELECT k AS request_id, 'created' AS status, CAST(NULL AS VARCHAR) AS error,
           'd2d-' || CAST(k AS VARCHAR) AS project_name,
           u_from || '|' || u_to AS input_sources,
           'd2d' AS pipeline_name, 'Java,Javascript,Elf,Go' AS selected_groups,
           '{RUN_NOT_STARTED}' AS run_status,
           '{D2D_DESCRIPTION}' AS run_description
    FROM u WHERE k % 4 = 0
    UNION ALL
    SELECT k, 'created', CAST(NULL AS VARCHAR), 'd2d-' || CAST(k AS VARCHAR),
           u_from || '|' || u_to,
           'd2d', 'Java,Javascript,Elf,Go', '{RUN_NOT_STARTED}',
           '{D2D_DESCRIPTION}'
    FROM u WHERE k % 8 = 1
    UNION ALL
    SELECT k, 'created', CAST(NULL AS VARCHAR), 'd2d-' || CAST(k AS VARCHAR),
           u_from || '|' || u_to || '|' || u_from,
           'd2d', 'Java,Javascript,Elf,Go', '{RUN_NOT_STARTED}',
           '{D2D_DESCRIPTION}'
    FROM u WHERE k % 8 = 5
    UNION ALL
    SELECT k, 'error',
           '{MSG_COULD_NOT_FETCH}' || u_from,
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM u WHERE k % 4 = 2
    UNION ALL
    SELECT k, 'created', CAST(NULL AS VARCHAR), 'd2d-' || CAST(k AS VARCHAR),
           u_to,
           'd2d', 'Java,Javascript,Elf,Go', '{RUN_NOT_STARTED}',
           '{D2D_DESCRIPTION}'
    FROM u WHERE k % 4 = 3
    """,
)
def x_d2d_request(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/api/d2d as a batch pass: one request row per part key —
    k%4=0 a clean [#from, #to] pair; k%8=1 the same pair POSTed as ONE
    textarea string with embedded newlines and a trailing blank line
    (normalized per matchcode/api.py:549-556); k%8=5 TWO textarea elements,
    exercising the reference's mid-loop input_urls rebinding (the second
    textarea yields only the first line of the first — api.py:551); k%4=2
    an unreachable from-url (whole request rejected with the api.py:542
    message); k%4=3 a list with a whitespace-only element (dropped,
    api.py:553-556)."""
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    name = F.concat(
        F.lower(F.replace(F.col("p_brand"), F.lit("#"), F.lit("-"))),
        F.lit("-"),
        k.cast("string"),
    )
    u_from = F.concat(
        F.lit("https://repo.example.org/"), name, F.lit("-from.zip#from")
    )
    u_to = F.concat(F.lit("https://repo.example.org/"), name, F.lit("-to.zip#to"))
    input_urls = (
        F.when(k % 4 == 0, F.array(u_from, u_to))
        .when(
            k % 8 == 1,
            # one textarea string: urls newline-joined, padded, blank line
            F.array(
                F.concat(
                    F.lit(" "), u_from, F.lit("\n"), u_to, F.lit("\n\n ")
                )
            ),
        )
        .when(
            k % 8 == 5,
            # TWO textarea elements: the reference rebinds input_urls after
            # the first split (matchcode/api.py:551), so the second textarea
            # contributes only the first line of the FIRST one — expected
            # input_sources is from|to|from, not from|to|to|from
            F.array(
                F.concat(
                    F.lit(" "), u_from, F.lit("\n"), u_to, F.lit("\n\n ")
                ),
                F.concat(u_to, F.lit("\n"), u_from),
            ),
        )
        .when(k % 4 == 2, F.array(u_from, u_to))
        .otherwise(F.array(F.lit("   "), u_to))
    )
    unreachable = F.when(k % 4 == 2, F.array(u_from)).otherwise(
        F.array().cast("array<string>")
    )
    requests = p.select(
        k.cast("long").alias("request_id"),
        input_urls.alias("input_urls"),
        unreachable.alias("unreachable"),
    )
    return d2d_create(requests)
