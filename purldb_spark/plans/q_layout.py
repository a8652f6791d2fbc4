"""Data LAYOUT optimization as a first-class query (beyond-reference):
Z-order (Morton curve) clustering and the file-skipping win it buys.

At 100 TB the scan cost of a 2-dimensional predicate is decided before the
query runs — by how the writer laid rows into files. Sorting by one key
clusters that key perfectly and scatters every other; interleaving the
bits of two keys (the Morton / Z-order curve, the layout behind Delta
Lake's OPTIMIZE ZORDER BY and Hudi/Iceberg clustering) keeps BOTH keys'
per-file min/max ranges narrow, so a (key1 range AND key2 range) predicate
prunes most files from their footer stats alone.

``layout_zorder_skipping`` measures exactly that, relationally: bucket the
fact table 64 ways under three writer layouts (insertion order, single-key
sort, Z-order), compute each bucket's min/max envelope per dimension — the
parquet footer stats a scan planner consults — and report how many buckets
a fixed 2-dim predicate must touch under each layout. The result is the
data-skipping dashboard row a table-maintenance job publishes after a
re-cluster.

Determinism: the Morton value is a pure BIGINT bit-interleave (a fold over
16 bit positions — shifts and modulo only, no floats); buckets are
ntile(64) over a totally ordered sort (layout key, then the fact's primary
key as tie-break), so both engines produce identical bucket envelopes.

Scale shape: ntile here stands in for the writer's range partitioner — at
100 TB the same z-value feeds repartitionByRange(n_files) + sortWithinPartitions
at WRITE time (a one-off O(N log N) shuffle in the maintenance job, amortized
over every subsequent scan), and the envelope aggregation is the metadata
pass over file footers, O(n_files) not O(rows). The query's only wide
operations are the bucket assignment sort and a 3 x 64-row envelope agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query

_NB = 64  # buckets ~ files a maintenance job would write

# the fixed 2-dim predicate whose pruning we report: a ~5% slab per dim
_P_LO, _P_HI = 100, 199        # l_partkey
_S_LO, _S_HI = 10, 19          # l_suppkey

# Each dim is min-max scaled to 16 bits BEFORE interleaving — the Morton
# pitfall this avoids: with raw keys of unequal magnitude (x spans ~20x
# more values than y here) the wider key's high bits all land ABOVE the
# narrow key's top bit and the "interleaved" curve degenerates into a
# plain x sort. Production z-ordering does the same normalization
# (rank/range scaling per column). Integer arithmetic only:
# ((v - lo) * 65535) div max(hi - lo, 1).
_NORM_SPARK = "(({v} - {lo}) * 65535L) div greatest({hi} - {lo}, 1)"
_NORM_SQL = (
    "(({v} - {lo}) * CAST(65535 AS BIGINT)) // greatest({hi} - {lo}, 1)"
)

# Morton interleave of the 16 normalized bits of x (odd positions) and y
# (even).  r15: closed-form bit-spreading (the classic magic-mask dilation)
# instead of the r12 aggregate(sequence(0,15), ...) fold — higher-order
# functions are interpreted per element in Spark (no whole-stage codegen),
# and the fold measured 2.3 s of the query's wall at sf0.1 (~4 µs/row);
# the mask form is plain shifts/AND/OR, codegens, and is bit-identical
# (spread(x)<<1 | spread(y) == the fold's Σ bit placement; verified by the
# unchanged DuckDB oracle which still computes the explicit per-bit sum).
def _spread16(v: str) -> str:
    """Dilate the low 16 bits of `v` so bit i lands at bit 2i."""
    s = f"({v} | shiftleft({v}, 8)) & 16711935"        # 0x00FF00FF
    s = f"(({s}) | shiftleft(({s}), 4)) & 252645135"   # 0x0F0F0F0F
    s = f"(({s}) | shiftleft(({s}), 2)) & 858993459"   # 0x33333333
    s = f"(({s}) | shiftleft(({s}), 1)) & 1431655765"  # 0x55555555
    return f"({s})"


_Z_SPARK = (
    f"shiftleft({_spread16('xn')}, 1) + {_spread16('yn')}"
)
_Z_SQL = (
    "list_sum(list_transform(range(0, 16), i ->"
    " ((xn // (CAST(1 AS BIGINT) << i)) % 2) * (CAST(1 AS BIGINT) << (2 * i + 1))"
    " + ((yn // (CAST(1 AS BIGINT) << i)) % 2) * (CAST(1 AS BIGINT) << (2 * i))))"
)


@query(
    "layout_zorder_skipping",
    oracle=f"""
    WITH stats AS (
      SELECT min(l_partkey) AS x_min, max(l_partkey) AS x_max,
             min(l_suppkey) AS y_min, max(l_suppkey) AS y_max
      FROM lineitem
    ),
    normed AS (
      SELECT l_orderkey, l_linenumber,
             l_partkey AS x, l_suppkey AS y,
             {_NORM_SQL.format(v="l_partkey", lo="s.x_min", hi="s.x_max")}
               AS xn,
             {_NORM_SQL.format(v="l_suppkey", lo="s.y_min", hi="s.y_max")}
               AS yn
      FROM lineitem CROSS JOIN stats s
    ),
    fact AS (
      SELECT l_orderkey, l_linenumber, x, y,
             {_Z_SQL} AS z
      FROM normed
    ),
    bucketed AS (
      SELECT x, y,
             ntile({_NB}) OVER (ORDER BY l_orderkey, l_linenumber)
               AS b_insert,
             ntile({_NB}) OVER (ORDER BY x, l_orderkey, l_linenumber)
               AS b_single,
             ntile({_NB}) OVER (ORDER BY z, l_orderkey, l_linenumber)
               AS b_zorder
      FROM fact
    ),
    tall AS (
      SELECT 'insertion' AS layout, b_insert AS b, x, y FROM bucketed
      UNION ALL
      SELECT 'single_key', b_single, x, y FROM bucketed
      UNION ALL
      SELECT 'zorder', b_zorder, x, y FROM bucketed
    ),
    envelopes AS (
      SELECT layout, b,
             min(x) AS x_lo, max(x) AS x_hi,
             min(y) AS y_lo, max(y) AS y_hi,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) FILTER (WHERE x BETWEEN {_P_LO} AND {_P_HI}
                                     AND y BETWEEN {_S_LO} AND {_S_HI})
                  AS BIGINT) AS n_match_xy,
             CAST(count(*) FILTER (WHERE y BETWEEN {_S_LO} AND {_S_HI})
                  AS BIGINT) AS n_match_y
      FROM tall GROUP BY layout, b
    )
    SELECT layout, 'xy_slab' AS predicate,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(count(*) FILTER (WHERE x_lo <= {_P_HI} AND x_hi >= {_P_LO}
                                   AND y_lo <= {_S_HI} AND y_hi >= {_S_LO})
                AS BIGINT) AS n_touched,
           CAST(COALESCE(sum(n_rows) FILTER (
                  WHERE x_lo <= {_P_HI} AND x_hi >= {_P_LO}
                    AND y_lo <= {_S_HI} AND y_hi >= {_S_LO}), 0)
                AS BIGINT) AS rows_scanned,
           CAST(COALESCE(sum(n_match_xy), 0) AS BIGINT) AS rows_matching
    FROM envelopes GROUP BY layout
    UNION ALL
    SELECT layout, 'y_slab' AS predicate,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(count(*) FILTER (WHERE y_lo <= {_S_HI} AND y_hi >= {_S_LO})
                AS BIGINT) AS n_touched,
           CAST(COALESCE(sum(n_rows) FILTER (
                  WHERE y_lo <= {_S_HI} AND y_hi >= {_S_LO}), 0)
                AS BIGINT) AS rows_scanned,
           CAST(COALESCE(sum(n_match_y), 0) AS BIGINT) AS rows_matching
    FROM envelopes GROUP BY layout
    """,
)
def layout_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-layout file-skipping report for two predicates — the 2-dim
    slab (x AND y ranges) and the y-only slab: 3 layouts x 2 predicates =
    6 rows, each with the bucket count a min-max-pruning scan planner
    would actually touch and the rows behind those buckets.
    `rows_matching` is layout-invariant per predicate (same data, same
    filter) — a built-in cross-layout consistency check;
    `n_touched`/`rows_scanned` is the layout's win.

    The two predicates together are the Z-order argument: single-key sort
    on x prunes x predicates perfectly but leaves EVERY bucket touched for
    the y-only slab (y is uniformly scattered), while Z-order keeps both
    dims' envelopes narrow — near-optimal on xy and still pruning most
    buckets on y alone. Insertion order prunes nothing on either.

    One fact scan computes both dimension keys and the Morton value; each
    layout's bucket assignment is a DISTRIBUTED exact rank (prefix-group
    the rows by the leading bits of the layout key — a monotone function
    of the sort order, so within-group rank + a broadcast cumulative
    offset IS the global rank — then fold rank into ntile's first-buckets-
    get-the-remainder formula). No single-partition window anywhere: the
    oracle's plain ntile() over a global ORDER BY produces the identical
    bucket for every row, but the Spark plan sorts ~{_NB}-way in parallel,
    which is also exactly how the write-time repartitionByRange job runs.
    The envelope agg collapses to 3 x {_NB} rows with per-predicate match
    counts, and the report unions the two 3-row pruning summaries."""
    li = load(spark, sf_dir, "lineitem")
    # per-dim min/max AND the row count as driver scalars in ONE job (the
    # r15 fold: the count previously ran as its own job over the
    # checkpointed fact; the documented BNLJ-avoidance pattern either way
    # — the oracle's CROSS JOIN stats is the same 1-row frame on DuckDB)
    x_min, x_max, y_min, y_max, ok_min, ok_max, n_rows = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.count(F.lit(1)),
    ).first()

    from pyspark.sql.window import Window

    q, r = divmod(n_rows, _NB) if n_rows else (0, 0)
    head = r * (q + 1)
    # SQL ntile semantics, integer-exact: the first r buckets hold q+1
    # rows each, the rest hold q
    _NTILE_EXPR = (
        f"cast(case when _rank <= {head} then (_rank - 1) div {q + 1}"
        f" else {r} + (_rank - {head} - 1) div {max(q, 1)} end + 1 as int)"
    )

    # prefixes: leading bits of each layout's sort key (monotone); group
    # counts stay bounded (<= ~hundreds) at any corpus size.  The
    # insertion divisor derives from the OBSERVED key RANGE (min AND max —
    # ~64 groups at every sf): a fixed literal divisor put all rows in one
    # group below sf~10, and an ok_max-only divisor collapses the same way
    # on a range-concentrated key (r9 advice — e.g. orderkeys clustered
    # near the max). When even the range is degenerate (< 64 distinct-key
    # span), extend the prefix with the tie-break column l_linenumber —
    # (l_orderkey, l_linenumber) is the sort order itself, so the composite
    # stays monotone/contiguous and a constant orderkey still fans out
    # across the linenumber values; xn and z are already range-normalized
    # so their divisors are constants
    ok_rng = int(ok_max) - int(ok_min) if ok_max is not None else 0
    if ok_rng >= 64:
        ins_prefix = (
            f"(l_orderkey - {int(ok_min)}) div {max(ok_rng // 64, 1)}"
        )
    else:
        ins_prefix = (
            f"(l_orderkey - {int(ok_min) if ok_max is not None else 0})"
            " * 8 + least(l_linenumber, 7)"
        )

    # r15 reshape (guide §2.4: fewer exchanges, same bytes): the three
    # layouts are independent rank problems over the same fact rows, but
    # running them as three separate repartition->offsets->window subtrees
    # paid 3 exchanges, 3 offset aggs, 3 broadcast joins and an eager
    # checkpoint of the Morton fold (the r12 shape needed the checkpoint
    # precisely because three subtrees would re-execute the fold).  One
    # map-side explode emits each row once per layout tagged with
    # (layout, sort keys s1..s3, prefix group _g) — the Morton fold is
    # computed ONCE per row, map-only, so the checkpoint job disappears —
    # and ONE repartition by (layout, _g) + ONE offsets agg + ONE
    # broadcast join + ONE per-group window ranks all three layouts in
    # parallel.  Shuffle bytes are identical (3N thin rows either way);
    # exchange count drops 3 -> 1 and the job count drops from ~7 eager
    # steps to 2 (stats agg + the offsets broadcast inside the plan).
    from purldb_spark.conf import shuffle_partitions

    xn_e = _NORM_SPARK.format(v="l_partkey", lo=int(x_min), hi=int(x_max))
    yn_e = _NORM_SPARK.format(v="l_suppkey", lo=int(y_min), hi=int(y_max))
    z_e = _Z_SPARK
    tagged = li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "l_partkey AS x",
        "l_suppkey AS y",
        f"{xn_e} AS xn",
        f"{yn_e} AS yn",
    ).selectExpr(
        "*",
        f"{z_e} AS z",
    ).selectExpr(
        # one struct per layout: (layout, _g, s1, s2, s3); sort order
        # within a layout is (s1, s2, s3) == the original order_cols
        f"""explode(array(
              struct('insertion'  AS layout, {ins_prefix} AS _g,
                     l_orderkey AS s1, l_linenumber AS s2, 0L AS s3),
              struct('single_key' AS layout, xn div 1024 AS _g,
                     x AS s1, l_orderkey AS s2, l_linenumber AS s3),
              struct('zorder'     AS layout, z div 67108864 AS _g,
                     z AS s1, l_orderkey AS s2, l_linenumber AS s3)
            )) AS t""",
        "x",
        "y",
    ).selectExpr("t.layout AS layout", "t._g AS _g",
                 "t.s1 AS s1", "t.s2 AS s2", "t.s3 AS s3", "x", "y")

    n_part = shuffle_partitions(spark)
    # explicit width: AQE would coalesce the post-join exchange to a few
    # fat partitions and serialize the window sorts
    with_g = tagged.repartition(n_part, "layout", "_g")
    offs = (
        with_g.groupBy("layout", "_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_c").over(
                    Window.partitionBy("layout")
                    .orderBy("_g")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("_c")
    )
    w = Window.partitionBy("layout", "_g").orderBy("s1", "s2", "s3")
    tall = (
        with_g.join(F.broadcast(offs), ["layout", "_g"])
        .withColumn("_rank", F.row_number().over(w) + F.col("_off"))
        .withColumn("b", F.expr(_NTILE_EXPR))
        .select("layout", "b", "x", "y")
    )
    in_xy = (
        F.col("x").between(_P_LO, _P_HI) & F.col("y").between(_S_LO, _S_HI)
    ).cast("long")
    in_y = F.col("y").between(_S_LO, _S_HI).cast("long")
    env = tall.groupBy("layout", "b").agg(
        F.min("x").alias("x_lo"),
        F.max("x").alias("x_hi"),
        F.min("y").alias("y_lo"),
        F.max("y").alias("y_hi"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(in_xy), F.lit(0)).cast("long").alias("n_match_xy"),
        F.coalesce(F.sum(in_y), F.lit(0)).cast("long").alias("n_match_y"),
    ).localCheckpoint(eager=True)  # 3 x _NB rows; reused by both reports

    def report(pred_name: str, touched, match_col: str) -> DataFrame:
        return env.groupBy("layout").agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.coalesce(F.sum(touched.cast("long")), F.lit(0))
            .cast("long")
            .alias("n_touched"),
            F.coalesce(
                F.sum(F.when(touched, F.col("n_rows")).otherwise(F.lit(0))),
                F.lit(0),
            )
            .cast("long")
            .alias("rows_scanned"),
            F.coalesce(F.sum(match_col), F.lit(0))
            .cast("long")
            .alias("rows_matching"),
        ).select(
            "layout",
            F.lit(pred_name).alias("predicate"),
            "n_buckets",
            "n_touched",
            "rows_scanned",
            "rows_matching",
        )

    t_xy = (
        (F.col("x_lo") <= _P_HI)
        & (F.col("x_hi") >= _P_LO)
        & (F.col("y_lo") <= _S_HI)
        & (F.col("y_hi") >= _S_LO)
    )
    t_y = (F.col("y_lo") <= _S_HI) & (F.col("y_hi") >= _S_LO)
    return report("xy_slab", t_xy, "n_match_xy").unionByName(
        report("y_slab", t_y, "n_match_y")
    )
