"""Match-engine queries — SURVEY §2.7 (F1-F5, F8) and §2.4 A5.

Index fingerprints are GENUINE BAH128 bit-majority halohashes
(functions/halohash.py) computed per document over its bag of words —
the same aggregation the reference consumes from matchcode-toolkit — and
the DuckDB oracle recomputes them from first principles
(bah128_fingerprint_sql), so the cascade is verified end-to-end over real
bit-average hashes, not md5 stand-ins.  ``element_count`` is the
fingerprint's own elements_count (the count prefix of the storage form).
Query-side fingerprints are derived from the index by XOR-ing known masks
onto chunks — the FIXTURES.md §5 generator hint — giving three deterministic
classes per query doc:

  doc_id % 10 == 0 -> untouched            => exact match (stage 1)
  doc_id % 15 == 0 -> 40 bits flipped      => banding finds it, hamming rejects
  otherwise        -> 6 bits flipped       => approximate match (stage 2)

plus an element count drifted -2% (inside the ±5% gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.functions.fingerprints import (
    attach_chunks,
    hamming128_sql,
)
from purldb_spark.functions.halohash import bah128_fingerprint_sql
from purldb_spark.operators.matching import (
    banded_candidates,
    cascade,
    hamming_matches,
)
from purldb_spark.plans.fixture_cache import cached_fixture, doc_fingerprint_base
from purldb_spark.plans.registry import query

_LIGHT2, _LIGHT4 = 0x7, 0x38  # 3 + 3 bits -> hamming 6 (< 10: match)
_HEAVY2, _HEAVY4 = 0xFFFFF, 0xFFFFF  # 20 + 20 bits -> hamming 40 (no match)


def _index_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int-chunk view of the session-shared fingerprint base — the cascade
    reuses it in every stage/band branch AND derives the query side from it,
    so the aggregation never runs twice (the r3 regression)."""
    base = doc_fingerprint_base(spark, sf_dir)
    return attach_chunks(
        base.select(
            "doc_id", F.col("elements_count").alias("element_count"), "bah128"
        ),
        "bah128",
    ).drop("bah128")


def _query_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-side fingerprints derived from the ALREADY-materialized index
    frame (never rebuild the aggregation — _index_df is session-cached).

    The final checkpoint is a cheap projection over the cached index RDD; it
    makes the query side its own plan leaf, so the cascade's self-joins
    against the index resolve without shared-subtree ambiguity."""

    def build() -> DataFrame:
        q = _index_df(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
        exact = F.col("doc_id") % 10 == 0
        heavy = F.col("doc_id") % 15 == 0
        mask2 = F.when(exact, 0).when(heavy, _HEAVY2).otherwise(_LIGHT2)
        mask4 = F.when(exact, 0).when(heavy, _HEAVY4).otherwise(_LIGHT4)
        return q.select(
            F.col("doc_id").alias("q_doc_id"),
            F.floor(F.col("element_count") * 0.98)
            .cast("long")
            .alias("q_element_count"),
            F.col("c1").alias("q_c1"),
            F.col("c2").bitwiseXOR(mask2).alias("q_c2"),
            F.col("c3").alias("q_c3"),
            F.col("c4").bitwiseXOR(mask4).alias("q_c4"),
        ).localCheckpoint(eager=True)

    return cached_fixture(spark, f"match_query:{sf_dir}", build)


# shared SQL fragments for the oracle side
_WORDS_SQL = "SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents"

_IDX_SQL = f"""
  SELECT doc_id, elements_count AS element_count,
         CAST('0x' || substr(bah128, 1, 8) AS BIGINT)  AS c1,
         CAST('0x' || substr(bah128, 9, 8) AS BIGINT)  AS c2,
         CAST('0x' || substr(bah128, 17, 8) AS BIGINT) AS c3,
         CAST('0x' || substr(bah128, 25, 8) AS BIGINT) AS c4
  FROM ({bah128_fingerprint_sql(_WORDS_SQL, ["doc_id"], "w")})
"""

_Q_SQL = f"""
  SELECT doc_id AS q_doc_id,
         CAST(floor(element_count * 0.98) AS BIGINT) AS q_element_count,
         c1 AS q_c1,
         xor(c2, CASE WHEN doc_id % 10 = 0 THEN 0
                      WHEN doc_id % 15 = 0 THEN {_HEAVY2}
                      ELSE {_LIGHT2} END) AS q_c2,
         c3 AS q_c3,
         xor(c4, CASE WHEN doc_id % 10 = 0 THEN 0
                      WHEN doc_id % 15 = 0 THEN {_HEAVY4}
                      ELSE {_LIGHT4} END) AS q_c4
  FROM ({_IDX_SQL}) WHERE doc_id % 5 = 0
"""

_HAMMING_SQL = hamming128_sql(
    ["q.q_c1", "q.q_c2", "q.q_c3", "q.q_c4"], ["i.c1", "i.c2", "i.c3", "i.c4"]
)

_GATE_SQL = (
    "i.element_count BETWEEN floor(q.q_element_count * 0.95)"
    " AND floor(q.q_element_count * 1.05)"
)


@query(
    "match_cascade",
    oracle=f"""
    WITH idx AS ({_IDX_SQL}), q AS ({_Q_SQL}),
    exact AS (
      SELECT q.q_doc_id, i.doc_id AS index_doc_id, 0 AS hamming
      FROM q JOIN idx i ON q.q_c1 = i.c1 AND q.q_c2 = i.c2
                       AND q.q_c3 = i.c3 AND q.q_c4 = i.c4
    ),
    remaining AS (
      SELECT * FROM q WHERE q_doc_id NOT IN (SELECT q_doc_id FROM exact)
    ),
    cands AS (
      SELECT DISTINCT q.q_doc_id, q.q_c1, q.q_c2, q.q_c3, q.q_c4,
                      i.doc_id AS index_doc_id, i.c1, i.c2, i.c3, i.c4
      FROM remaining q JOIN idx i
        ON (q.q_c1 = i.c1 OR q.q_c2 = i.c2 OR q.q_c3 = i.c3 OR q.q_c4 = i.c4)
       AND {_GATE_SQL}
    ),
    approx AS (
      SELECT * FROM (
        SELECT q_doc_id, index_doc_id, {hamming128_sql(
            ["q_c1", "q_c2", "q_c3", "q_c4"], ["c1", "c2", "c3", "c4"]
        )} AS hamming
        FROM cands
      ) WHERE hamming < 10
    )
    SELECT q_doc_id, index_doc_id, CAST(hamming AS BIGINT) AS hamming,
           'exact' AS match_type FROM exact
    UNION ALL
    SELECT q_doc_id, index_doc_id, CAST(hamming AS BIGINT) AS hamming,
           'approximate' AS match_type FROM approx
    """,
)
def match_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: the matcher cascade (matchcode/pipelines/matching.py:46-62) as a
    set-oriented two-stage pipeline: exact fingerprint join first, then the
    LSH-banding + hamming stage over only the unmatched remainder
    (anti-join tagging, matchcode/match.py:244-279).

    Note the oracle writes the banding as one OR-join; the Spark plan uses
    the 4-way union of equi-joins deliberately — an OR join condition would
    force a nested-loop/cartesian strategy, the union keeps every branch a
    hash join (SURVEY §4)."""
    idx = _index_df(spark, sf_dir)

    def stage_exact(q: DataFrame) -> DataFrame:
        cond = (
            (q.q_c1 == idx.c1)
            & (q.q_c2 == idx.c2)
            & (q.q_c3 == idx.c3)
            & (q.q_c4 == idx.c4)
        )
        return q.join(idx, cond, "inner").select(
            "q_doc_id",
            idx.doc_id.alias("index_doc_id"),
            F.lit(0).cast("long").alias("hamming"),
        )

    def stage_approx(q: DataFrame) -> DataFrame:
        cands = banded_candidates(q, idx)
        return hamming_matches(cands).select(
            "q_doc_id",
            F.col("doc_id").alias("index_doc_id"),
            F.col("hamming").cast("long").alias("hamming"),
        )

    return cascade(
        _query_df(spark, sf_dir),
        [("exact", stage_exact), ("approximate", stage_approx)],
        "q_doc_id",
    )


# f5 size-band width: |Δn_chars| <= _F5_BUCKET implies the floor-bucket ids
# differ by <= 1, which is what makes the ±1 banded join lossless for any
# query whose nearest candidate is within the band.
_F5_BUCKET = 128


@query(
    "f5_rank_tiebreak",
    oracle="""
    WITH q AS (SELECT * FROM documents WHERE doc_id % 10 = 0),
    sized AS (
      SELECT q.doc_id AS q_doc_id, i.doc_id AS cand_doc_id,
             abs(q.n_chars - i.n_chars) AS size_diff,
             substr(q.text, 1, 24) AS q_head, substr(i.text, 1, 24) AS i_head,
             min(abs(q.n_chars - i.n_chars)) OVER (PARTITION BY q.doc_id)
               AS min_size_diff
      FROM q JOIN documents i ON q.lang = i.lang AND q.doc_id <> i.doc_id
    ),
    tier AS (SELECT * FROM sized WHERE size_diff = min_size_diff),
    scored AS (
      SELECT q_doc_id, cand_doc_id, size_diff,
             levenshtein(q_head, i_head) AS name_dist,
             row_number() OVER (
               PARTITION BY q_doc_id
               ORDER BY levenshtein(q_head, i_head), cand_doc_id
             ) AS rn
      FROM tier
    )
    SELECT q_doc_id, cand_doc_id, CAST(size_diff AS BIGINT) AS size_diff,
           CAST(name_dist AS BIGINT) AS name_dist
    FROM scored WHERE rn = 1
    """,
)
def f5_rank_tiebreak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/W5: tie-break heuristics — candidates ranked by
    (size difference, name edit distance) and only the best kept
    (matchcode/models.py:339-366; levenshtein is the declared substitute for
    SequenceMatcher.ratio, available in both engines).

    Plan: the candidate join is BANDED on (lang, size_bucket) with the query
    exploded into its own ±1 buckets — |Δsize| <= B implies the bucket ids
    differ by at most 1, so every candidate within B lands in the window.
    Queries whose window min is <= B provably have their whole global
    min-size_diff tier inside the window (tests/test_properties.py proves
    containment); the rare query with no size-similar candidate falls back
    to the exact per-lang join. The expensive edit distance still runs only
    on the final tier. At 100 TB the banded join keys are (lang, bucket) —
    high cardinality — instead of the handful of langs, so no per-key
    quadratic group survives."""
    from pyspark.sql import Window as W

    B = _F5_BUCKET
    idx = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("cand_doc_id"),
        "lang",
        F.col("n_chars").alias("i_chars"),
        F.substring("text", 1, 24).alias("i_head"),
        F.floor(F.col("n_chars") / B).alias("bucket"),
    )
    q = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            F.col("doc_id").alias("q_doc_id"),
            "lang",
            F.col("n_chars").alias("q_chars"),
            F.substring("text", 1, 24).alias("q_head"),
            F.floor(F.col("n_chars") / B).alias("q_bucket"),
        )
    )

    def sized_of(joined: DataFrame) -> DataFrame:
        return joined.select(
            "q_doc_id",
            "cand_doc_id",
            F.abs(F.col("q_chars") - F.col("i_chars")).alias("size_diff"),
            "q_head",
            "i_head",
        ).withColumn(
            "min_size_diff", F.min("size_diff").over(W.partitionBy("q_doc_id"))
        )

    q_exp = q.withColumn(
        "bucket",
        F.explode(
            F.array(F.col("q_bucket") - 1, F.col("q_bucket"), F.col("q_bucket") + 1)
        ),
    )
    sized_b = sized_of(
        q_exp.join(idx, ["lang", "bucket"], "inner").filter(
            F.col("q_doc_id") != F.col("cand_doc_id")
        )
    )
    # window min <= B => the global tier is contained in the window (proof in
    # test_properties); those queries are done. The rest re-run exactly.
    safe_tier = sized_b.filter(
        (F.col("min_size_diff") <= B) & (F.col("size_diff") == F.col("min_size_diff"))
    )
    safe_ids = (
        sized_b.filter(F.col("min_size_diff") <= B).select("q_doc_id").dropDuplicates()
    )
    q_unsafe = q.join(safe_ids, "q_doc_id", "left_anti")
    sized_u = sized_of(
        q_unsafe.join(idx, "lang", "inner").filter(
            F.col("q_doc_id") != F.col("cand_doc_id")
        )
    )
    tier = safe_tier.unionByName(
        sized_u.filter(F.col("size_diff") == F.col("min_size_diff"))
    )

    scored = tier.withColumn(
        "name_dist", F.levenshtein("q_head", "i_head").cast("long")
    )
    w = W.partitionBy("q_doc_id").orderBy("name_dist", "cand_doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("q_doc_id", "cand_doc_id", "size_diff", "name_dist")
    )


_SHINGLES_SQL = """
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       unnest(generate_series(1, len(w) - 2)) AS t(i)
"""


@query(
    "a5_snippet_jaccard",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS intersection
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, intersection,
           CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) >= 0.3
    """,
)
def a5_snippet_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: snippet jaccard |q∩r| / (|q|+|r|-|q∩r|)
    (matchcode/models.py:569-579) over word-3-gram shingle sets, via the
    inverted-index self-join (J8 shape): explode distinct shingles, join on
    shingle, count intersections per pair, divide by exact set sizes.

    Scale: the pair blow-up is bounded by shingle frequency — at 100 TB add
    a document-frequency cap (drop shingles appearing in >k docs, they carry
    no signal), which is also what makes MinHash-LSH (q_llm) the preferred
    path; this operator is the exact verifier behind it."""
    from purldb_spark.plans.fixture_cache import doc_shingles

    shingles = doc_shingles(spark, sf_dir)
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
            "inner",
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard",
            F.col("intersection").cast("double")
            / (F.col("sa.n") + F.col("sb.n") - F.col("intersection")),
        )
        .filter(F.col("jaccard") >= 0.3)
        .select("doc_a", "doc_b", "intersection", "jaccard")
    )
    return out


@query(
    "match_cascade_full",
    oracle=f"""
    WITH idx AS ({_IDX_SQL}), q AS ({_Q_SQL}),
    exact AS (
      SELECT q.q_doc_id, i.doc_id AS index_doc_id, 0 AS hamming
      FROM q JOIN idx i ON q.q_c1 = i.c1 AND q.q_c2 = i.c2
                       AND q.q_c3 = i.c3 AND q.q_c4 = i.c4
    ),
    rem1 AS (SELECT * FROM q WHERE q_doc_id NOT IN (SELECT q_doc_id FROM exact)),
    cands AS (
      SELECT DISTINCT q.q_doc_id, q.q_c1, q.q_c2, q.q_c3, q.q_c4,
                      i.doc_id AS index_doc_id, i.c1, i.c2, i.c3, i.c4
      FROM rem1 q JOIN idx i
        ON (q.q_c1 = i.c1 OR q.q_c2 = i.c2 OR q.q_c3 = i.c3 OR q.q_c4 = i.c4)
       AND {_GATE_SQL}
    ),
    approx AS (
      SELECT * FROM (
        SELECT q_doc_id, index_doc_id, {hamming128_sql(
            ["q_c1", "q_c2", "q_c3", "q_c4"], ["c1", "c2", "c3", "c4"]
        )} AS hamming
        FROM cands
      ) WHERE hamming < 10
    ),
    rem2 AS (
      SELECT q_doc_id FROM rem1
      WHERE q_doc_id NOT IN (SELECT q_doc_id FROM approx)
    ),
    shingles AS ({_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    content AS (
      SELECT s.q_doc_id, s.index_doc_id, -1 AS hamming FROM (
        SELECT a.doc_id AS q_doc_id, b.doc_id AS index_doc_id,
               count(*) AS inter
        FROM rem2 r
        JOIN shingles a ON a.doc_id = r.q_doc_id
        JOIN shingles b ON b.sh = a.sh
        GROUP BY a.doc_id, b.doc_id
      ) s
      JOIN sizes sa ON sa.doc_id = s.q_doc_id
      JOIN sizes sb ON sb.doc_id = s.index_doc_id
      WHERE CAST(s.inter AS DOUBLE) / (sa.n + sb.n - s.inter) >= 0.5
    )
    SELECT q_doc_id, index_doc_id, CAST(hamming AS BIGINT) AS hamming,
           'exact' AS match_type FROM exact
    UNION ALL
    SELECT q_doc_id, index_doc_id, CAST(hamming AS BIGINT) AS hamming,
           'approximate' AS match_type FROM approx
    UNION ALL
    SELECT q_doc_id, index_doc_id, CAST(hamming AS BIGINT) AS hamming,
           'content' AS match_type FROM content
    """,
)
def match_cascade_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 complete: the reference's full matcher order — exact fingerprint,
    approximate (banding+hamming), then CONTENT matching (shingle jaccard,
    the snippet matcher's algebra) for whatever survives both fingerprint
    stages (matchcode/pipelines/matching.py:46-62 runs matchers cheapest to
    most expensive for exactly this reason).

    The heavy-perturbed query class (fingerprint destroyed, 40 bits flipped)
    is unmatchable by stages 1-2 but its TEXT is intact — stage 3 recovers
    it by content, which is the cascade's whole point: each stage only pays
    for the previous stages' failures."""
    idx = _index_df(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")

    def stage_exact(q: DataFrame) -> DataFrame:
        cond = (
            (q.q_c1 == idx.c1)
            & (q.q_c2 == idx.c2)
            & (q.q_c3 == idx.c3)
            & (q.q_c4 == idx.c4)
        )
        return q.join(idx, cond, "inner").select(
            "q_doc_id",
            idx.doc_id.alias("index_doc_id"),
            F.lit(0).cast("long").alias("hamming"),
        )

    def stage_approx(q: DataFrame) -> DataFrame:
        cands = banded_candidates(q, idx)
        return hamming_matches(cands).select(
            "q_doc_id",
            F.col("doc_id").alias("index_doc_id"),
            F.col("hamming").cast("long").alias("hamming"),
        )

    def stage_content(q: DataFrame) -> DataFrame:
        from purldb_spark.plans.fixture_cache import doc_shingles

        sh = doc_shingles(spark, sf_dir)
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        q_sh = sh.join(
            q.select(F.col("q_doc_id").alias("doc_id")), "doc_id", "left_semi"
        ).withColumnRenamed("doc_id", "q_doc_id")
        inter = (
            q_sh.join(sh, "sh")
            .groupBy("q_doc_id", F.col("doc_id").alias("index_doc_id"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        sa = sizes.withColumnRenamed("doc_id", "q_doc_id").withColumnRenamed("n", "na")
        sb = sizes.withColumnRenamed("doc_id", "index_doc_id").withColumnRenamed(
            "n", "nb"
        )
        return (
            inter.join(sa, "q_doc_id")
            .join(sb, "index_doc_id")
            .filter(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter"))
                >= 0.5
            )
            .select(
                "q_doc_id",
                "index_doc_id",
                F.lit(-1).cast("long").alias("hamming"),
            )
        )

    return cascade(
        _query_df(spark, sf_dir),
        [
            ("exact", stage_exact),
            ("approximate", stage_approx),
            ("content", stage_content),
        ],
        "q_doc_id",
    )
