"""Training-data SELECTION family: DSIR importance resampling and
ExactSubstr-style repeated-span scrubbing.

Beyond-reference ops (the purldb reference has no ML-corpus tooling;
SURVEY.md §8): these are the data-selection steps a 100 TB pretraining
pipeline runs between dedup and assembly.

  select_dsir               -> hashed-n-gram importance resampling
                               (Xie et al. 2023, "Data Selection for
                               Language Models via Importance Resampling")
  text_repeated_span_scrub  -> corpus-wide duplicated-token-span removal
                               keeping the first occurrence (the ExactSubstr
                               policy of Lee et al. 2021, "Deduplicating
                               Training Data Makes Language Models Better",
                               re-expressed on word 10-grams)
  text_tfidf_neighbors      -> IDF-weighted sparse cosine top-n neighbors
                               over the shared shingle fixture (df-capped
                               inverted index)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query

# ---------------------------------------------------------------------------
# select_dsir
# ---------------------------------------------------------------------------

_B = 1024         # hashed-unigram feature buckets
_KSEL = 100       # resampled corpus size (Gumbel-top-k)
_SEED = "dsir"    # shared md5 seed for the Gumbel uniforms

# the "target" distribution: the labeled-English slice (stand-in for the
# Wikipedia/books target corpus of the paper — the synthetic languages
# have genuinely different stopword distributions, so the hashed-unigram
# ratio carries real signal); raw = the whole pool
_TARGET_PRED_SPARK = "lang = 'en'"
_TARGET_PRED_SQL = _TARGET_PRED_SPARK

# md5-derived unigram bucket in [0, 1024): the cross-engine hash convention
# of operators/assemble.py (first 8 md5 hex chars as an integer)
_BUCKET_SPARK = (
    "pmod(cast(conv(substring(md5({w}), 1, 8), 16, 10) as bigint), 1024)"
)
_BUCKET_SQL = (
    "CAST(CAST(concat('0x', substring(md5({w}), 1, 8)) AS UBIGINT)"
    " % 1024 AS BIGINT)"
)

# Gumbel noise from the shared uniform-hash convention; u is offset by 0.5
# so it can never hit 0 or 1 (both logs stay finite)
_GUMBEL_SPARK = (
    "cast(floor(1000000.0 * -ln(-ln("
    "(cast(conv(substring(md5(concat('dsir|', cast(doc_id as string))),"
    " 1, 8), 16, 10) as double) + 0.5) / 4294967296.0"
    "))) as bigint)"
)
_GUMBEL_SQL = (
    "CAST(floor(1000000.0 * -ln(-ln("
    "(CAST(CAST(concat('0x', substring(md5('dsir|' ||"
    " CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS DOUBLE) + 0.5)"
    " / 4294967296.0"
    "))) AS BIGINT)"
)


@query(
    "select_dsir",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, ({_TARGET_PRED_SQL}) AS is_t, u.wd
      FROM documents, LATERAL unnest(string_split(text, ' ')) u(wd)
    ),
    bucketed AS (
      SELECT doc_id, is_t, {_BUCKET_SQL.format(w="wd")} AS b FROM toks
    ),
    counts AS (
      SELECT r.b,
             COALESCE(SUM(CASE WHEN t.is_t THEN 1 ELSE 0 END), 0) AS ct,
             COALESCE(COUNT(t.b), 0) AS cr
      FROM range({_B}) r(b) LEFT JOIN bucketed t ON t.b = r.b
      GROUP BY r.b
    ),
    totals AS (
      SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM counts
    ),
    lr AS (
      SELECT c.b,
             CAST(floor(1000000.0 * (
               ln(CAST(c.ct + 1 AS DOUBLE)) - ln(CAST(t.tt + {_B} AS DOUBLE))
               - ln(CAST(c.cr + 1 AS DOUBLE)) + ln(CAST(t.tr + {_B} AS DOUBLE))
             )) AS BIGINT) AS l
      FROM counts c, totals t
    ),
    scored AS (
      SELECT t.doc_id, CAST(SUM(lr.l) AS BIGINT) AS log_w
      FROM bucketed t JOIN lr ON lr.b = t.b
      GROUP BY t.doc_id
    )
    SELECT doc_id, log_w, log_w + {_GUMBEL_SQL} AS key
    FROM scored
    ORDER BY key DESC, doc_id
    LIMIT {_KSEL}
    """,
)
def select_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): estimate hashed-unigram
    bucket distributions for a curated TARGET slice and for the RAW pool,
    weight every raw document by its importance log-ratio
    sum_tokens[ln p_target(b) - ln p_raw(b)] (add-1 smoothed), and resample
    the top-k by Gumbel-perturbed weight (Gumbel-top-k == sampling without
    replacement proportional to w, made deterministic by drawing the
    uniforms from the shared md5 convention of operators/assemble.py).

    Determinism contract: the per-bucket log-ratio is snapped to a 1e-6
    integer grid (floor(1e6 * lr) as BIGINT — ln comes from the same libm
    on both engines, and a 1-ulp input difference flips the floor only
    within 1 ulp of a grid boundary); per-document scores are then exact
    BIGINT sums, associative and order-free, and the Gumbel key is snapped
    the same way.

    Scale shape: the bucket histograms are ONE map-side-combined groupBy
    collapsing 100 TB to 2x1024 driver-side counts (the trained "model",
    same split as fixture_cache.trained_centroids); scoring is map-only —
    the 1024 log-ratios ride along as a literal array and each document
    folds its own tokens, no explode shuffle, no join; selection is a
    distributed TakeOrdered top-k. The paper's full pipeline (train on
    selected docs) starts from exactly this selected-id table."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(
            F.expr(f"({_TARGET_PRED_SPARK})").alias("is_t"),
            F.explode(F.split("text", " ")).alias("wd"),
        )
        .select(
            "is_t", F.expr(_BUCKET_SPARK.format(w="wd")).alias("b")
        )
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
            F.count("*").alias("cr"),
        )
        .collect()
    )
    ct = {int(r["b"]): int(r["ct"]) for r in counts}
    cr = {int(r["b"]): int(r["cr"]) for r in counts}
    tt = sum(ct.values())
    tr = sum(cr.values())
    lr = [
        math.floor(
            1000000.0
            * (
                math.log(ct.get(b, 0) + 1)
                - math.log(tt + _B)
                - math.log(cr.get(b, 0) + 1)
                + math.log(tr + _B)
            )
        )
        for b in range(_B)
    ]
    lr_lit = "array(" + ", ".join(f"{v}L" for v in lr) + ")"
    bucket_wd = _BUCKET_SPARK.format(w="wd")
    scored = d.select(
        "doc_id",
        F.expr(
            f"aggregate(split(text, ' '), 0L, (acc, wd) ->"
            f" acc + element_at({lr_lit}, cast({bucket_wd} as int) + 1))"
        ).alias("log_w"),
    )
    return (
        scored.withColumn("key", F.col("log_w") + F.expr(_GUMBEL_SPARK))
        .orderBy(F.desc("key"), "doc_id")
        .limit(_KSEL)
    )


# ---------------------------------------------------------------------------
# text_repeated_span_scrub
# ---------------------------------------------------------------------------

_SN = 10  # duplicated-span width (word tokens)


@query(
    "text_repeated_span_scrub",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, t.i AS i,
             array_to_string(w[i:i + {_SN - 1}], ' ') AS g,
             doc_id * 1000000 + t.i AS occ_key
      FROM toks, LATERAL unnest(generate_series(1, len(w) - {_SN - 1})) t(i)
      WHERE len(w) >= {_SN}
    ),
    dup AS (
      SELECT g, MIN(occ_key) AS keeper
      FROM grams GROUP BY g HAVING COUNT(*) >= 2
    ),
    covered AS (
      SELECT DISTINCT gr.doc_id, CAST(gr.i - 1 + o.j AS BIGINT) AS pos
      FROM grams gr JOIN dup d ON d.g = gr.g AND gr.occ_key <> d.keeper,
           LATERAL unnest(generate_series(0, {_SN - 1})) o(j)
    ),
    cov_per_doc AS (
      SELECT doc_id, list(pos) AS cov FROM covered GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.w) AS BIGINT) AS n_tokens,
           CAST(COALESCE(len(c.cov), 0) AS BIGINT) AS n_removed,
           COALESCE(array_to_string(
             list_transform(
               list_filter(generate_series(0, len(t.w) - 1),
                           p -> NOT list_contains(COALESCE(c.cov, []), p)),
               p -> t.w[CAST(p AS INT) + 1]),
             ' '), '') AS scrubbed
    FROM toks t LEFT JOIN cov_per_doc c ON c.doc_id = t.doc_id
    """,
)
def text_repeated_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup (Lee et al. 2021) on word {_SN}-grams: any token
    span duplicated ANYWHERE in the corpus (across documents or within
    one) is removed from every occurrence EXCEPT the first — the keeper is
    the minimum (doc_id, position) occurrence, encoded as an integer
    occ_key so both engines argmin with plain MIN. Survivor tokens are
    re-joined in order (same reassembly shape as text_boilerplate_scrub,
    which removes by corpus-frequency percentile instead of exact
    duplication and keeps NO occurrence).

    Scale shape: the dup-gram table is O(duplicated spans) — NOT small, so
    it is a plain shuffle equi-join on the gram (contrast with the
    boilerplate set, which is top-percentile small and broadcasts); gram
    counting is one map-side-combined groupBy carrying MIN(occ_key) along
    with COUNT; cover-marking and reassembly shuffle by doc_id only.
    Everything is linear in corpus size plus true duplication volume. The
    real ExactSubstr uses a suffix array to find maximal spans of ANY
    length; fixed-width grams + position-set union reconstructs the same
    removal set for spans >= {_SN} tokens, the regime the paper targets
    (its threshold is 50 BPE tokens)."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
    )
    grams = (
        d.filter(F.size("w") >= _SN)
        .select(
            "doc_id",
            F.expr(f"explode(sequence(1, size(w) - {_SN - 1}))").alias(
                "i1"
            ),
            "w",
        )
        # r15: position-explode + per-row slice (codegen) instead of the
        # interpreted transform(...) array build; i0 stays 0-based
        .select(
            "doc_id",
            F.expr("i1 - 1").alias("i0"),
            F.expr(f"concat_ws(' ', slice(w, i1, {_SN}))").alias("g"),
        )
        .select(
            "doc_id",
            (F.col("i0") + 1).alias("i"),
            "g",
            (F.col("doc_id") * 1000000 + F.col("i0") + 1).alias("occ_key"),
        )
    )
    dup = (
        grams.groupBy("g")
        .agg(F.count("*").alias("cnt"), F.min("occ_key").alias("keeper"))
        .filter(F.col("cnt") >= 2)
        .select("g", "keeper")
    )
    covered = (
        grams.join(dup, "g")
        .filter(F.col("occ_key") != F.col("keeper"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"sequence(cast(i - 1 as bigint),"
                    f" cast(i - 1 as bigint) + {_SN - 1})"
                )
            ).alias("pos"),
        )
        .distinct()
    )
    cov_per_doc = covered.groupBy("doc_id").agg(
        F.collect_list("pos").alias("cov")
    )
    return (
        d.join(cov_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.size("w").cast("long").alias("n_tokens"),
            F.coalesce(F.size("cov"), F.lit(0)).cast("long").alias("n_removed"),
            F.expr(
                "array_join(transform(array_except("
                "sequence(0L, cast(size(w) as bigint) - 1),"
                " coalesce(cov, cast(array() as array<bigint>))),"
                " p -> element_at(w, cast(p as int) + 1)), ' ')"
            ).alias("scrubbed"),
        )
    )


# ---------------------------------------------------------------------------
# text_tfidf_neighbors
# ---------------------------------------------------------------------------

_DF_CAP_TFIDF = 64   # inverted-index document-frequency cap (scale bound)
_COS_FLOOR = 0.3     # similarity floor
_TOPN = 5            # neighbors per document

_TFIDF_SHINGLES_SQL = """
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       unnest(generate_series(1, len(w) - 2)) AS t(i)
"""


def _tfidf_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IDF-weighted posting table (doc_id, sh, w) — the trained sparse
    index, materialized once per (session, sf_dir) like the band/cell
    indexes: in production the indexing pipeline writes idf-weighted
    postings next to the shingle index and similarity queries only join
    them. Grid-snapped idf (1e-6), df-capped at {cap}. The oracle keeps
    recomputing idf relationally from raw documents.""".format(
        cap=_DF_CAP_TFIDF
    )
    from purldb_spark.plans.fixture_cache import cached_fixture, doc_shingles

    def build() -> DataFrame:
        d = load(spark, sf_dir, "documents")
        n_docs = d.count()
        sh = doc_shingles(spark, sf_dir)
        idf = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= _DF_CAP_TFIDF)
            .select(
                "sh",
                F.expr(
                    f"cast(floor(1000000.0 * ln(cast({n_docs + 1} as double)"
                    " / (df + 1))) as bigint)"
                ).alias("w"),
            )
        )
        return sh.join(idf, "sh").localCheckpoint(eager=True)

    return cached_fixture(spark, f"tfidf_postings:{sf_dir}", build)


@query(
    "text_tfidf_neighbors",
    oracle=f"""
    WITH shingles AS ({_TFIDF_SHINGLES_SQL}),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    idf AS (
      SELECT sh,
             CAST(floor(1000000.0 * ln(
               CAST((SELECT n_docs FROM n) + 1 AS DOUBLE) / (COUNT(*) + 1)
             )) AS BIGINT) AS w
      FROM shingles GROUP BY sh HAVING COUNT(*) <= {_DF_CAP_TFIDF}
    ),
    posting AS (
      SELECT s.doc_id, s.sh, i.w FROM shingles s JOIN idf i ON i.sh = s.sh
    ),
    norms AS (
      SELECT doc_id, sqrt(CAST(CAST(SUM(w * w) AS BIGINT) AS DOUBLE)) AS nrm
      FROM posting GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(a.w * b.w) AS BIGINT) AS s
      FROM posting a JOIN posting b
        ON a.sh = b.sh AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.doc_a, d.doc_b,
             CAST(d.s AS DOUBLE) / (na.nrm * nb.nrm) AS cos
      FROM dots d
      JOIN norms na ON na.doc_id = d.doc_a
      JOIN norms nb ON nb.doc_id = d.doc_b
    ),
    ranked AS (
      SELECT doc_a, doc_b, cos,
             row_number() OVER (
               PARTITION BY doc_a ORDER BY cos DESC, doc_b
             ) AS rank
      FROM scored WHERE cos >= {_COS_FLOOR}
    )
    SELECT doc_a, doc_b, cos, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {_TOPN}
    """,
)
def text_tfidf_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted sparse cosine neighbors — the classic TF-IDF similarity
    completing the near-dup family's metric coverage: set overlap
    (jaccard), bit sketch (simhash), permutation sketch (minhash), dense
    embedding (knn/emb_*), and here the SPARSE WEIGHTED vector space over
    word 3-shingles (distinct shingles, so tf = 1 and the weight is the
    idf alone). For each document, the top-{_TOPN} neighbors with cosine
    >= {_COS_FLOOR}.

    Determinism contract (same rules as select_dsir / kmeans): idf is
    snapped to a 1e-6 integer grid, dot products and squared norms are
    exact BIGINT sums; only the final sqrt/divide are double ops, and
    those are IEEE-identical on both engines given identical integer
    inputs.

    Scale shape: the inverted index joins on the shingle with a document-
    frequency cap of {_DF_CAP_TFIDF} (pair fan-out per term is df^2, so
    the cap bounds the join at O(sum_t min(df_t, cap)^2) — the same
    lossless-for-rare-terms bound as dedup_ngram_jaccard_capped, and
    ubiquitous shingles carry near-zero idf weight anyway); norms are one
    map-side-combined groupBy; the final top-n is a per-doc window over
    the surviving pairs only. Shares the session shingle fixture
    (fixture_cache.doc_shingles) with the rest of the dedup family."""
    posting = _tfidf_postings(spark, sf_dir)
    norms = posting.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nrm")
    )
    a = posting.select(
        F.col("doc_id").alias("doc_a"), "sh", F.col("w").alias("w_a")
    )
    b = posting.select(
        F.col("doc_id").alias("doc_b"), "sh", F.col("w").alias("w_b")
    )
    dots = (
        a.join(b, "sh")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("w_a") * F.col("w_b")).alias("s"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    scored = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("s").cast("double") / (F.col("na") * F.col("nb"))).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= _COS_FLOOR)
    )
    from pyspark.sql import Window

    w_rank = Window.partitionBy("doc_a").orderBy(F.desc("cos"), "doc_b")
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= _TOPN)
        .select("doc_a", "doc_b", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# select_perplexity_buckets
# ---------------------------------------------------------------------------

# add-one-smoothed char-trigram logprob on the 1e-6 integer grid (the
# select_dsir determinism contract: ln from the same libm on both engines,
# floor can flip only within 1 ulp of a grid boundary)
_TRIGRAMS_SPARK = (
    "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"
)


_PPL_DENOM: dict[tuple[str, str], int] = {}


def _trigram_lm(spark: SparkSession, sf_dir: str):
    """The trained char-trigram LM as session state: (lm frame (g, lq),
    smoothing denominator). A trained model artifact exactly like
    fixture_cache.trained_centroids — built once per (session, sf_dir)
    (one explode + map-side-combined groupBy over the target slice plus a
    2-scalar collect), then every scoring query pays only its broadcast
    join. The oracle keeps deriving the LM relationally from raw
    documents, so the cache cannot mask a training bug."""
    from purldb_spark.plans.fixture_cache import cached_fixture

    key = (spark.sparkContext.applicationId, sf_dir)

    def build():
        d = load(spark, sf_dir, "documents").filter(F.length("text") >= 3)
        # same position-explode reshape as the scoring side (r15): avoids
        # the interpreted per-element transform on the training slice
        ref = (
            d.filter(F.col("lang") == "en")
            .select(
                F.expr("explode(sequence(1, length(text) - 2))").alias("i"),
                "text",
            )
            .select(F.expr("substring(text, i, 3)").alias("g"))
            .groupBy("g")
            .agg(F.count("*").alias("cnt"))
        )
        total, v = ref.agg(F.sum("cnt"), F.count("*")).first()
        # empty target slice (no 'en' docs with length >= 3): Spark's SUM
        # is NULL — short-circuit to an empty LM with a DEFINED denominator
        # (>= 1) so the OOV fallback logprob stays finite; the oracle's
        # greatest(total + v, 1) is the same guard
        denom = max(int(total or 0) + int(v), 1)
        _PPL_DENOM[key] = denom
        return ref.select(
            "g",
            F.expr(
                f"cast(floor(1000000.0 * ln((cnt + 1) / cast({denom} as double)))"
                " as bigint)"
            ).alias("lq"),
        ).localCheckpoint(eager=True)

    lm = cached_fixture(spark, f"trigram_lm:{sf_dir}", build)
    return lm, _PPL_DENOM[key]


@query(
    "select_perplexity_buckets",
    oracle="""
    WITH grams AS (
      SELECT doc_id, lang, substr(text, i, 3) AS g
      FROM documents, LATERAL unnest(generate_series(1, length(text) - 2)) t(i)
      WHERE length(text) >= 3
    ),
    ref AS (
      SELECT g, count(*) AS cnt FROM grams WHERE lang = 'en' GROUP BY g
    ),
    tot AS (SELECT sum(cnt) AS total, count(*) AS v FROM ref),
    lm AS (
      SELECT g, CAST(floor(1000000.0 * ln((cnt + 1) / CAST(greatest(COALESCE(total, 0) + v, 1) AS DOUBLE)))
                     AS BIGINT) AS lq
      FROM ref CROSS JOIN tot
    ),
    scored AS (
      SELECT gr.doc_id, gr.lang,
             CAST(SUM(COALESCE(lm.lq,
               (SELECT CAST(floor(1000000.0 * ln(1.0 / CAST(greatest(COALESCE(total, 0) + v, 1) AS DOUBLE)))
                            AS BIGINT) FROM tot))) AS BIGINT) AS nll_sum_q,
             COUNT(*) AS n_grams
      FROM grams gr LEFT JOIN lm ON gr.g = lm.g
      GROUP BY gr.doc_id, gr.lang
    )
    SELECT doc_id, lang, nll_sum_q, n_grams,
           CASE ntile(3) OVER (PARTITION BY lang
                               ORDER BY nll_sum_q * 1.0 / n_grams DESC, doc_id)
             WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS ppl_bucket
    FROM scored
    """,
)
def select_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2020, "CCNet: Extracting
    High Quality Monolingual Datasets from Web Crawl Data"): train a
    language model on the target corpus (here the labeled-English slice,
    the stand-in for CCNet's Wikipedia LM; an add-one-smoothed char-trigram
    model instead of their KenLM 5-gram, which no sandbox library
    provides), score every document by its average negative logprob, and
    split each language into head/middle/tail perplexity terciles — the
    exact bucket labels CCNet ships and LLM pipelines sample from.

    Determinism contract: per-TRIGRAM logprob is snapped to the 1e-6
    integer grid (the select_dsir convention), so per-document scores are
    exact BIGINT sums; the tercile ordering key avg = nll_sum_q/n_grams is
    one IEEE division of exact integers (identical in both engines) with
    doc_id as total tie-break, so ntile is deterministic.

    Scale shape: the LM is one map-side-combined groupBy over the target
    slice's trigrams, bounded by charset^3 — broadcastable at any corpus
    size (contrast DSIR's 1024-bucket literal: same trained-model split,
    bigger table, so broadcast join instead of plan literal). Its two
    normalization scalars (total count, vocabulary size) are collected
    driver-side and baked as plan literals — the text_boilerplate_scrub
    BNLJ-avoidance pattern, two BIGINTs off a map-side-combined agg.
    Scoring is explode -> broadcast-hash join -> partial-agg sum by
    doc_id: linear, one doc_id shuffle. The tercile window sorts per
    language; at 100 TB CCNet itself replaces the exact sort with two
    sampled quantile cutoffs per language (scalar thresholds, map-only
    assignment) — the same percentile-threshold swap documented in
    text_boilerplate_scrub."""
    d = load(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    # r15 (guide §4.1 "prefer built-ins"/codegen): explode the POSITION
    # sequence and slice per row instead of materializing the trigram
    # array via transform(...) — higher-order functions are interpreted
    # per element, and this explode feeds the hot 5M-row scoring join;
    # A/B at sf0.1: grams+agg 2.6 s -> 0.6 s.  Row set is identical
    # (same sequence bounds, same substring), so the oracle is unchanged.
    grams = d.select(
        "doc_id",
        "lang",
        F.expr("explode(sequence(1, length(text) - 2))").alias("i"),
        "text",
    ).select("doc_id", "lang", F.expr("substring(text, i, 3)").alias("g"))
    lm, denom = _trigram_lm(spark, sf_dir)
    lq0 = math.floor(1000000.0 * math.log(1.0 / float(denom)))
    scored = (
        grams.join(F.broadcast(lm), "g", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("lq", F.lit(lq0).cast("long")).alias("lq"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("lq").alias("nll_sum_q"),
            F.count("*").alias("n_grams"),
        )
    )
    from pyspark.sql import Window

    w_ppl = Window.partitionBy("lang").orderBy(
        (F.col("nll_sum_q") * 1.0 / F.col("n_grams")).desc(), "doc_id"
    )
    tile = F.ntile(3).over(w_ppl)
    return scored.select(
        "doc_id",
        "lang",
        "nll_sum_q",
        "n_grams",
        F.when(tile == 1, "head")
        .when(tile == 2, "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


# ---------------------------------------------------------------------------
# select_quality_classifier
# ---------------------------------------------------------------------------

_QC_B = 4096  # hashed-token feature buckets
# frozen model weight for one token: bucket = md5(token) mod 4096, then
# weight(bucket) = md5('qw|' || bucket) mod 2001 - 1000, an integer in
# [-1000, 1000] on the exact grid. The weights are a deterministic
# stand-in for a trained fastText/logistic model (same frozen-artifact
# policy as operators/pq_codebooks.json — no trained classifier ships in
# the sandbox); the Spark shape is what the real model would run.
_QC_W_SPARK = (
    "pmod(cast(conv(substring(md5(concat('qw|', cast("
    "pmod(cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint), 4096)"
    " as string))), 1, 8), 16, 10) as bigint), 2001) - 1000"
)
_QC_W_SQL = (
    "CAST(CAST(concat('0x', substring(md5(concat('qw|', CAST("
    "CAST(CAST(concat('0x', substring(md5(w), 1, 8)) AS UBIGINT)"
    " % 4096 AS BIGINT) AS VARCHAR))), 1, 8)) AS UBIGINT)"
    " % 2001 AS BIGINT) - 1000"
)


@query(
    "select_quality_classifier",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(list_sum(list_transform(string_split(text, ' '),
                                          w -> {_QC_W_SQL})) AS BIGINT) AS score_q
      FROM documents
    )
    SELECT doc_id, n_tokens, score_q, score_q >= 0 AS is_quality
    FROM scored
    """,
)
def select_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style quality-classifier gate (Brown et al. 2020 Appendix A;
    the RedPajama/CCNet fastText filter is the same shape): a linear
    bag-of-hashed-tokens model — token -> hash bucket (fastText's hashing
    trick, Joulin et al. 2016) -> frozen per-bucket weight -> document
    score = sum of token weights -> keep if score >= 0.

    The weights here are a deterministic md5-derived stand-in for the
    trained model (documented frozen-artifact policy, see _QC_W_SPARK);
    correctness of the PIPELINE (hashing, folding, gating) is what the
    oracle checks, bit-exactly, because everything stays on the integer
    grid.

    Scale shape: the ideal one — pure map, no explode, no shuffle, no
    join. Each document folds its own token list with aggregate(); a
    trained 4096-float weight vector would ride along as a plan literal
    exactly like select_dsir's log-ratio array (a bigger vocab would be a
    broadcast join like select_perplexity_buckets' LM). 100 TB cost is
    one scan."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("n_tokens"),
        F.expr(
            f"aggregate(split(text, ' '), 0L, (acc, w) -> acc + ({_QC_W_SPARK}))"
        ).alias("score_q"),
    ).withColumn("is_quality", F.col("score_q") >= 0)


# ---------------------------------------------------------------------------
# select_domain_cap
# ---------------------------------------------------------------------------

_DOM_CAP = 20      # max documents kept per source/domain
_DOM_BUDGET = 150  # global corpus budget after capping


@query(
    "select_domain_cap",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(list_sum(list_transform(string_split(text, ' '),
                                          w -> {_QC_W_SQL})) AS BIGINT) AS score_q
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, score_q,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY score_q DESC, doc_id
             ) AS BIGINT) AS dom_rank
      FROM scored
    ),
    capped AS (SELECT * FROM ranked WHERE dom_rank <= {_DOM_CAP}),
    top AS (
      SELECT doc_id FROM capped
      ORDER BY score_q DESC, doc_id LIMIT {_DOM_BUDGET}
    )
    SELECT c.doc_id, c.source, c.score_q, c.dom_rank,
           c.doc_id IN (SELECT doc_id FROM top) AS kept
    FROM capped c
    """,
)
def select_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap + global budget — the web-curation step that stops
    any single domain from dominating the corpus (RefinedWeb / Gopher
    keep per-domain limits for exactly this): rank documents within each
    source by the frozen quality-classifier score (_QC_W_SPARK, the same
    artifact select_quality_classifier gates on), keep the top
    {_DOM_CAP} per source, then fill the global {_DOM_BUDGET}-document
    budget by score across the capped pool.

    Scale shape: the per-domain rank is a window partitioned by source —
    one shuffle on the domain key (a mega-domain is a skew key; AQE skew
    handling or operators/skew.py salting applies, the cap itself is
    unaffected because ranks beyond {_DOM_CAP} are dropped); the global
    budget is a distributed TakeOrdered top-k (no single-partition
    window), flagged back onto the capped pool with a doc_id equi-join."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr(
            f"aggregate(split(text, ' '), 0L, (acc, w) -> acc + ({_QC_W_SPARK}))"
        ).alias("score_q"),
    )
    w_dom = Window.partitionBy("source").orderBy(F.desc("score_q"), "doc_id")
    capped = d.withColumn(
        "dom_rank", F.row_number().over(w_dom).cast("long")
    ).where(F.col("dom_rank") <= _DOM_CAP)
    top = (
        capped.orderBy(F.desc("score_q"), "doc_id")
        .limit(_DOM_BUDGET)
        .select("doc_id", F.lit(True).alias("_kept"))
    )
    return capped.join(top, "doc_id", "left").select(
        "doc_id",
        "source",
        "score_q",
        "dom_rank",
        F.coalesce(F.col("_kept"), F.lit(False)).alias("kept"),
    )


# ---------------------------------------------------------------------------
# select_unimax_budget
# ---------------------------------------------------------------------------

_UNI_EPOCHS = 1          # max epochs per language (the UniMax C=1 headline)
_UNI_NUM, _UNI_DEN = 8, 10   # token budget = 80% of total corpus tokens


@query(
    "select_unimax_budget",
    oracle=f"""
    WITH per AS (
      SELECT lang,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    base AS (
      SELECT lang, n_tokens,
             CAST({_UNI_EPOCHS} * n_tokens AS BIGINT) AS capacity
      FROM per
    ),
    ord AS (
      SELECT *,
             CAST(row_number() OVER (ORDER BY capacity, lang) AS BIGINT) AS rn,
             CAST(COALESCE(SUM(capacity) OVER (
               ORDER BY capacity, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS prefix,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(({_UNI_NUM} * CAST(SUM(n_tokens) OVER () AS BIGINT))
                  // {_UNI_DEN} AS BIGINT) AS budget
      FROM base
    ),
    flag AS (
      SELECT *,
             CASE WHEN capacity * (n - rn + 1) <= budget - prefix
                  THEN 1 ELSE 0 END AS cond
      FROM ord
    ),
    run AS (
      SELECT *,
             CAST(MIN(cond) OVER (
               ORDER BY capacity, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS capped_i
      FROM flag
    ),
    fin AS (
      SELECT *,
             CAST(SUM(capped_i) OVER () AS BIGINT) AS k,
             CAST(COALESCE(SUM(CASE WHEN capped_i = 1 THEN capacity END)
                           OVER (), 0) AS BIGINT) AS pk
      FROM run
    )
    SELECT lang, n_tokens, capacity, rn,
           capped_i = 1 AS capped,
           CAST(CASE WHEN capped_i = 1 THEN capacity
                ELSE (budget - pk) // greatest(n - k, 1) END
           AS BIGINT) AS alloc_tokens,
           CAST((CASE WHEN capped_i = 1 THEN capacity
                 ELSE (budget - pk) // greatest(n - k, 1) END * 1000000)
                // n_tokens AS BIGINT) AS epochs_e6
    FROM fin
    """,
)
def select_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining"): waterfill a global token budget
    ({_UNI_NUM}/{_UNI_DEN} of corpus tokens) uniformly across languages,
    capping each language at {_UNI_EPOCHS} epoch(s) of its own data —
    low-resource languages are used in full, high-resource ones are
    down-sampled to the shared water level.

    Closed form via sorting (standard waterfilling): order languages by
    capacity ascending; a language is capped iff capacity * remaining_langs
    <= remaining_budget at its position, and the capped set is a prefix of
    that order (once one language exceeds its uniform share, all larger
    ones do too), computed as a running MIN over the per-row condition.
    Every quantity stays BIGINT (capacities, prefix sums, integer
    division), so the Spark and DuckDB results are bit-identical.

    Scale shape: one aggregation to language granularity (a few thousand
    rows even at 100 TB), then windows over that tiny frame — the
    single-partition window is on the post-agg frame, never the corpus.
    The per-document application of the resulting rates is mix_weights /
    sample_stratified (operators/assemble.py) downstream."""
    from pyspark.sql import Window

    per = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tokens"))
        .withColumn("capacity", (F.lit(_UNI_EPOCHS) * F.col("n_tokens")).cast("long"))
    )
    w_ord = Window.orderBy("capacity", "lang")
    w_pre = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ordd = (
        per.withColumn("rn", F.row_number().over(w_ord).cast("long"))
        .withColumn(
            "prefix", F.coalesce(F.sum("capacity").over(w_pre), F.lit(0)).cast("long")
        )
        .withColumn("n", F.count(F.lit(1)).over(w_all).cast("long"))
        .withColumn(
            "budget",
            F.expr(
                f"({_UNI_NUM}L * sum(n_tokens) over ()) div {_UNI_DEN}L"
            ).cast("long"),
        )
    )
    flag = ordd.withColumn(
        "cond",
        F.when(
            F.col("capacity") * (F.col("n") - F.col("rn") + 1)
            <= F.col("budget") - F.col("prefix"),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    run = flag.withColumn("capped_i", F.min("cond").over(w_run).cast("long"))
    fin = run.withColumn("k", F.sum("capped_i").over(w_all).cast("long")).withColumn(
        "pk",
        F.coalesce(
            F.sum(F.when(F.col("capped_i") == 1, F.col("capacity"))).over(w_all),
            F.lit(0),
        ).cast("long"),
    )
    level = F.expr("(budget - pk) div greatest(n - k, 1L)")
    alloc = F.when(F.col("capped_i") == 1, F.col("capacity")).otherwise(level)
    return fin.select(
        "lang",
        "n_tokens",
        "capacity",
        "rn",
        (F.col("capped_i") == 1).alias("capped"),
        alloc.cast("long").alias("alloc_tokens"),
        F.expr(
            "(CASE WHEN capped_i = 1 THEN capacity"
            " ELSE (budget - pk) div greatest(n - k, 1L) END * 1000000L)"
            " div n_tokens"
        ).cast("long").alias("epochs_e6"),
    )


# ---------------------------------------------------------------------------
# select_gopher_rules
# ---------------------------------------------------------------------------

# Gopher rule battery (Rae et al. 2021, appendix A1.1), thresholds adapted
# to the synthetic corpus' 10-99-word documents but rule semantics intact.
# The corpus has no line structure, so the line-shaped rules (bullet /
# ellipsis line fractions) have no signal here and are left to the
# boilerplate scrub (text_boilerplate_scrub), which is their real
# counterpart at corpus scale.
_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 25, 90   # paper: 50 .. 100_000
_GOPHER_MIN_MWL, _GOPHER_MAX_MWL = 4, 5         # paper: 3 .. 10 chars
_GOPHER_MIN_STOPWORDS = 2                       # paper: >= 2 of 8 function words
_GOPHER_TOP_WORD_DEN = 5                        # top word <= 1/5 of tokens

_GOPHER_STOP_SQL = "['the', 'a', 'of', 'to', 'and', 'in', 'is']"
_GOPHER_STOP_SPARK = "array('the', 'a', 'of', 'to', 'and', 'in', 'is')"


@query(
    "select_gopher_rules",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, u.wd
      FROM documents, LATERAL unnest(string_split(text, ' ')) u(wd)
    ),
    top AS (
      SELECT doc_id, CAST(max(c) AS BIGINT) AS top_word_n
      FROM (SELECT doc_id, wd, count(*) AS c FROM w GROUP BY doc_id, wd)
      GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(list_filter({_GOPHER_STOP_SQL},
               s -> list_contains(string_split(text, ' '), s))) AS BIGINT)
               AS stop_hits
      FROM documents
    )
    SELECT b.doc_id, b.n_words, b.stop_hits, t.top_word_n,
           b.n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
             AS r_word_count,
           {_GOPHER_MIN_MWL} * b.n_words <= b.n_chars - b.n_words + 1
             AND b.n_chars - b.n_words + 1 <= {_GOPHER_MAX_MWL} * b.n_words
             AS r_word_len,
           b.stop_hits >= {_GOPHER_MIN_STOPWORDS} AS r_stopwords,
           t.top_word_n * {_GOPHER_TOP_WORD_DEN} <= b.n_words AS r_repetition,
           (b.n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
             AND ({_GOPHER_MIN_MWL} * b.n_words <= b.n_chars - b.n_words + 1
                  AND b.n_chars - b.n_words + 1 <= {_GOPHER_MAX_MWL} * b.n_words)
             AND b.stop_hits >= {_GOPHER_MIN_STOPWORDS}
             AND t.top_word_n * {_GOPHER_TOP_WORD_DEN} <= b.n_words
             AS keep
    FROM base b JOIN top t ON b.doc_id = t.doc_id
    """,
)
def select_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-battery document filter (Rae et al. 2021 "Scaling
    Language Models: ... Gopher", appendix A1.1 quality heuristics):
    hard per-document gates, one boolean per rule plus the conjunction —
    word-count bounds, mean-word-length bounds, minimum distinct function
    words ({_GOPHER_MIN_STOPWORDS} of the 7-word list), and the repetition
    gate (most frequent word <= 1/{_GOPHER_TOP_WORD_DEN} of tokens).
    Distinct from text_quality (soft linear score) and
    select_quality_classifier (learned weights): this is the named
    rule-battery stage real curation pipelines run FIRST, and per-rule
    flags are what its operators monitor (rejection-reason dashboards).

    Every gate is exact integer arithmetic — ratio thresholds are
    cross-multiplied (mean word length in [{_GOPHER_MIN_MWL},
    {_GOPHER_MAX_MWL}] becomes {_GOPHER_MIN_MWL}*n_words <= n_chars -
    n_words + 1 <= {_GOPHER_MAX_MWL}*n_words), so both engines agree
    bit-for-bit with no float snapping.

    Scale shape: three of the four rules are map-only column expressions;
    the repetition gate needs the per-document top-word count — an
    explode + (doc_id, word) groupBy + per-doc max, the same O(tokens)
    word-granularity shuffle as the BPE/n-gram inverted indexes, keyed by
    doc_id so it re-aggregates locally (no corpus-wide hot key)."""
    d = load(spark, sf_dir, "documents")
    top = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("wd"))
        .groupBy("doc_id", "wd")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").cast("long").alias("top_word_n"))
    )
    base = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        F.length("text").cast("long").alias("n_chars"),
        F.expr(
            f"size(filter({_GOPHER_STOP_SPARK},"
            " s -> array_contains(split(text, ' '), s)))"
        ).cast("long").alias("stop_hits"),
    )
    j = base.join(top, "doc_id")
    mwl = F.col("n_chars") - F.col("n_words") + 1
    r_wc = (F.col("n_words") >= _GOPHER_MIN_WORDS) & (
        F.col("n_words") <= _GOPHER_MAX_WORDS
    )
    r_wl = (F.lit(_GOPHER_MIN_MWL) * F.col("n_words") <= mwl) & (
        mwl <= F.lit(_GOPHER_MAX_MWL) * F.col("n_words")
    )
    r_sw = F.col("stop_hits") >= _GOPHER_MIN_STOPWORDS
    r_rep = F.col("top_word_n") * _GOPHER_TOP_WORD_DEN <= F.col("n_words")
    return j.select(
        "doc_id",
        "n_words",
        "stop_hits",
        "top_word_n",
        r_wc.alias("r_word_count"),
        r_wl.alias("r_word_len"),
        r_sw.alias("r_stopwords"),
        r_rep.alias("r_repetition"),
        (r_wc & r_wl & r_sw & r_rep).alias("keep"),
    )


# ---------------------------------------------------------------------------
# mix_temperature_sampling
# ---------------------------------------------------------------------------

# alpha = 1/2: the exponentiated-smoothing family of mBERT/XLM (p_l ^ alpha
# with alpha in [0.2, 0.7]).  1/2 specifically because sqrt is the ONE
# power IEEE 754 requires to be correctly rounded — JVM Math.sqrt and
# DuckDB/libm sqrt are bit-identical, where pow(n, 0.3) and exp(0.3*ln n)
# both measurably diverge between engines on this machine (1-ulp flips at
# n=4567 / n=888888888).  The weight then rides the integer e6 grid so
# every downstream sum/division is exact BIGINT arithmetic.
_TEMP_NUM, _TEMP_DEN = 1, 2   # token budget = half the corpus


@query(
    "mix_temperature_sampling",
    oracle=f"""
    WITH per AS (
      SELECT lang,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    w AS (
      SELECT lang, n_tokens,
             CAST(floor(1000000.0 * sqrt(CAST(n_tokens AS DOUBLE)))
                  AS BIGINT) AS w_e6
      FROM per
    ),
    tot AS (
      SELECT *,
             CAST(SUM(n_tokens) OVER () AS BIGINT) AS tot_tokens,
             CAST(SUM(w_e6) OVER () AS BIGINT) AS tot_w
      FROM w
    )
    SELECT lang, n_tokens, w_e6,
           CAST((n_tokens * 1000000) // tot_tokens AS BIGINT) AS p_raw_e6,
           CAST((w_e6 * 1000000) // tot_w AS BIGINT) AS p_samp_e6,
           CAST(((tot_tokens * {_TEMP_NUM}) // {_TEMP_DEN}) * w_e6 // tot_w
                AS BIGINT) AS alloc_tokens,
           CAST((((tot_tokens * {_TEMP_NUM}) // {_TEMP_DEN}) * w_e6 // tot_w)
                * 1000000 // n_tokens AS BIGINT) AS epochs_e6
    FROM tot
    """,
)
def mix_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language sampling (Devlin et al. 2019 mBERT
    exponentiated smoothing; Conneau & Lample 2019 XLM eq. 1): sample
    languages proportional to p_l^alpha so low-resource languages are
    up-weighted relative to their raw share.  alpha = 1/2, computed as
    sqrt — the one power where cross-engine bit-exactness is guaranteed
    (IEEE 754 requires sqrt correctly rounded; pow(n, 0.3) measurably
    differs between the JVM and libm on this machine).

    The weight is snapped once to the e6 integer grid (floor(1e6*sqrt(n)),
    a deterministic double multiply on an identical double); every later
    quantity — weight total, probabilities, the {_TEMP_NUM}/{_TEMP_DEN}
    token-budget allocation, effective epochs — is pure BIGINT arithmetic,
    so Spark and DuckDB agree bit-for-bit with no float snapping downstream.
    p_raw_e6 vs p_samp_e6 exposes the flattening (en's share shrinks toward
    the mean, zh/fr grow); UniMax (select_unimax_budget) is the capped
    alternative on the same aggregate.

    Scale shape: identical to select_unimax_budget — one aggregation to
    language granularity (thousands of rows at 100 TB), then windows over
    that tiny frame; the single-partition window never touches the corpus."""
    from pyspark.sql import Window

    per = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("long")
            .alias("n_tokens")
        )
    )
    w = per.withColumn(
        "w_e6",
        F.expr(
            "cast(floor(1000000.0d * sqrt(cast(n_tokens as double))) as bigint)"
        ),
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = w.withColumn(
        "tot_tokens", F.sum("n_tokens").over(w_all).cast("long")
    ).withColumn("tot_w", F.sum("w_e6").over(w_all).cast("long"))
    alloc = F.expr(
        f"((tot_tokens * {_TEMP_NUM}L) div {_TEMP_DEN}L) * w_e6 div tot_w"
    )
    return tot.select(
        "lang",
        "n_tokens",
        "w_e6",
        F.expr("(n_tokens * 1000000L) div tot_tokens")
        .cast("long")
        .alias("p_raw_e6"),
        F.expr("(w_e6 * 1000000L) div tot_w").cast("long").alias("p_samp_e6"),
        alloc.cast("long").alias("alloc_tokens"),
        (alloc * F.lit(1000000).cast("long") / F.col("n_tokens"))
        .cast("long")
        .alias("epochs_e6"),
    )


# ---------------------------------------------------------------------------
# corpus_funnel_report
# ---------------------------------------------------------------------------

# zh routed to its own pipeline; the tuple is the single source of truth —
# the oracle's IN-list AND streaming/funnel_stream.py's isin() both derive
# from it, so the batch, oracle, and streaming funnels cannot desynchronize
_FUN_LANGS = ("en", "de", "fr", "es")
_FUN_LANGS_SQL = "('" + "', '".join(_FUN_LANGS) + "')"
_FUN_MIN_W, _FUN_MAX_W = 25, 90
_FUN_MIN_MWL, _FUN_MAX_MWL = 4, 5


@query(
    "corpus_funnel_report",
    oracle=f"""
    WITH b AS (
      SELECT doc_id,
             lang IN {_FUN_LANGS_SQL} AS g1,
             len(string_split(text, ' '))
               BETWEEN {_FUN_MIN_W} AND {_FUN_MAX_W} AS g2,
             ({_FUN_MIN_MWL} * len(string_split(text, ' '))
                <= length(text) - len(string_split(text, ' ')) + 1
              AND length(text) - len(string_split(text, ' ')) + 1
                <= {_FUN_MAX_MWL} * len(string_split(text, ' '))) AS g3,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
               AS g4
      FROM documents
    ),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(count(*) FILTER (WHERE g1) AS BIGINT) AS k1,
             CAST(count(*) FILTER (WHERE g1 AND g2) AS BIGINT) AS k2,
             CAST(count(*) FILTER (WHERE g1 AND g2 AND g3) AS BIGINT) AS k3,
             CAST(count(*) FILTER (WHERE g1 AND g2 AND g3 AND g4) AS BIGINT)
               AS k4
      FROM b
    )
    SELECT CAST(1 AS BIGINT) AS stage, 'lang_allowlist' AS stage_name,
           n0 AS n_in, k1 AS n_kept FROM a
    UNION ALL SELECT 2, 'word_count', k1, k2 FROM a
    UNION ALL SELECT 3, 'word_length', k2, k3 FROM a
    UNION ALL SELECT 4, 'exact_dedup', k3, k4 FROM a
    """,
)
def corpus_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel dashboard: one row per pipeline stage with documents
    entering and surviving it — the rejection-reason report every
    production curation run monitors (stage ordering follows the standard
    cheap-to-expensive cascade: language allowlist, hard length gate, mean
    word-length gate, exact dedup keep-first).

    Single corpus pass: all four gates become boolean columns (the dedup
    gate is a row_number window over md5(text)), the counts are one
    aggregation with conditional sums of the gate-prefix conjunctions, and
    the 4-row funnel is a stack() unpivot of that single aggregate row —
    no per-stage rescans, no driver loop.  Every count is BIGINT so the
    engines agree exactly.

    Scale shape: the md5-partitioned window is the only shuffle (same key
    as dedup_exact); the conditional counts ride the same map-side partial
    agg as any count(*).  The funnel frame itself is 4 rows regardless of
    corpus size — the report a 100 TB run prints per stage is this exact
    query over the gate booleans its stages already materialize."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    mwl = F.length("text") - n_words + F.lit(1)
    w_dedup = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
        "doc_id"
    )
    b = d.select(
        F.col("lang").isin(*_FUN_LANGS).alias("g1"),
        ((n_words >= _FUN_MIN_W) & (n_words <= _FUN_MAX_W)).alias("g2"),
        (
            (F.lit(_FUN_MIN_MWL) * n_words <= mwl)
            & (mwl <= F.lit(_FUN_MAX_MWL) * n_words)
        ).alias("g3"),
        (F.row_number().over(w_dedup) == 1).alias("g4"),
    )
    # coalesce every conditional sum: on an EMPTY corpus Spark's SUM is
    # NULL while the oracle's COUNT(*) FILTER is 0 — the funnel must report
    # zeros, not nulls (tests/test_robustness.py pins this)
    a = b.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.coalesce(F.sum(F.col("g1").cast("long")), F.lit(0))
        .cast("long")
        .alias("k1"),
        F.coalesce(F.sum((F.col("g1") & F.col("g2")).cast("long")), F.lit(0))
        .cast("long")
        .alias("k2"),
        F.coalesce(
            F.sum((F.col("g1") & F.col("g2") & F.col("g3")).cast("long")),
            F.lit(0),
        )
        .cast("long")
        .alias("k3"),
        F.coalesce(
            F.sum(
                (
                    F.col("g1") & F.col("g2") & F.col("g3") & F.col("g4")
                ).cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("k4"),
    )
    return a.selectExpr(
        "stack(4,"
        " 1L, 'lang_allowlist', n0, k1,"
        " 2L, 'word_count', k1, k2,"
        " 3L, 'word_length', k2, k3,"
        " 4L, 'exact_dedup', k3, k4"
        ") as (stage, stage_name, n_in, n_kept)"
    )
