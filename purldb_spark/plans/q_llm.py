"""Training-data-pipeline queries: dedup family, similarity search, text
analysis. First-class operators per the build brief (BASELINE.json
north_star), all DuckDB-oracle-verified.

Dedup coverage map:
  exact            -> dedup_exact           (hash groupBy)
  MinHash+LSH      -> dedup_minhash_lsh     (shingle→minhash→band→join→verify)
  SimHash          -> dedup_simhash         (bit votes→banded join→hamming)
  n-gram jaccard   -> dedup_ngram_jaccard   (inverted-index exact pairs)
  embedding cosine -> dedup_embedding_cosine
  incremental      -> dedup_incremental     (new batch vs persistent band index)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.functions.text import (
    n_tokens_bpe,
    n_tokens_ws,
    predicted_lang,
    predicted_lang_sql,
    quality_features,
    quality_sql,
    TOKEN_REGEX,
)
from purldb_spark.operators.dedup import (
    df_capped_candidate_pairs,
    exact_dedup,
    incremental_lsh_dedup,
    lsh_candidate_pairs,
    minhash_bands,
    simhash,
    simhash_near_pairs,
    simhash_sql,
    verify_jaccard,
    word_shingles,
)
from purldb_spark.operators.knn import (
    brute_force_topk,
    bucket_expr,
    bucket_sql,
    cosine_expr,
    cosine_sql_duckdb,
    dot_expr,
    dot_sql_duckdb,
    hyperplanes,
    normalize_expr,
    normalize_sql_duckdb,
)
from purldb_spark.plans.q_match import a5_snippet_jaccard
from purldb_spark.plans.registry import ORACLES, query

# ------------------------------------------------------------------ dedup --


@query(
    "dedup_exact",
    oracle="""
    WITH hashed AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
    marked AS (
      SELECT doc_id, content_hash,
             first_value(doc_id) OVER (PARTITION BY content_hash ORDER BY doc_id)
               AS canonical_doc_id
      FROM hashed
    )
    SELECT doc_id, content_hash, canonical_doc_id,
           doc_id <> canonical_doc_id AS is_duplicate
    FROM marked
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5(text) hash-groupBy; lowest doc_id canonical. One
    shuffle on the content hash — at 100 TB partition the write by a hash
    prefix and this runs fully parallel with no skew (md5 is uniform)."""
    return exact_dedup(load(spark, sf_dir, "documents"), "doc_id", "text")


_SHINGLES_SQL = """
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       unnest(generate_series(1, len(w) - 2)) AS t(i)
"""

_N_HASHES, _BAND_SIZE = 8, 2
_MINHASH_AGGS_SQL = ", ".join(
    f"min(md5('{s}|' || sh)) AS h{s}" for s in range(_N_HASHES)
)
_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, h{b * _BAND_SIZE} || h{b * _BAND_SIZE + 1} AS band_key FROM sig"
    for b in range(_N_HASHES // _BAND_SIZE)
)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    sig AS (SELECT doc_id, {_MINHASH_AGGS_SQL} FROM shingles GROUP BY doc_id),
    bands AS ({_BANDS_SQL}),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS intersection
      FROM cands c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
      GROUP BY c.id_a, c.id_b
    )
    SELECT id_a, id_b, intersection,
           CAST(intersection AS DOUBLE) / (na.n + nb.n - intersection) AS jaccard
    FROM inter JOIN sizes na ON na.doc_id = id_a JOIN sizes nb ON nb.doc_id = id_b
    WHERE CAST(intersection AS DOUBLE) / (na.n + nb.n - intersection) >= 0.5
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection: word-3-gram shingles -> 8 seeded
    min-hashes -> 4 bands of 2 -> candidate pairs from ONE equi-join on
    (band_idx, band_key) -> exact-jaccard verify of candidates only,
    keep ≥ 0.5.

    This is the 100 TB dedup path: signature computation is a single
    aggregation (partial min map-side), banding makes candidate generation
    O(colliding pairs), and the expensive exact verify runs only on
    candidates. The all-pairs variant (dedup_ngram_jaccard) is the oracle's
    ground truth at small scale."""
    docs = load(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=3)
    bands = minhash_bands(sh, "doc_id", _N_HASHES, _BAND_SIZE)
    cands = lsh_candidate_pairs(bands, "doc_id")
    return verify_jaccard(cands, sh, "doc_id", 0.5)


@query(
    "dedup_incremental",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    sig AS (SELECT doc_id, {_MINHASH_AGGS_SQL} FROM shingles GROUP BY doc_id),
    bands AS ({_BANDS_SQL}),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM (SELECT * FROM bands WHERE doc_id % 7 = 0) a
      JOIN (SELECT * FROM bands WHERE doc_id % 7 <> 0) b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS intersection
      FROM cands c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
      GROUP BY c.id_a, c.id_b
    )
    SELECT id_a AS new_id, id_b AS index_id, intersection,
           CAST(intersection AS DOUBLE) / (na.n + nb.n - intersection) AS jaccard
    FROM inter JOIN sizes na ON na.doc_id = id_a JOIN sizes nb ON nb.doc_id = id_b
    WHERE CAST(intersection AS DOUBLE) / (na.n + nb.n - intersection) >= 0.5
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the production shape: a NEW batch of documents
    checked against a persistent band INDEX (operators/dedup.py::
    incremental_lsh_dedup), one equi-join of batch bands vs stored bands,
    never an all-pairs recompute over the corpus.

    The fixture split is deterministic (doc_id % 7 == 0 is the "new batch",
    the rest is the "index") so the DuckDB oracle can replay it; in
    production the index side is a parquet table partitioned by
    hash(band_key) that each batch appends to after verification, making
    per-batch cost O(batch x collision rate) regardless of corpus size."""
    docs = load(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=3)
    bands = minhash_bands(sh, "doc_id", _N_HASHES, _BAND_SIZE)
    is_new = F.col("doc_id") % 7 == 0
    cands = incremental_lsh_dedup(
        bands.filter(is_new), bands.filter(~is_new), "doc_id"
    )
    verified = verify_jaccard(
        cands.select(
            F.col("new_id").alias("id_a"), F.col("index_id").alias("id_b")
        ),
        sh,
        "doc_id",
        0.5,
    )
    return verified.select(
        F.col("id_a").alias("new_id"),
        F.col("id_b").alias("index_id"),
        "intersection",
        "jaccard",
    )


@query(
    "dedup_ngram_jaccard",
    oracle=ORACLES["a5_snippet_jaccard"].replace(">= 0.3", ">= 0.5"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram jaccard dedup — the all-pairs ground truth (shares the
    inverted-index implementation with a5_snippet_jaccard, threshold 0.5)."""
    return a5_snippet_jaccard(spark, sf_dir).filter(F.col("jaccard") >= 0.5)


_DF_CAP = 16
_MIN_SUPPORT = 2


@query(
    "dedup_ngram_jaccard_capped",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    rare AS (SELECT sh FROM shingles GROUP BY sh HAVING count(*) <= {_DF_CAP}),
    cands AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM shingles a
      JOIN rare r ON r.sh = a.sh
      JOIN shingles b ON b.sh = a.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) >= {_MIN_SUPPORT}
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS intersection
      FROM cands c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
      GROUP BY c.id_a, c.id_b
    )
    SELECT id_a, id_b, intersection,
           CAST(intersection AS DOUBLE) / (na.n + nb.n - intersection) AS jaccard
    FROM inter JOIN sizes na ON na.doc_id = id_a JOIN sizes nb ON nb.doc_id = id_b
    WHERE CAST(intersection AS DOUBLE) / (na.n + nb.n - intersection) >= 0.5
    """,
)
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-safe n-gram jaccard: candidate pairs only from pairs sharing
    at least 2 shingles of document frequency <= 16 (a shingle in k docs
    makes k² candidate rows — the df cap bounds the quadratic term, and hot
    shingles carry no signal; the support-2 floor drops the long tail of
    single-collision pairs that dominate candidate volume), then exact
    jaccard over the FULL shingle sets for the candidates, >= 0.5.

    vs dedup_ngram_jaccard (the uncapped ground truth): misses a pair only
    when fewer than 2 of its shared shingles are rare; scores of emitted
    pairs are identical. The plan is equi-joins only — no shingle key ever
    fans out more than df_cap ways, so the shuffle volume is linear in
    corpus size at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    # tokenize ONCE: the shingle table feeds candidate generation and both
    # sides of the verify; without the checkpoint each consumer re-runs the
    # split/transform/explode tokenization over the full corpus
    sh = word_shingles(docs, "doc_id", "text", n=3).localCheckpoint(eager=True)
    cands = df_capped_candidate_pairs(
        sh, "doc_id", _DF_CAP, _MIN_SUPPORT, jaccard_floor=0.5
    )
    return verify_jaccard(cands, sh, "doc_id", 0.5)


# 4 independent bands of 4 hyperplanes: for planted near-dups (cosine ~0.9,
# p_bit ~0.857) band recall is 1-(1-0.857^4)^4 ~ 0.96; candidates stay
# O(N · bucket occupancy), never all-pairs.
_BLOCK_BANDS = [hyperplanes(dim=64, n_planes=4, seed=100 + b) for b in range(4)]


def embedding_blocked_pairs(
    e: DataFrame, bands: list[list[list[float]]], threshold: float
) -> DataFrame:
    """LSH-bucket-blocked embedding near-dup pairs, parameterized by band
    layout: each band's hyperplane list gives every vector one (band_idx,
    bucket) key; candidate pairs share a key (ONE equi-join on the banded
    table), then the exact normalized dot product verifies >= threshold.

    Scale rule (measured in tools/scale_probe.py): bucket BITS must grow
    with log(N). A band of k planes makes 2^k buckets, so random-pair
    collisions — and with them candidate volume — scale as N²·bands/2^k;
    holding k fixed while N grows 10x turns a linear plan quadratic. At
    production N use ~log2(N) planes per band and add bands to buy back
    recall."""
    unit = e.select("vec_id", normalize_expr("embedding").alias("u"))
    banded = None
    for b, planes in enumerate(bands):
        part = e.select(
            "vec_id",
            F.lit(b).alias("band_idx"),
            bucket_expr("embedding", planes).alias("bucket"),
        )
        banded = part if banded is None else banded.unionByName(part)
    a = banded.alias("a")
    bb = banded.alias("b")
    cands = (
        a.join(
            bb,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
            "inner",
        )
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .dropDuplicates()
    )
    ua = unit.select(F.col("vec_id").alias("id_a"), F.col("u").alias("u_a"))
    ub = unit.select(F.col("vec_id").alias("id_b"), F.col("u").alias("u_b"))
    return (
        cands.join(ua, "id_a")
        .join(ub, "id_b")
        .withColumn("cosine", dot_expr("u_a", "u_b"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )



@query(
    "dedup_embedding_blocked",
    oracle=f"""
    WITH unit AS (
      SELECT vec_id, {normalize_sql_duckdb("embedding")} AS u FROM embeddings
    ),
    bands AS (
      {" UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx,"
        f" {bucket_sql('embedding', planes, dialect='duckdb')} AS bucket"
        " FROM embeddings"
        for b, planes in enumerate(_BLOCK_BANDS)
      )}
    ),
    cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.bucket = b.bucket
       AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b, {dot_sql_duckdb("ua.u", "ub.u")} AS cosine
    FROM cands c
    JOIN unit ua ON ua.vec_id = c.id_a
    JOIN unit ub ON ub.vec_id = c.id_b
    WHERE {dot_sql_duckdb("ua.u", "ub.u")} >= 0.4
    """,
)
def dedup_embedding_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for embedding near-dup pairs: LSH-bucket blocking,
    4 bands x 4 hyperplanes, exact cosine verify >= 0.4.

    vs dedup_embedding_cosine (the exact all-pairs ground truth): candidate
    generation is O(N · bucket occupancy) instead of O(N²), scores of
    emitted pairs are bit-identical, and recall is tuned by the band count
    exactly like MinHash-LSH. At 100 TB (band_idx, bucket) is the shuffle
    key — uniform by construction (random hyperplanes), no skew — and the
    plane count per band grows with log(N) (see embedding_blocked_pairs)."""
    return embedding_blocked_pairs(
        load(spark, sf_dir, "embeddings"), _BLOCK_BANDS, 0.4
    )


@query(
    "dedup_embedding_multiprobe",
    oracle=f"""
    WITH unit AS (
      SELECT vec_id, {normalize_sql_duckdb("embedding")} AS u FROM embeddings
    ),
    bands AS (
      {" UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx,"
        f" {bucket_sql('embedding', planes, dialect='duckdb')} AS bucket"
        " FROM embeddings"
        for b, planes in enumerate(_BLOCK_BANDS)
      )}
    ),
    probes AS (
      SELECT vec_id, band_idx,
             CASE WHEN j = 0 THEN bucket
                  ELSE xor(bucket, (1 << (j - 1))) END AS bucket
      FROM bands, unnest(generate_series(0, {len(_BLOCK_BANDS[0])})) AS t(j)
    ),
    cands AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM probes a JOIN bands b
        ON a.band_idx = b.band_idx AND a.bucket = b.bucket
       AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b, {dot_sql_duckdb("ua.u", "ub.u")} AS cosine
    FROM cands c
    JOIN unit ua ON ua.vec_id = c.id_a
    JOIN unit ub ON ub.vec_id = c.id_b
    WHERE {dot_sql_duckdb("ua.u", "ub.u")} >= 0.4
    """,
)
def dedup_embedding_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe variant of dedup_embedding_blocked: the query side also
    probes every bucket one sign-flip away (operators/knn.py::
    multiprobe_keys), the index side keeps single keys — recall rises from
    54% (500/920) to 96% (880/920) of the exact >= 0.4 pair set at sf0.1
    with ZERO index growth. This is the recall knob that composes with finding 1 of
    BENCH_scale.md (grow bucket bits with log N, buy recall back with
    probes, not index copies)."""
    from purldb_spark.operators.knn import index_keys, multiprobe_keys

    e = load(spark, sf_dir, "embeddings")
    unit = e.select("vec_id", normalize_expr("embedding").alias("u"))
    a = multiprobe_keys(e, "vec_id", "embedding", _BLOCK_BANDS).alias("a")
    b = index_keys(e, "vec_id", "embedding", _BLOCK_BANDS).alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
            "inner",
        )
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .dropDuplicates()
    )
    ua = unit.select(F.col("vec_id").alias("id_a"), F.col("u").alias("u_a"))
    ub = unit.select(F.col("vec_id").alias("id_b"), F.col("u").alias("u_b"))
    return (
        cands.join(ua, "id_a")
        .join(ub, "id_b")
        .withColumn("cosine", dot_expr("u_a", "u_b"))
        .filter(F.col("cosine") >= 0.4)
        .select("id_a", "id_b", "cosine")
    )


# SimHash features are 3-word shingles, not raw tokens: the synthetic corpus
# has a ~30-word vocabulary, so token SETS are nearly identical across
# documents and token-level simhash degenerates (every pair within hamming 3).
# Shingles are high-cardinality and shared only by near-duplicates.
_TOKENS_SQL = _SHINGLES_SQL.replace("AS sh", "AS tok")


@query(
    "dedup_simhash",
    oracle=f"""
    WITH sim AS ({simhash_sql("doc_id", _TOKENS_SQL)}),
    bands AS (
      SELECT doc_id, simhash, b AS band_idx, (simhash >> (b * 8)) & 255 AS band_key
      FROM sim, unnest([0, 1, 2, 3]) AS t(b)
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.simhash AS sim_a, b.simhash AS sim_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
    FROM cands WHERE bit_count(xor(sim_a, sim_b)) <= 3
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection: 32-bit fingerprint from per-shingle bit
    votes; pairs at hamming ≤ 3 found via 4-band pigeonhole join (hamming ≤ 3
    over 4 bands forces ≥ 1 identical byte), then exact bit_count verify.
    Features are 3-word shingles (see _TOKENS_SQL note)."""
    docs = load(spark, sf_dir, "documents")
    toks = word_shingles(docs, "doc_id", "text", n=3).withColumnRenamed("sh", "tok")
    sim = simhash(toks, "doc_id")
    return simhash_near_pairs(sim, "doc_id", max_hamming=3, n_bands=4)


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH unit AS (
      SELECT vec_id, {normalize_sql_duckdb("embedding")} AS u FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {dot_sql_duckdb("a.u", "b.u")} AS cosine
    FROM unit a JOIN unit b ON a.vec_id < b.vec_id
    WHERE {dot_sql_duckdb("a.u", "b.u")} >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: exact all-pairs cosine ≥ 0.4 (the synthetic
    vectors are near-orthogonal, so 0.4 is the planted-similarity tail).

    Vectors are unit-normalized ONCE (O(N)), so the O(N²) pair stage is a
    bare dot product — 3x less flops and no per-pair norm recomputation; the
    oracle mirrors the same normalize-then-dot association so doubles stay
    bit-exact. Brute force is the correctness baseline; LSH bucketing
    (knn_lsh_bucketed) is the scale path. At 100 TB: block the pair space
    (bucket x bucket) and broadcast one side per block."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", normalize_expr("embedding").alias("u")
    )
    # the table is one parquet file; without an explicit repartition the
    # nested-loop pair join runs on a single task — spread the streamed side
    # across the cluster (HASH partitioning: round-robin forces a
    # determinism sort and measured 7x slower here) and broadcast the
    # (small) build side so every task scans its slice of A against all
    # of B
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("u").alias("u_a")).repartition(
        n_part, "id_a"
    )
    b = e.select(F.col("vec_id").alias("id_b"), F.col("u").alias("u_b"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"), "inner")
        .withColumn("cosine", dot_expr("u_a", "u_b"))
        .filter(F.col("cosine") >= 0.4)
        .select("id_a", "id_b", "cosine")
    )


# ------------------------------------------------------- similarity search --


@query(
    "knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_vec_id, embedding AS q_embedding
               FROM embeddings WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.q_vec_id, i.vec_id,
             {cosine_sql_duckdb("q.q_embedding", "i.embedding")} AS cosine,
             row_number() OVER (
               PARTITION BY q.q_vec_id
               ORDER BY {cosine_sql_duckdb("q.q_embedding", "i.embedding")} DESC,
                        i.vec_id
             ) AS rank
      FROM q JOIN embeddings i ON q.q_vec_id <> i.vec_id
    )
    SELECT q_vec_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= 5
    """,
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN baseline: exact top-5 cosine neighbors for each query vector
    (vec_id % 50 == 0). crossJoin + higher-order-function dot products, all
    JVM-side; the window keeps 5 per query with an id tie-break."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_embedding")
    )
    out = brute_force_topk(q, e, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


_PLANES = hyperplanes(dim=64, n_planes=8, seed=42)


@query(
    "knn_lsh_bucketed",
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding,
             {bucket_sql("embedding", _PLANES, dialect="duckdb")} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_vec_id, embedding AS q_embedding, bucket
          FROM bucketed WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.q_vec_id, i.vec_id,
             {cosine_sql_duckdb("q.q_embedding", "i.embedding")} AS cosine,
             row_number() OVER (
               PARTITION BY q.q_vec_id
               ORDER BY {cosine_sql_duckdb("q.q_embedding", "i.embedding")} DESC,
                        i.vec_id
             ) AS rank
      FROM q JOIN bucketed i ON q.bucket = i.bucket AND q.q_vec_id <> i.vec_id
    )
    SELECT q_vec_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= 5
    """,
)
def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: 8 deterministic hyperplanes -> 8-bit signature;
    neighbors searched only within the query's bucket (equi-join on the
    bucket key instead of a crossJoin — ~256x less work at equal data).
    Recall < 1 by construction; raise it with multiple independent bands
    exactly like the MinHash LSH. At 100 TB the bucket is the partition key."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "bucket", bucket_expr("embedding", _PLANES)
    )
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("bucket").alias("q_bucket"),
    )
    joined = q.join(
        e, (F.col("q_bucket") == F.col("bucket")) & (F.col("q_vec_id") != F.col("vec_id"))
    )
    scored = joined.withColumn("cosine", cosine_expr("q_embedding", "embedding"))
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("q_vec_id", "vec_id", "cosine", "rank")
    )


# ------------------------------------------------------------ text analysis --


@query(
    "text_langid",
    oracle=f"""
    SELECT doc_id, lang, {predicted_lang_sql("text")} AS pred_lang
    FROM documents
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax of per-language stopword ratios (≥2%
    floor, deterministic first-wins ties). A lexicon heuristic, not a model —
    the Spark shape (pure column expressions over a literal lexicon) is what
    a real fastText-style scorer would replace via pandas_udf."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", predicted_lang("text").alias("pred_lang"))


@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id, {quality_sql("text")}
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punctuation/stopword features + linear score
    (the C4/Gopher-rule shape). Pure JVM expressions; bit-exact vs oracle."""
    d = load(spark, sf_dir, "documents")
    feats = quality_features("text")
    return d.select("doc_id", *[c.alias(n) for n, c in feats.items()])


@query(
    "text_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT) AS n_tokens_bpe
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex tokenizer."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_tokens_ws("text").alias("n_tokens_ws"),
        n_tokens_bpe("text").alias("n_tokens_bpe"),
    )


_W = 4  # winnowing window (fingerprints per ~w tokens)


@query(
    "text_winnow_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(list_slice(w, i, i + 4), ' ')) AS g
      FROM toks, unnest(generate_series(1, len(w) - 4)) AS t(i)
    ),
    winnowed AS (
      SELECT doc_id,
             min(g) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {_W - 1} FOLLOWING) AS fp
      FROM grams
    )
    SELECT doc_id, count(DISTINCT fp) AS n_fingerprints
    FROM winnowed GROUP BY doc_id
    """,
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by winnowing (the matchcode snippet-index
    construction, matchcode/models.py:425-657 consumes exactly such
    fingerprints): hash every 5-token gram, slide a window of 4, keep the
    window minimum — the classic winnowing guarantee (one fingerprint per
    window, shared grams -> shared fingerprints). Windowed min per doc, no
    UDF."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 5)  # sequence() runs backward on n<1 — guard
    )
    grams = d.select(
        "doc_id",
        F.posexplode(
            F.expr("transform(sequence(1, size(w) - 4), i -> md5(concat_ws(' ', slice(w, i, 5))))")
        ).alias("pos", "g"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _W - 1)
    winnowed = grams.withColumn("fp", F.min("g").over(win))
    return winnowed.groupBy("doc_id").agg(
        F.countDistinct("fp").alias("n_fingerprints")
    )


_SUB_CAP = 16  # fingerprint document-frequency cap
_SUB_MIN = 4  # shared fingerprints to call it substring overlap


@query(
    "dedup_substring_winnow",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(list_slice(w, i, i + 4), ' ')) AS g
      FROM toks, unnest(generate_series(1, len(w) - 4)) AS t(i)
    ),
    winnowed AS (
      SELECT DISTINCT doc_id,
             min(g) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {_W - 1} FOLLOWING) AS fp
      FROM grams
    ),
    rare AS (
      SELECT fp FROM winnowed GROUP BY fp HAVING count(*) <= {_SUB_CAP}
    ),
    posting AS (SELECT w.doc_id, w.fp FROM winnowed w JOIN rare r ON r.fp = w.fp)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS shared_fps
    FROM posting a JOIN posting b
      ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {_SUB_MIN}
    """,
)
def dedup_substring_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-overlap dedup: pairs of documents sharing >= 4
    winnow fingerprints — the operator that catches COPIED PASSAGES
    (boilerplate, quoted blocks) that whole-document jaccard misses when
    the rest of the text differs.

    Scale shape: winnowing keeps ~1/w of the gram hashes (one per window,
    the classic winnowing guarantee), so the inverted index joined here is
    4x smaller than the full shingle index of the jaccard family for the
    same substring-match guarantee; the document-frequency cap bounds the
    self-join fan-out exactly like df_capped_candidate_pairs. All
    equi-joins, one shuffle on fp, map-side partial counts."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 5)
    )
    grams = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(w) - 4),"
                " i -> md5(concat_ws(' ', slice(w, i, 5))))"
            )
        ).alias("pos", "g"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _W - 1)
    winnowed = (
        grams.withColumn("fp", F.min("g").over(win))
        .select("doc_id", "fp")
        .dropDuplicates()
    )
    rare = (
        winnowed.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _SUB_CAP)
        .select("fp")
    )
    posting = winnowed.join(rare, "fp")
    a = posting.alias("a")
    b = posting.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= _SUB_MIN)
    )


from purldb_spark.operators.ivf import cell_expr, cell_sql  # noqa: E402


@query(
    "knn_ivf_cell",
    oracle=f"""
    WITH cells AS (
      SELECT vec_id, embedding, {cell_sql("embedding")} AS ivf_cell
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_vec_id, embedding AS q_embedding, ivf_cell
          FROM cells WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.q_vec_id, i.vec_id,
             {cosine_sql_duckdb("q.q_embedding", "i.embedding")} AS cosine,
             row_number() OVER (
               PARTITION BY q.q_vec_id
               ORDER BY {cosine_sql_duckdb("q.q_embedding", "i.embedding")} DESC,
                        i.vec_id
             ) AS rank
      FROM q JOIN cells i ON q.ivf_cell = i.ivf_cell AND q.q_vec_id <> i.vec_id
    )
    SELECT q_vec_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= 3
    """,
)
def knn_ivf_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path #2 — IVF partitioning (operators/ivf.py): 8 frozen
    centroids split the space into cells; each query searches only its own
    cell's inverted list (top-3 by cosine). Complements knn_lsh_bucketed;
    at 100 TB `ivf_cell` is the partition key and nprobe>1 raises recall by
    probing adjacent cells."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "ivf_cell", cell_expr("embedding")
    )
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("ivf_cell").alias("q_cell"),
    )
    joined = q.join(
        e,
        (F.col("q_cell") == F.col("ivf_cell")) & (F.col("q_vec_id") != F.col("vec_id")),
    )
    scored = joined.withColumn("cosine", cosine_expr("q_embedding", "embedding"))
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("q_vec_id", "vec_id", "cosine", "rank")
    )


from purldb_spark.operators.ivf import top2_cells_expr, top2_cells_sql  # noqa: E402


@query(
    "knn_ivf_nprobe2",
    oracle=f"""
    WITH cells AS (
      SELECT vec_id, embedding, {cell_sql("embedding")} AS ivf_cell
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_vec_id, embedding AS q_embedding,
                 {top2_cells_sql("embedding")} AS probe_cells
          FROM embeddings WHERE vec_id % 50 = 0),
    probes AS (
      SELECT q_vec_id, q_embedding, unnest(probe_cells) AS probe_cell FROM q
    ),
    scored AS (
      SELECT p.q_vec_id, i.vec_id,
             {cosine_sql_duckdb("p.q_embedding", "i.embedding")} AS cosine,
             row_number() OVER (
               PARTITION BY p.q_vec_id
               ORDER BY {cosine_sql_duckdb("p.q_embedding", "i.embedding")} DESC,
                        i.vec_id
             ) AS rank
      FROM probes p
      JOIN cells i ON p.probe_cell = i.ivf_cell AND p.q_vec_id <> i.vec_id
    )
    SELECT q_vec_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= 3
    """,
)
def knn_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2 (operators/ivf.py::top2_cells_expr): each query
    searches its own cell AND the runner-up centroid's cell, recovering the
    neighbors knn_ivf_cell loses across cell boundaries — the standard IVF
    recall knob, costing one extra inverted-list read per query while index
    layout, partitioning, and storage stay identical. Measured vs exact
    top-3 at sf0.1: recall@3 0.28 (nprobe=1) -> 0.48 (nprobe=2); the low
    absolute numbers are a property of near-random 64-dim vectors split 8
    ways, the doubling is the operator's point."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "ivf_cell", cell_expr("embedding")
    )
    q = (
        e.filter(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("q_vec_id"),
            F.col("embedding").alias("q_embedding"),
            F.explode(top2_cells_expr("embedding")).alias("probe_cell"),
        )
    )
    joined = q.join(
        e,
        (F.col("probe_cell") == F.col("ivf_cell"))
        & (F.col("q_vec_id") != F.col("vec_id")),
    )
    scored = joined.withColumn(
        "cosine", cosine_expr("q_embedding", "embedding")
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("q_vec_id", "vec_id", "cosine", "rank")
    )


# ------------------------------------------------- decontam + clustering --


@query(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    bench AS (SELECT DISTINCT sh FROM shingles WHERE doc_id % 37 = 0),
    corpus AS (SELECT * FROM shingles WHERE doc_id % 37 <> 0),
    sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1),
    hits AS (
      SELECT c.doc_id, count(*) AS overlap
      FROM corpus c JOIN bench b ON c.sh = b.sh
      GROUP BY 1
    )
    SELECT h.doc_id, h.overlap, s.n_shingles,
           CAST(h.overlap AS DOUBLE) / s.n_shingles AS contamination
    FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing word
    3-gram shingles with a held-out benchmark slice (here doc_id % 37 = 0
    stands in for the benchmark). One broadcast hash join of the corpus
    shingles against the distinct benchmark shingles + a per-document
    count — linear in corpus size (operators/dedup.py::
    contamination_overlap)."""
    from purldb_spark.operators.dedup import contamination_overlap

    docs = load(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=3)
    bench = sh.filter(F.col("doc_id") % 37 == 0)
    corpus = sh.filter(F.col("doc_id") % 37 != 0)
    return contamination_overlap(corpus, bench, "doc_id")


@query(
    "dedup_cluster_cc",
    oracle=f"""
    WITH RECURSIVE shingles AS ({_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS intersection
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    near AS (
      SELECT doc_a, doc_b FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(intersection AS DOUBLE) / (sa.n + sb.n - intersection) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM near
      UNION SELECT doc_b, doc_a FROM near
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b, reach.r FROM edges e JOIN reach ON reach.node = e.a
    )
    SELECT node AS doc_id, min(r) AS cluster_id
    FROM reach GROUP BY node
    """,
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components over the exact jaccard
    >= 0.5 near-dup pairs, component id = smallest doc_id
    (operators/dedup.py::connected_components — min-label propagation,
    one join + aggregation + localCheckpoint per wave). The DuckDB
    oracle computes the same closure with WITH RECURSIVE — the driver
    comparison therefore checks true transitive-closure equality, not
    just pair parity.

    The pair table comes from the shared session fixture
    (fixture_cache.near_dup_pairs) — in production it is materialized
    state appended by the incremental dedup pipeline
    (streaming/dedup_stream.py), read here like the match family reads
    the BAH128 index."""
    from purldb_spark.operators.dedup import connected_components
    from purldb_spark.plans.fixture_cache import near_dup_pairs

    near = near_dup_pairs(spark, sf_dir)
    # thresholded near-dup clusters are near-cliques: the changed-label
    # early-exit stops after 2-3 waves; max_iter stays a deep safety bound
    cc = connected_components(near, "doc_a", "doc_b")
    return cc.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
