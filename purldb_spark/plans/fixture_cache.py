"""Session-scoped cache for materialized fixture/index frames.

The match-family queries (j6/j7/match_cascade/match_cascade_full) all join
against the same BAH128 fingerprint index — in a real deployment that index
is a precomputed table maintained by the indexing pipeline (the reference
stores it in Postgres, matchcode/models.py:247-265), not something every
query recomputes.  Mirroring that, the checkpointed index frame is built
once per (Spark application, sf_dir) and shared by every query in the
session: the expensive 64-column packed-bit aggregation runs once, and each
query pays only its own joins.

Entries are keyed by applicationId so a cached frame is never served to a
different session (localCheckpoint RDDs die with their session); stale
applications' entries are dropped on first touch from a new session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.conf import shuffle_partitions

# Lock / pidfile / eviction plumbing lives in fixture_runtime (hash-excluded:
# it shapes no query result — see that module's docstring for the invariant).
from purldb_spark.plans.fixture_runtime import (  # noqa: F401
    _BUCKETED,
    cached_fixture,
    cached_model,
    claim_bucketed_dir,
    touch_owner,
)


def doc_fingerprint_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE materialized BAH128 aggregation over documents serving the whole
    match family: j6/j7 take the hex chunk view, the cascade takes the int
    chunk view — grouping by (doc_id, n_chars) is the same partition as by
    doc_id (n_chars is functionally dependent), so one agg serves both.

    Returns the cached leaf with columns
    ``doc_id, n_chars, elements_count, bah128``.
    """
    from purldb_spark.catalog.tables import load
    from purldb_spark.functions.halohash import bah128_fingerprint

    def build() -> DataFrame:
        # one parquet file -> one input partition: spread the docs by the agg
        # key BEFORE the explode so the aggregation runs wide (and needs no
        # second shuffle — hash(doc_id) satisfies the groupBy clustering)
        n_part = shuffle_partitions(spark)
        words = (
            load(spark, sf_dir, "documents")
            .repartition(n_part, "doc_id")
            .select("doc_id", "n_chars", F.explode(F.split("text", " ")).alias("w"))
        )
        fp = bah128_fingerprint(words, ["doc_id", "n_chars"], "w")
        return fp.select(
            "doc_id", "n_chars", "elements_count", "bah128"
        ).localCheckpoint(eager=True)

    return cached_fixture(spark, f"doc_fp_base:{sf_dir}", build)


def near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-jaccard >= 0.5 near-dup PAIR TABLE over documents, shared
    by the clustering family (dedup_cluster_cc, dedup_cluster_keep_best,
    corpus_curate_pipeline).

    In production this is materialized state, not per-query work: the
    incremental dedup pipeline appends verified pairs per batch
    (streaming/dedup_stream.py writes exactly this table), so consumers
    read it like the match family reads the BAH128 index. Built once per
    (session, sf_dir) with an eager localCheckpoint; every DuckDB oracle
    still recomputes the pairs relationally from raw documents, so the
    cache can never mask a correctness bug."""

    def build() -> DataFrame:
        # read the shared shingle fixture instead of re-tokenizing the
        # corpus: one explode+distinct per session, not one per fixture
        sh = doc_shingles(spark, sf_dir)
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        a, b = sh.alias("a"), sh.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
                "inner",
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).alias("intersection"))
        )
        sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
        sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
        return (
            pairs.join(sa, "doc_a")
            .join(sb, "doc_b")
            .filter(
                F.col("intersection").cast("double")
                / (F.col("na") + F.col("nb") - F.col("intersection"))
                >= 0.5
            )
            .select("doc_a", "doc_b")
            .localCheckpoint(eager=True)
        )

    return cached_fixture(spark, f"near_dup_pairs:{sf_dir}", build)


def unit_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table with a unit-normalized ``u`` column, read and
    normalized ONCE per (session, sf_dir) and shared by the whole
    embedding/ANN family (dedup_embedding_*, knn_*). In production this is
    the materialized normalized-vector table the indexing pipeline writes
    next to the raw embeddings; per-query work should be joins and bucket
    keys, not re-normalization of the full corpus. Columns:
    ``vec_id, embedding, u``."""
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.knn import normalize_expr

    def build() -> DataFrame:
        # one parquet file -> one input partition: spread by vec_id so every
        # downstream key projection / join / verify runs wide instead of on
        # a single task (the banded-keys stage measured 1-task serial here)
        n_part = shuffle_partitions(spark)
        e = load(spark, sf_dir, "embeddings").repartition(n_part, "vec_id")
        return e.select(
            "vec_id", "embedding", normalize_expr("embedding").alias("u")
        ).localCheckpoint(eager=True)

    return cached_fixture(spark, f"unit_embeddings:{sf_dir}", build)


def doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct word-3-shingle table (doc_id, sh) over documents,
    materialized ONCE per (session, sf_dir) and shared by the whole
    shingle-based dedup family (minhash, incremental, capped jaccard,
    substring). In production this is the tokenized shingle table the
    ingestion pipeline writes next to the corpus — per-query work should
    be joins and signatures, not re-tokenizing 100 TB per query. Oracles
    recompute shingles relationally from raw documents, so the cache can
    never mask a correctness bug."""
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.dedup import word_shingles

    def build() -> DataFrame:
        n_part = shuffle_partitions(spark)
        docs = load(spark, sf_dir, "documents").repartition(n_part, "doc_id")
        return word_shingles(docs, "doc_id", "text", n=3).localCheckpoint(
            eager=True
        )

    return cached_fixture(spark, f"doc_shingles:{sf_dir}", build)


def minhash_band_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded MinHash signature table (doc_id, band_idx, band_key) —
    the persistent LSH band INDEX that incremental dedup appends to per
    batch (streaming/dedup_stream.py maintains exactly this table). Built
    from the shared shingle fixture once per (session, sf_dir); batch
    queries then pay only their equi-join against it, which is the
    production cost model (O(batch x collision rate), not O(corpus))."""
    from purldb_spark.operators.dedup import minhash_bands

    def build() -> DataFrame:
        sh = doc_shingles(spark, sf_dir)
        return minhash_bands(sh, "doc_id", 8, 2).localCheckpoint(eager=True)

    return cached_fixture(spark, f"minhash_band_index:{sf_dir}", build)


def capped_posting(spark: SparkSession, sf_dir: str, df_cap: int) -> DataFrame:
    """The df-capped rare-shingle posting table (doc_id, sh) — the inverted
    index the capped-jaccard candidate join reads. In production this is
    the stored posting list with hot shingles dropped at index-build time
    (they carry no dedup signal and cause the k^2 fan-out); queries only
    equi-join it. The oracle keeps deriving the cap relationally."""

    def build() -> DataFrame:
        sh = doc_shingles(spark, sf_dir)
        rare = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_cap)
            .select("sh")
        )
        return sh.join(rare, "sh", "inner").localCheckpoint(eager=True)

    return cached_fixture(spark, f"capped_posting:{df_cap}:{sf_dir}", build)


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash fingerprint table — stored state in production exactly
    like the reference's halohash fingerprints (matchcode/models.py:144-179
    keeps them as indexed columns, computed at ingest). 120-BIT since r11
    (doc_id, sim_lo, sim_hi — operators/simhash_wide.py): the r10 width
    audit showed the 60-bit layout's 15-bit pigeonhole bands saturate at
    N ~ 10^5-10^6 documents, and fingerprint LENGTH is SimHash's only
    scale knob; 30-bit bands push band-collision linearity to the
    10^9-10^10 regime. Without this fixture the banded self-join of
    dedup_simhash recomputes the 120-vote aggregation once PER SIDE
    (the 60-bit version measured 1.54s vs 0.38s off the materialized
    table at sf0.1); the oracle still derives fingerprints relationally
    from raw documents, so the cache cannot mask a vote-aggregation
    bug."""
    from purldb_spark.operators.simhash_wide import simhash_wide

    def build() -> DataFrame:
        toks = doc_shingles(spark, sf_dir).withColumnRenamed("sh", "tok")
        return simhash_wide(toks, "doc_id").localCheckpoint(eager=True)

    return cached_fixture(spark, f"simhash_wide_fingerprints:{sf_dir}", build)


def dir_fingerprint_index(
    spark: SparkSession, sf_dir: str, kind: str
) -> DataFrame:
    """The BAH128 directory fingerprint index over the synthetic part tree
    (kind = 'content' | 'structure') — in the reference these ARE stored
    tables (ApproximateDirectory{Content,Structure}Index,
    matchcode/models.py:247-265), maintained at ingest and only read at
    query time. The 64-long-column bit-majority aggregation dominates the
    x_bah128_* queries at bench scale (planning + codegen of the wide
    agg, ~3s/call at sf0.1 vs ~0.2s reading the materialized frame); the
    oracle still recomputes every fingerprint from the raw file listing,
    so the cache cannot mask an aggregation bug."""
    from purldb_spark.functions.halohash import directory_fingerprints

    def build() -> DataFrame:
        from purldb_spark.plans.q_halohash import _files

        return directory_fingerprints(
            _files(spark, sf_dir), kind=kind
        ).localCheckpoint(eager=True)

    return cached_fixture(spark, f"dir_fp:{kind}:{sf_dir}", build)


def emb_band_index(
    spark: SparkSession,
    sf_dir: str,
    key: str,
    bands: list[list[list[float]]],
) -> DataFrame:
    """The embedding LSH band-key table (vec_id, band_idx, bucket) for one
    band layout — the vector twin of minhash_band_index: in production the
    indexing pipeline writes these keys next to the embeddings and batch
    queries only equi-join against them. Materializing it also hoists the
    bands x planes x dim literal-matrix projection (a large codegen unit —
    measured ~2.5 s of per-query compile at the 4-band config) out of every
    query into one session-scoped build."""
    from purldb_spark.operators.knn import index_keys

    def build() -> DataFrame:
        e = unit_embeddings(spark, sf_dir)
        return index_keys(e, "vec_id", "embedding", bands).localCheckpoint(
            eager=True
        )

    return cached_fixture(spark, f"emb_band_index:{key}:{sf_dir}", build)


def trained_centroids(
    spark: SparkSession, sf_dir: str, k: int, iters: int
) -> list[list[float]]:
    """The trained k-means centroids (k x dim driver-side doubles) for one
    (corpus, k, iters) config — the model artifact an indexing pipeline
    trains ONCE and every downstream consumer reads: kmeans_train
    materializes its cell assignment from it and knn_trained_ivfpq_refine
    probes the cells it defines. Before this cache each of those queries
    re-ran the full Lloyd loop (~3 s of iteration jobs at sf0.1) to arrive
    at the identical centroid list. Oracles recompute the unrolled Lloyd
    CTEs from raw embeddings, so the cache can never mask a training bug."""
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.kmeans import kmeans_fit

    def build():
        e = load(spark, sf_dir, "embeddings")
        return kmeans_fit(e, "embedding", "vec_id", k, iters)

    return cached_model(spark, f"kmeans:{sf_dir}:{k}:{iters}", build)


def trained_pq_codebooks(
    spark: SparkSession, sf_dir: str, m: int, ksub: int, iters: int
) -> list[list[list[float]]]:
    """TRAINED product-quantizer codebooks: one independent Lloyd k-means
    per subspace over the corpus' sliced sub-vectors (Jegou et al. 2011
    section III: "each sub-quantizer is learned by k-means on the
    corresponding sub-vectors") — the trained twin of the FROZEN codebooks
    in pq_codebooks.json that operators/pq.py ships. m subspaces of
    dim/m dims each, ksub centroids per subspace; returns
    m x ksub x (dim/m) driver-side doubles (a few KB — the model artifact).
    Oracles recompute via per-subspace unrolled Lloyd CTE chains
    (kmeans_cells_ctes with a sub-space prefix), so the cache can never
    mask a training bug."""
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.kmeans import kmeans_fit

    def build():
        import concurrent.futures as cf

        e = load(spark, sf_dir, "embeddings")
        dim = len(e.select("embedding").first()["embedding"])
        sub = dim // m

        def fit(si: int):
            sliced = e.select(
                "vec_id",
                F.expr(f"slice(embedding, {si * sub + 1}, {sub})").alias(
                    "subv"
                ),
            )
            return kmeans_fit(sliced, "subv", "vec_id", ksub, iters)

        # the m sub-quantizers are INDEPENDENT Lloyd fits (Jegou III:
        # one k-means per sub-vector block) — submit them concurrently;
        # each fit's per-iteration jobs are small shuffles that leave
        # local[32] (and a real cluster) underfilled when run serially
        with cf.ThreadPoolExecutor(max_workers=m) as ex:
            return list(ex.map(fit, range(m)))

    return cached_model(spark, f"pqtrain:{sf_dir}:{m}:{ksub}:{iters}", build)


def trained_pq_code_index(
    spark: SparkSession, sf_dir: str, m: int, ksub: int, iters: int
) -> DataFrame:
    """Tall trained-PQ code table (vec_id, subspace, cluster 1-based) under
    the TRAINED codebooks (trained_pq_codebooks) — the compressed index
    payload in join-friendly form for ADC scoring. One corpus scan encodes
    all m subspaces; oracles re-derive codes from the per-subspace unrolled
    Lloyd chains."""
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.kmeans import assign_expr

    def build() -> DataFrame:
        books = trained_pq_codebooks(spark, sf_dir, m, ksub, iters)
        e = load(spark, sf_dir, "embeddings")
        dim = len(books[0][0]) * m
        sub = dim // m
        coded = e.select(
            "vec_id",
            *[
                assign_expr(
                    f"slice(embedding, {si * sub + 1}, {sub})", books[si]
                ).alias(f"c{si}")
                for si in range(m)
            ],
        )
        stack_args = ", ".join(f"{si}L, c{si}" for si in range(m))
        n_part = shuffle_partitions(spark)
        return (
            coded.selectExpr(
                "vec_id", f"stack({m}, {stack_args}) as (subspace, cluster)"
            )
            .repartition(n_part, "vec_id")
            .localCheckpoint(eager=True)
        )

    return cached_fixture(
        spark, f"trained_pq_codes:{sf_dir}:{m}:{ksub}:{iters}", build
    )


def pq_code_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ code table (vec_id, codes) — 8 4-bit codes per vector, the
    compressed payload of the IVFPQ inverted lists. In production this IS
    the index the pipeline writes (4 bytes/vector); queries join it by id
    or scan it per cell. Materializing it also hoists encode_expr's
    8 subspaces x 16 codes x 8-dim literal-distance codegen (the measured
    bulk of every PQ query's wall time, same lesson as emb_band_index) out
    of the per-query path. Oracles re-encode from raw embeddings in SQL."""
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.pq import encode_expr

    def build() -> DataFrame:
        n_part = shuffle_partitions(spark)
        e = load(spark, sf_dir, "embeddings").repartition(n_part, "vec_id")
        return e.select(
            "vec_id", encode_expr("embedding").alias("codes")
        ).localCheckpoint(eager=True)

    return cached_fixture(spark, f"pq_code_index:{sf_dir}", build)


def ivf_cell_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frozen-centroid IVF cell assignment (vec_id, cell) shared by the
    PQ probe path — the cell column of the materialized index table
    (operators/ivf.py's 8 shipped centroids define the cells)."""
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.ivf import cell_expr

    def build() -> DataFrame:
        n_part = shuffle_partitions(spark)
        # not-null before cell assignment: a production index table never
        # holds a vectorless row (operators/ivf.py ingest invariant)
        e = (
            load(spark, sf_dir, "embeddings")
            .filter(F.col("embedding").isNotNull())
            .repartition(n_part, "vec_id")
        )
        return e.select(
            "vec_id", cell_expr("embedding").cast("long").alias("cell")
        ).localCheckpoint(eager=True)

    return cached_fixture(spark, f"ivf_cell_index:{sf_dir}", build)


def kmeans_cell_index(
    spark: SparkSession, sf_dir: str, k: int, iters: int
) -> DataFrame:
    """The TRAINED cell assignment (vec_id, cell) under the shared
    trained_centroids model — what kmeans_train materializes and
    knn_trained_ivfpq_refine probes. One argmin-over-k-literal-centroids
    pass per session instead of per query."""
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.kmeans import assign_expr

    def build() -> DataFrame:
        cents = trained_centroids(spark, sf_dir, k, iters)
        n_part = shuffle_partitions(spark)
        e = load(spark, sf_dir, "embeddings").repartition(n_part, "vec_id")
        return e.select(
            "vec_id", assign_expr("embedding", cents).alias("cell")
        ).localCheckpoint(eager=True)

    return cached_fixture(spark, f"kmeans_cell_index:{sf_dir}:{k}:{iters}", build)


def dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The connected-components cluster table (doc_id, cluster_id) over the
    near-dup pairs — shared by dedup_cluster_cc, dedup_cluster_keep_best
    and corpus_curate_pipeline, which otherwise each re-run the pointer-
    jumping waves. In production the CC labels are materialized state
    refreshed per dedup batch (the pairs table feeding them already is —
    see near_dup_pairs); the waves themselves still execute exactly once
    per session, so the driver oracle's WITH RECURSIVE closure check is as
    strong as before."""
    from purldb_spark.operators.dedup import connected_components

    def build() -> DataFrame:
        near = near_dup_pairs(spark, sf_dir)
        cc = connected_components(near, "doc_a", "doc_b")
        return cc.select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
        ).localCheckpoint(eager=True)

    return cached_fixture(spark, f"dup_clusters:{sf_dir}", build)


def bucketed_orderkey_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = 16
) -> tuple[str, str]:
    """Materialize `lineitem` and `orders` as storage-BUCKETED tables
    (bucketBy on the orderkey, same bucket count both sides) and return the
    two table names. Built once per (session, sf_dir) — the co-located-join
    counterpart of the band/cell indexes above: in production the ingest
    pipeline bucket-writes its biggest FK pair ONCE, and every downstream
    join on that key runs with zero Exchange on either side (Spark's
    storage-partitioned join contract: equal bucket counts + join key =
    bucket key). At 100 TB this converts the engine's most frequent join
    from a 2-sided shuffle into a local merge per bucket; the bucket count
    scales with cluster width, not data size.

    Files land under the repo-scratch `.bucketed/<appId>/` (the `.scale`
    convention); the catalog entries are per-session (in-memory catalog),
    so a new session rebuilds them exactly like every other fixture."""
    import hashlib
    import os

    key = (spark.sparkContext.applicationId, sf_dir)
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    app = spark.sparkContext.applicationId
    root = os.path.join(here, ".bucketed")
    if key in _BUCKETED:
        # refresh the legacy idleness clock on every cache hit (runtime
        # sweep semantics live in fixture_runtime)
        touch_owner(root, app)
        return _BUCKETED[key]
    from purldb_spark.catalog.tables import load

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:6]
    # claim this session's directory (pidfile first, before any table file
    # lands in it) and evict only PROVABLY DEAD sessions' directories — a
    # concurrent session (parallel bench / test run / CI worker) must never
    # lose its live table files mid-query
    claim_bucketed_dir(root, app)
    names: list[str] = []
    for base, keycol in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        name = f"bk_{base}_{sfx}"
        if not spark.catalog.tableExists(name):
            (
                # align input partitions to buckets so the write runs
                # n_buckets-wide (one task per bucket) instead of one task
                # writing all 16 files from the single parquet partition
                load(spark, sf_dir, base)
                .repartition(n_buckets, keycol)
                .write.mode("overwrite")
                .option(
                    "path",
                    os.path.join(
                        here, ".bucketed", spark.sparkContext.applicationId, name
                    ),
                )
                .bucketBy(n_buckets, keycol)
                .sortBy(keycol)
                .saveAsTable(name)
            )
        names.append(name)
    _BUCKETED[key] = (names[0], names[1])
    return _BUCKETED[key]


def residual_frame(
    spark: SparkSession, sf_dir: str, k: int, iters: int
) -> DataFrame:
    """(vec_id, cell, resid): each vector's RESIDUAL to its trained coarse
    centroid — the quantity the faithful IVFADC pipeline encodes (Jegou et
    al. 2011 §IV-A: the product quantizer is learned and applied on
    r(x) = x - q_coarse(x), not on raw vectors). Exact arithmetic both
    engines agree on bit-for-bit: centroid components come off the
    fixed-point-grid Lloyd means, the subtraction is one IEEE double op on
    identical inputs. Oracles re-derive residuals from the unrolled coarse
    chain, so this cache can never mask a training bug."""
    from purldb_spark.catalog.tables import load

    def build() -> DataFrame:
        cents = trained_centroids(spark, sf_dir, k, iters)
        cells = kmeans_cell_index(spark, sf_dir, k, iters)
        cent_df = spark.createDataFrame(
            [(ci + 1, [float(x) for x in cents[ci]]) for ci in range(k)],
            "cell long, cv array<double>",
        )
        e = load(spark, sf_dir, "embeddings")
        n_part = shuffle_partitions(spark)
        return (
            e.join(cells, "vec_id")
            .join(F.broadcast(cent_df), "cell")
            .select(
                "vec_id",
                "cell",
                F.expr(
                    "zip_with(embedding, cv,"
                    " (a, b) -> cast(a as double) - b)"
                ).alias("resid"),
            )
            .repartition(n_part, "vec_id")
            .localCheckpoint(eager=True)
        )

    return cached_fixture(
        spark, f"residual_frame:{sf_dir}:{k}:{iters}", build
    )


def trained_residual_codebooks(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    iters: int,
    m: int,
    ksub: int,
    pq_iters: int,
) -> list[list[list[float]]]:
    """PQ codebooks trained on RESIDUAL sub-vectors (the IVFADC
    construction) — one independent Lloyd fit per subspace over
    residual_frame's slices; same driver-side model-artifact shape as
    trained_pq_codebooks."""
    from purldb_spark.operators.kmeans import kmeans_fit

    def build():
        import concurrent.futures as cf

        res = residual_frame(spark, sf_dir, k, iters)
        dim = len(res.select("resid").first()["resid"])
        sub = dim // m

        def fit(si: int):
            sliced = res.select(
                "vec_id",
                F.expr(f"slice(resid, {si * sub + 1}, {sub})").alias("subv"),
            )
            return kmeans_fit(sliced, "subv", "vec_id", ksub, pq_iters)

        # independent per-subspace fits, submitted concurrently (same
        # rationale as trained_pq_codebooks)
        with cf.ThreadPoolExecutor(max_workers=m) as ex:
            return list(ex.map(fit, range(m)))

    return cached_model(
        spark, f"respq:{sf_dir}:{k}:{iters}:{m}:{ksub}:{pq_iters}", build
    )


def residual_code_index(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    iters: int,
    m: int,
    ksub: int,
    pq_iters: int,
) -> DataFrame:
    """Tall residual-PQ code table (vec_id, subspace, cluster 1-based)
    under the residual-trained codebooks — the IVFADC inverted-list
    payload in join-friendly form."""
    from purldb_spark.operators.kmeans import assign_expr

    def build() -> DataFrame:
        books = trained_residual_codebooks(
            spark, sf_dir, k, iters, m, ksub, pq_iters
        )
        res = residual_frame(spark, sf_dir, k, iters)
        dim = len(books[0][0]) * m
        sub = dim // m
        coded = res.select(
            "vec_id",
            *[
                assign_expr(
                    f"slice(resid, {si * sub + 1}, {sub})", books[si]
                ).alias(f"c{si}")
                for si in range(m)
            ],
        )
        stack_args = ", ".join(f"{si}L, c{si}" for si in range(m))
        n_part = shuffle_partitions(spark)
        return (
            coded.selectExpr(
                "vec_id", f"stack({m}, {stack_args}) as (subspace, cluster)"
            )
            .repartition(n_part, "vec_id")
            .localCheckpoint(eager=True)
        )

    return cached_fixture(
        spark,
        f"residual_codes:{sf_dir}:{k}:{iters}:{m}:{ksub}:{pq_iters}",
        build,
    )
