"""Document deduplication — exact, MinHash-LSH, SimHash.

Not reference operators (purldb dedups packages by sha1 — U5); these are the
training-data-pipeline dedup family the brief asks for, built Spark-first:

- exact: hash-groupBy on md5(text) — one shuffle on the hash.
- MinHash-LSH: shingle -> k seeded min-hashes -> band keys -> candidate
  pairs via ONE equi-join on (band_idx, band_key) -> exact-jaccard verify of
  candidates only. The verify cost is O(candidates), not O(N²).
- SimHash: per-token hashes vote per bit -> b-bit fingerprint; near-dups =
  hamming ≤ t, found via banded equi-join (pigeonhole: hamming ≤ t over
  `t+1` bands means at least one band is identical).

Hashing is md5-based everywhere (the only hash both Spark and DuckDB share,
which keeps the oracle honest); the min-hash is the lexicographic min of the
seeded md5 hex — a uniform permutation of the shingle space, so the standard
MinHash estimator applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from purldb_spark.operators.windows import flag_duplicates_keep_best


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: md5(text) groups; lowest id is canonical, rest flagged."""
    hashed = df.select(id_col, F.md5(F.col(text_col)).alias("content_hash"))
    return flag_duplicates_keep_best(
        hashed, ["content_hash"], [F.asc(id_col)], id_col
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, sh). Documents
    shorter than n words are dropped (Spark's `sequence` would run BACKWARD
    on a negative length — sequence(1, 0) is [1, 0] — so the guard is
    load-bearing, not cosmetic).

    Tokenization (split + explode) is the expensive map of every dedup
    pipeline, so the operator guarantees it runs at full parallelism: when
    the input arrives in fewer partitions than the cluster's default
    parallelism (a small parquet file is one split), it is repartitioned
    first. At 100 TB the scan already has thousands of splits and the
    condition is false — no shuffle is added on the big-data path."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    return (
        df.select(id_col, F.split(F.col(text_col), " ").alias("w"))
        .filter(F.size("w") >= n)
        # r15: explode the POSITION sequence and slice per row instead of
        # transform(...) building the shingle array — higher-order
        # functions are interpreted per element (no codegen); the explode
        # and the slice/concat projection fuse into one codegen stage, so
        # `w` is never copied per output row.  Identical row multiset.
        .select(
            id_col,
            F.expr(f"explode(sequence(1, size(w) - {n - 1}))").alias("i"),
            "w",
        )
        .select(
            id_col,
            F.expr(f"concat_ws(' ', slice(w, i, {n}))").alias("sh"),
        )
        .dropDuplicates()
    )


def minhash_bands(
    shingles: DataFrame,
    id_col: str,
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """(id, band_idx, band_key): min-hash signature folded into bands.

    h_s(doc) = min over shingles of md5(s || '|' || shingle); band key =
    concat of `band_size` consecutive signature slots. One aggregation pass
    computes all hashes (map-side partial min)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("sh")))).alias(f"h{s}")
        for s in range(n_hashes)
    ]
    sig = shingles.groupBy(id_col).agg(*aggs)
    n_bands = n_hashes // band_size
    bands = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat(
                *[F.col(f"h{b * band_size + j}") for j in range(band_size)]
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    return sig.select(
        id_col, F.explode(F.array(*bands)).alias("band")
    ).select(id_col, F.col("band.band_idx"), F.col("band.band_key"))


def lsh_candidate_pairs(bands: DataFrame, id_col: str) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one band — a single
    self-equi-join on (band_idx, band_key)."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            "inner",
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .dropDuplicates()
    )


def incremental_lsh_dedup(
    new_bands: DataFrame,
    index_bands: DataFrame,
    id_col: str,
) -> DataFrame:
    """Production dedup flow: candidate pairs of NEW documents against an
    already-indexed corpus — one equi-join of the new batch's band table
    against the stored band index, never an all-pairs recompute. Returns
    (new_id, index_id) candidates; verify with verify_jaccard over the
    combined shingle table, then append the surviving new docs' bands to the
    index (idempotent keyed write).

    At 100 TB the band index is the persistent dedup state: partitioned by
    band_key hash, appended per batch, and the per-batch cost is
    O(batch x collision rate)."""
    a = new_bands.alias("a")
    b = index_bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key")),
            "inner",
        )
        .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("new_id"),
            F.col(f"b.{id_col}").alias("index_id"),
        )
        .dropDuplicates()
    )


def df_capped_candidate_pairs(
    shingles: DataFrame,
    id_col: str,
    df_cap: int,
    min_support: int = 1,
    jaccard_floor: float | None = None,
    posting: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs from the inverted index with a document-frequency cap:
    shingles held by more than `df_cap` documents are dropped from candidate
    generation (a shingle in k docs yields k² pair rows — hot shingles are
    the quadratic blow-up AND carry no dedup signal; DESIGN.md §dedup).
    `min_support` > 1 additionally requires that many SHARED rare shingles
    before a pair becomes a candidate — at jaccard >= 0.5 a true near-dup
    pair shares about half its shingles, so support 2 discards the long
    tail of single-collision pairs (the bulk of candidate volume) while
    keeping every plausibly-duplicate pair.

    Recall contract: a pair is missed only if fewer than `min_support` of
    its shared shingles are rare, which for near-duplicates (many shared
    shingles) is vanishingly rare. The exact-jaccard verify still runs over
    the FULL shingle sets, so every emitted pair's score is exact. All
    joins are equi-joins.

    With `jaccard_floor` set, candidates that provably cannot reach that
    jaccard are dropped BEFORE the expensive full-set verify, losslessly:
    a pair's true intersection I is bounded by I <= support + min(h_a, h_b)
    (every shared shingle is either rare — counted exactly in `support` —
    or hot, and a doc can share at most its own hot-shingle count h), and
    jaccard >= t requires (1+t)*I >= t*(n_a+n_b). The bound needs only a
    per-doc stats row (n total / h hot shingles — doc-count-sized, tiny
    next to the posting table), so the prune is one equi-join over the
    candidate list and typically kills the support-2..5 long tail that
    dominates candidate volume without touching recall.

    ``posting`` accepts a prebuilt df-capped posting table (the
    fixture_cache materialization) so a session computes the rare-shingle
    index once; when omitted it is derived from ``shingles`` here."""
    if posting is None:
        df_counts = shingles.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        rare = df_counts.filter(F.col("df") <= df_cap).select("sh")
        posting = shingles.join(rare, "sh", "inner")
    a = posting.alias("a")
    b = posting.alias("b")
    pair_support = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            "inner",
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    cands = pair_support.filter(F.col("support") >= min_support)
    if jaccard_floor is not None:
        n_total = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
        n_rare = posting.groupBy(id_col).agg(F.count(F.lit(1)).alias("r"))
        stats = n_total.join(n_rare, id_col, "left").select(
            id_col,
            "n",
            (F.col("n") - F.coalesce(F.col("r"), F.lit(0))).alias("h"),
        )
        st_a = stats.select(
            F.col(id_col).alias("id_a"),
            F.col("n").alias("n_a"),
            F.col("h").alias("h_a"),
        )
        st_b = stats.select(
            F.col(id_col).alias("id_b"),
            F.col("n").alias("n_b"),
            F.col("h").alias("h_b"),
        )
        t = float(jaccard_floor)
        cands = (
            cands.join(st_a, "id_a")
            .join(st_b, "id_b")
            .filter(
                (1.0 + t)
                * (F.col("support") + F.least(F.col("h_a"), F.col("h_b")))
                >= t * (F.col("n_a") + F.col("n_b"))
            )
        )
    return cands.select("id_a", "id_b")


def verify_jaccard(
    candidates: DataFrame, shingles: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact jaccard for candidate pairs only (the cheap LSH output gates the
    expensive exact verify — same cascade philosophy as the match engine).

    Scale shape: the shingle table is first left-semi-joined down to the
    documents that appear in any candidate pair, so the verify never
    shuffles postings for unpaired docs; the intersection is one equi-join
    on (id_b, sh) — per pair it materializes |shingles(a)| rows, never the
    |shingles(a)| x |shingles(b)| cross-product a join on id_b alone would."""
    pair_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .union(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    pruned = shingles.join(pair_ids, id_col, "semi")
    sizes = pruned.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = pruned.withColumnRenamed(id_col, "id_a")
    sb = pruned.withColumnRenamed(id_col, "id_b")
    inter = (
        candidates.join(sa, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    na = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n", "n_a")
    nb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n", "n_b")
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("intersection").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("intersection")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "intersection", "jaccard")
    )


# --------------------------------------------------------------- SimHash --

SIMHASH_BITS = 60


def simhash(df_tokens: DataFrame, id_col: str) -> DataFrame:
    """60-bit SimHash per document from distinct tokens (id, tok).

    Token hash = first 15 hex of md5 as int (60 bits keeps every value and
    every band arithmetic inside positive signed-64 territory on BOTH
    engines — no arithmetic-vs-logical shift or two's-complement edge);
    bit b of the fingerprint is the sign of sum(±1) of that bit over
    tokens. All bit votes aggregate in one groupBy pass (60 conditional
    sums — wide but single-shuffle, map-side combined).

    Width is a SCALE parameter: with 4 pigeonhole bands the per-band
    bucket count is 2^(bits/4), and band-join collisions grow
    N^2 / 2^(bits/4) — the 32-bit original (256 buckets/band) measured
    ~quadratic at 10x corpus (BENCH_scale.md finding 1 applies); 15-bit
    bands (32768 buckets) restore linear at probe scales, and production
    N grows the hash again (Google's original is 64-bit)."""
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    toks = df_tokens.withColumn("h", h)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{b}") > 0, 1 << b).otherwise(0)
        fp = term if fp is None else fp + term
    return agg.select(id_col, fp.cast("long").alias("simhash"))


def simhash_sql(id_col: str, tokens_sql: str) -> str:
    """DuckDB rendering of the same SimHash (oracle side)."""
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    return f"""
      SELECT {id_col}, CAST({fp} AS BIGINT) AS simhash FROM (
        SELECT {id_col}, {votes}
        FROM (SELECT {id_col}, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
              FROM ({tokens_sql}))
        GROUP BY {id_col}
      )
    """


def simhash_near_pairs(
    sim: DataFrame, id_col: str, max_hamming: int = 3, n_bands: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash hamming ≤ max_hamming, via banded join:
    split the fingerprint into `n_bands` equal slices; hamming ≤ n_bands-1
    guarantees ≥1 identical band (pigeonhole), so candidates come from a
    hash join, then bit_count verifies."""
    assert max_hamming < n_bands, "pigeonhole needs bands > max_hamming"
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    bands = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(mask)
            .alias("band_key"),
        )
        for b in range(n_bands)
    ]
    banded = sim.select(
        id_col, "simhash", F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "simhash", "band.band_idx", "band.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            "inner",
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))
    )


def contamination_overlap(
    corpus_shingles: DataFrame,
    benchmark_shingles: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per corpus document, how many of its
    distinct shingles appear anywhere in the benchmark set.

    The production concern behind it: training corpora must not contain
    evaluation data, and the standard check is n-gram overlap of each
    training document against the union of benchmark n-grams. Shape: the
    benchmark shingle set is tiny relative to the corpus — broadcast the
    distinct benchmark shingles and run one hash join over the exploded
    corpus shingles, then a per-document count. Linear in corpus size, no
    all-pairs anything; at 100 TB the only knob is the benchmark
    broadcast (spill to a shuffle join if the benchmark ever outgrows the
    driver, semantics unchanged).

    Returns (id, overlap, n_shingles, contamination) for documents with
    at least one benchmark hit.
    """
    bset = benchmark_shingles.select("sh").dropDuplicates()
    sizes = corpus_shingles.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        corpus_shingles.join(F.broadcast(bset), "sh", "inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return hits.join(sizes, id_col).select(
        id_col,
        "overlap",
        "n_shingles",
        (F.col("overlap").cast("double") / F.col("n_shingles")).alias(
            "contamination"
        ),
    )


def connected_components(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 10,
    stats: dict | None = None,
) -> DataFrame:
    """Duplicate clusters from near-dup pairs: connected components by
    min-label propagation, component id = smallest member id.

    Pair emitters (MinHash-LSH, SimHash, jaccard verify) produce EDGES;
    a dedup pipeline keeps one document per CLUSTER, so the transitive
    closure is the operator that actually drives deletion. Each wave
    combines neighbor-min propagation with POINTER JUMPING (label <-
    label of label), so labels converge in O(log diameter) waves — a
    diameter-2^k chain settles in ~k+1 waves. Each wave is two
    equi-joins + one aggregation, localCheckpointed (bounded lineage,
    the crawl-fixpoint lesson). ``max_iter`` waves cover components of
    diameter ~2^max_iter; near-dup clusters are near-cliques
    (similarity-thresholded pair generation), so the default is a deep
    safety margin, not a tuning knob. At 100 TB the same loop holds —
    this is pointer-jumping CC, the standard logarithmic variant.

    Convergence early-exit: labels only ever DECREASE under min-label
    propagation, so a wave with zero changed labels means fixpoint and
    the loop breaks — the changed-count is one filter+count action on
    the frame the wave already materializes via localCheckpoint, so at
    100 TB the check costs nothing beyond the wave itself while the
    deep ``max_iter`` bound stays a pure safety net (a near-clique
    settles in 2–3 waves instead of burning all 10 waves' shuffles).
    Pass ``stats={}`` to observe ``stats["waves"]`` (waves executed,
    including the one that detects the fixpoint).

    Returns (node, label) for every node appearing in an edge.
    """
    sym = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    # initialize each label to min(node, min neighbor) — one aggregation
    # that IS the first neighbor-min half-wave for free: in a clique every
    # non-minimum node sees the cluster minimum among its direct neighbors,
    # so the loop below converges one full wave (two joins + an agg at
    # 100 TB) earlier than an identity initialization
    labels = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("_mn"))
        .select("node", F.least(F.col("node"), F.col("_mn")).alias("label"))
    )
    waves = 0
    for _ in range(max_iter):
        waves += 1
        nbr = (
            sym.join(labels, sym["dst"] == labels["node"], "inner")
            .groupBy(F.col("src").alias("nbr_node"))
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = labels.join(
            nbr, labels["node"] == nbr["nbr_node"], "left"
        ).select(
            F.col("node"),
            F.col("label").alias("old_label"),
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping: adopt the label of the current label-node
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        nxt = (
            stepped.join(parent, stepped["label"] == parent["p_node"], "left")
            .select(
                F.col("node"),
                F.col("old_label"),
                F.least(
                    F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))
                ).alias("label"),
            )
            # the plan references itself per wave — truncate lineage
            .localCheckpoint(eager=False)
        )
        # this count is the action that materializes the checkpoint,
        # so convergence detection rides the wave's own materialization
        changed = nxt.filter(F.col("label") != F.col("old_label")).count()
        labels = nxt.drop("old_label")
        if changed == 0:
            break
    if stats is not None:
        stats["waves"] = waves
    return labels
