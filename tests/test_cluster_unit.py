"""Unit/property tests for the clustering & PQ family (operators/kmeans.py,
operators/pq.py, plans/q_cluster.py). The exact-hash oracle lives in
test_oracle.py like every registry query; these tests pin the algorithmic
properties the hash can't express."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def test_kmeans_iterations_reduce_inertia(spark):
    """Lloyd monotonicity: total within-cluster squared distance never
    increases across iterations (the textbook convergence invariant)."""
    from pyspark.sql import functions as F

    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.kmeans import (
        assign_expr,
        init_centroids,
        lloyd_step,
        sqdist_spark,
    )

    e = load(spark, SF_SMOKE, "embeddings")

    def inertia(cents):
        dists = (
            "array("
            + ", ".join(sqdist_spark("embedding", c) for c in cents)
            + ")"
        )
        return (
            e.select(F.expr(f"array_min({dists})").alias("d"))
            .agg(F.sum("d"))
            .collect()[0][0]
        )

    cents = init_centroids(e, "embedding", "vec_id", 8)
    vals = [inertia(cents)]
    for _ in range(3):
        cents = lloyd_step(e, "embedding", cents)
        vals.append(inertia(cents))
    for prev, nxt in zip(vals, vals[1:]):
        assert nxt <= prev + 1e-9, vals


def test_kmeans_assignment_is_argmin(spark):
    """Every row's assigned centroid is at least as close as any other."""
    from pyspark.sql import functions as F

    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.kmeans import (
        assign_expr,
        kmeans_fit,
        sqdist_spark,
    )

    e = load(spark, SF_SMOKE, "embeddings")
    cents = kmeans_fit(e, "embedding", "vec_id", 8, 2)
    dists = (
        "array(" + ", ".join(sqdist_spark("embedding", c) for c in cents) + ")"
    )
    bad = (
        e.select(
            assign_expr("embedding", cents).alias("cluster"),
            F.expr(f"{dists}").alias("ds"),
        )
        .filter(
            F.expr("element_at(ds, cast(cluster as int))")
            > F.expr("array_min(ds)")
        )
        .count()
    )
    assert bad == 0


def test_semantic_dedup_drops_only_true_neighbors(spark):
    """Every dropped vector really has a same-cell partner with cosine >=
    tau (no false drops), and kept+dropped partitions the corpus."""
    from purldb_spark.plans.q_cluster import _TAU
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    out = QUERIES["dedup_semantic"](spark, SF_SMOKE).toPandas()
    assert len(out) == out.vec_id.nunique()
    dropped = out[~out.is_kept]
    assert (dropped.n_better_dups >= 1).all()
    assert (out[out.is_kept].n_better_dups == 0).all()
    # sanity: the planted near-dup tail exists, so something must drop
    assert 0 < len(dropped) < len(out)


def test_pq_codes_valid_and_adc_tracks_true_distance(spark):
    """Codes are valid (m entries in [0, K)), and ADC is a usable distance
    surrogate on this corpus: positively correlated with the true squared
    L2 (Pearson > 0.4 measured 0.59 here) and its top-10 recalls a fifth
    of the true top-10. Near-orthogonal random vectors are PQ's worst
    case — all pairwise distances are almost equal, so 16 codes/subspace
    cannot rank sharply; on clustered real embeddings the same code size
    recalls far more. The exact-hash oracle pins the arithmetic; this
    pins the retrieval quality floor."""
    import numpy as np
    from pyspark.sql import functions as F

    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.pq import K, M, adc_expr, encode_expr

    e = load(spark, SF_SMOKE, "embeddings")
    codes = e.select(encode_expr("embedding").alias("codes")).toPandas()
    assert all(
        len(c) == M and all(0 <= v < K for v in c) for c in codes.codes
    )

    idx = e.select(
        F.col("vec_id"),
        F.col("embedding"),
        encode_expr("embedding").alias("codes"),
    )
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    true_d = (
        "aggregate(zip_with(qv, embedding, (x, y) ->"
        " (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))),"
        " 0D, (acc, v) -> acc + v)"
    )
    pairs = (
        q.join(F.broadcast(idx), F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            "vec_id",
            adc_expr("qv", "codes").alias("adc"),
            F.expr(true_d).alias("true_d"),
        )
        .toPandas()
    )
    corr = np.corrcoef(pairs.adc, pairs.true_d)[0, 1]
    assert corr > 0.4, corr
    rec = []
    for _, g in pairs.groupby("qid"):
        t = set(g.nsmallest(10, "true_d").vec_id)
        a = set(g.nsmallest(10, "adc").vec_id)
        rec.append(len(t & a) / 10)
    assert np.mean(rec) >= 0.2, rec


def test_ivfpq_index_is_smaller_on_disk(spark, tmp_path):
    """The claim in operators/pq.py's docstring, measured on ACTUAL bytes:
    write the raw vectors and the PQ codes to parquet (compression off so
    we measure representation, not codec luck) and compare file sizes.
    int32 code storage + parquet overhead keeps the bound conservative
    (the docstring's 64x assumes 4-bit packed codes)."""
    import os

    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.pq import encode_expr

    e = load(spark, SF_SMOKE, "embeddings")
    raw_dir = str(tmp_path / "raw")
    code_dir = str(tmp_path / "codes")
    e.select("vec_id", "embedding").coalesce(1).write.option(
        "compression", "none"
    ).parquet(raw_dir)
    e.select("vec_id", encode_expr("embedding").alias("codes")).coalesce(
        1
    ).write.option("compression", "none").parquet(code_dir)

    def parquet_bytes(d: str) -> int:
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    raw_b, code_b = parquet_bytes(raw_dir), parquet_bytes(code_dir)
    assert code_b * 4 <= raw_b, (code_b, raw_b)


def test_refine_output_ranked_by_exact_distance(spark):
    """knn_trained_ivfpq_refine returns contiguous ranks 1..k per query,
    ordered by the exact squared-L2 column (the re-rank metric), and every
    exact_d matches a from-scratch recomputation on the raw vectors. The
    end-to-end shortlist semantics are pinned by the DuckDB oracle in
    test_oracle.py; this pins the refine ordering + distance arithmetic."""
    from pyspark.sql import functions as F

    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.kmeans import sqdist_cols_spark
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    out = QUERIES["knn_trained_ivfpq_refine"](spark, SF_SMOKE)
    pdf = out.toPandas()
    assert not pdf.empty
    for _, g in pdf.groupby("q_vec_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        d = list(g["exact_d"])
        assert d == sorted(d)  # exact re-rank order, not ADC order
    # distances re-derived from raw vectors, outside the query's plan
    e = load(spark, SF_SMOKE, "embeddings")
    qv = e.select(F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("qe"))
    iv = e.select(F.col("vec_id"), F.col("embedding").alias("ie"))
    redone = (
        out.join(qv, "q_vec_id")
        .join(iv, "vec_id")
        .withColumn("d2", F.expr(sqdist_cols_spark("qe", "ie")))
        .filter(F.col("d2") != F.col("exact_d"))
        .count()
    )
    assert redone == 0


def test_multiprobe_expand_is_own_key_plus_bit_flips(spark):
    from pyspark.sql import functions as F

    from purldb_spark.operators.knn import multiprobe_expand

    keys = spark.createDataFrame(
        [(1, 0, 0b1010), (1, 1, 0b0001)],
        "vec_id long, band_idx int, bucket long",
    )
    rows = multiprobe_expand(keys, "vec_id", 4).collect()
    got = {(r["band_idx"], r["bucket"]) for r in rows}
    want = set()
    for b, bucket in ((0, 0b1010), (1, 0b0001)):
        want.add((b, bucket))
        for j in range(4):
            want.add((b, bucket ^ (1 << j)))
    assert got == want
    assert len(rows) == 2 * (1 + 4)  # one row per probe, no dedup


def test_shuffle_partitions_falls_back_on_non_numeric(spark):
    """OSS Spark rejects setting a non-numeric value on a live session, so
    the "auto" shape (AQE auto-partitioning platforms) is exercised with a
    stub session object."""
    from purldb_spark.conf import shuffle_partitions

    assert shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    class _Conf:
        def get(self, key, default=None):
            return "auto"

    class _SC:
        defaultParallelism = 7

    class _Fake:
        conf = _Conf()
        sparkContext = _SC()

    assert shuffle_partitions(_Fake()) == 7


# ---------------------------------------------------------------------------
# knn_hard_negatives
# ---------------------------------------------------------------------------


def test_hard_negatives_exclude_near_duplicates(spark):
    """Every mined negative must sit BELOW the near-dup gate (it would be a
    positive otherwise) and be the argmax cosine among in-cell non-dups —
    recomputed here with brute-force per-anchor scans."""
    from purldb_spark.plans.q_cluster import _HN_TOPK, _TAU
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    rows = QUERIES["knn_hard_negatives"](spark, SF_SMOKE).collect()
    assert rows, "probe anchors exist at sf0.01"
    for r in rows:
        assert r["cosine"] < _TAU
        assert 1 <= r["rank"] <= _HN_TOPK
        assert r["q_vec_id"] != r["neg_vec_id"]

    # per anchor: ranks are dense from 1 and cosine non-increasing
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_vec_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["cosine"] >= b["cosine"]


def test_hard_negatives_are_in_cell_maxima(spark):
    """The rank-1 negative equals the true in-cell non-dup argmax computed
    independently from the cell index + raw embeddings."""
    from purldb_spark.plans.fixture_cache import (
        kmeans_cell_index,
        unit_embeddings,
    )
    from purldb_spark.plans.q_cluster import _ITERS, _K, _TAU
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    rows = QUERIES["knn_hard_negatives"](spark, SF_SMOKE).collect()
    top1 = {r["q_vec_id"]: r["neg_vec_id"] for r in rows if r["rank"] == 1}

    cells = {
        r["vec_id"]: r["cell"]
        for r in kmeans_cell_index(spark, SF_SMOKE, _K, _ITERS).collect()
    }
    unit = {
        r["vec_id"]: r["u"]
        for r in unit_embeddings(spark, SF_SMOKE).select("vec_id", "u").collect()
    }
    for q, expect in top1.items():
        best, best_cos = None, None
        for vid, cell in cells.items():
            if vid == q or cell != cells[q]:
                continue
            cos = sum(a * b for a, b in zip(unit[q], unit[vid]))
            if cos >= _TAU:
                continue
            if best_cos is None or cos > best_cos or (
                cos == best_cos and vid < best
            ):
                best, best_cos = vid, cos
        assert best == expect, (q, best, expect)


# ---------------------------------------------------------------------------
# knn_recall_eval
# ---------------------------------------------------------------------------


def test_recall_eval_nprobe2_dominates_nprobe1(spark):
    """The eval harness must reproduce the IVF recall knob: probing two
    cells can only add ground-truth hits, and every count is bounded by
    the 3-per-anchor possible set."""
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    rows = {
        r["method"]: r
        for r in QUERIES["knn_recall_eval"](spark, SF_SMOKE).collect()
    }
    assert set(rows) == {"ivf_nprobe1", "ivf_nprobe2"}
    r1, r2 = rows["ivf_nprobe1"], rows["ivf_nprobe2"]
    assert r2["hits"] >= r1["hits"]
    assert r2["recall_e6"] >= r1["recall_e6"]
    for r in (r1, r2):
        assert 0 <= r["hits"] <= min(r["n_pairs"], r["possible"])
        assert r["recall_e6"] == r["hits"] * 1_000_000 // r["possible"]
    # nprobe1's candidates are a subset of nprobe2's cells, so the top-3
    # cutoffs can differ — but the pair budget per anchor is the same
    assert r1["possible"] == r2["possible"]


def test_recall_eval_agrees_with_registry_queries(spark):
    """hits(nprobe1) recomputed by intersecting the standalone
    knn_ivf_cell and knn_bruteforce registry outputs."""
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    gt = {
        (r["q_vec_id"], r["vec_id"])
        for r in QUERIES["knn_bruteforce"](spark, SF_SMOKE).collect()
        if r["rank"] <= 3
    }
    a1 = {
        (r["q_vec_id"], r["vec_id"])
        for r in QUERIES["knn_ivf_cell"](spark, SF_SMOKE).collect()
    }
    rows = {
        r["method"]: r
        for r in QUERIES["knn_recall_eval"](spark, SF_SMOKE).collect()
    }
    assert rows["ivf_nprobe1"]["hits"] == len(a1 & gt)


# ---------------------------------------------------------------------------
# pq_train
# ---------------------------------------------------------------------------


def test_pq_train_codes_are_argmin_over_trained_books(spark):
    """Every vector gets one 4-bit code per subspace, sizes are consistent,
    and each code is the true argmin over the trained codebook for that
    subspace (recomputed driver-side on a sample)."""
    from purldb_spark.plans.fixture_cache import trained_pq_codebooks
    from purldb_spark.plans.q_cluster import _PQ_ITERS, _PQK, _PQM
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    rows = QUERIES["pq_train"](spark, SF_SMOKE).collect()
    by_vec: dict[int, dict[int, int]] = {}
    sizes: dict[tuple[int, int], int] = {}
    for r in rows:
        assert 0 <= r["code"] < _PQK
        by_vec.setdefault(r["vec_id"], {})[r["subspace"]] = r["code"]
        sizes[(r["subspace"], r["code"])] = r["code_size"]
    for v, codes in by_vec.items():
        assert sorted(codes) == list(range(_PQM)), v

    # code_size really is the group count
    from collections import Counter

    counts = Counter((r["subspace"], r["code"]) for r in rows)
    assert counts == Counter(dict(sizes.items())) or all(
        sizes[k] == c for k, c in counts.items()
    )

    books = trained_pq_codebooks(spark, SF_SMOKE, _PQM, _PQK, _PQ_ITERS)
    assert len(books) == _PQM and all(len(b) == _PQK for b in books)
    emb = {
        r["vec_id"]: list(r["embedding"])
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .limit(20)
        .collect()
    }
    sub = len(next(iter(emb.values()))) // _PQM
    for v, vec in emb.items():
        for si in range(_PQM):
            sv = vec[si * sub : (si + 1) * sub]
            dists = [
                sum((float(a) - b) ** 2 for a, b in zip(sv, c))
                for c in books[si]
            ]
            assert by_vec[v][si] == dists.index(min(dists)), (v, si)


def test_pq_train_books_differ_across_subspaces(spark):
    """The sub-quantizers are trained independently — identical codebooks
    across subspaces would mean the slicing is broken."""
    from purldb_spark.plans.fixture_cache import trained_pq_codebooks
    from purldb_spark.plans.q_cluster import _PQ_ITERS, _PQK, _PQM

    books = trained_pq_codebooks(spark, SF_SMOKE, _PQM, _PQK, _PQ_ITERS)
    flat = {tuple(tuple(c) for c in b) for b in books}
    assert len(flat) == _PQM


# ---------------------------------------------------------------------------
# knn_fully_trained_ivfpq
# ---------------------------------------------------------------------------


def test_fully_trained_output_ranked_by_exact_distance(spark):
    """Final ranks follow exact_d (tie: vec_id), every returned pair lies
    in one of the query's ivf_nprobe(k) nearest trained cells (r11: the
    corpus-scaled multiprobe superset of the old own-cell invariant), and
    adc is a valid e6-grid integer."""
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.scale_params import ivf_nprobe
    from purldb_spark.plans.fixture_cache import (
        kmeans_cell_index,
        trained_centroids,
    )
    from purldb_spark.plans.q_cluster import _FT_TOPK, _ITERS, _K
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    rows = QUERIES["knn_fully_trained_ivfpq"](spark, SF_SMOKE).collect()
    assert rows
    cells = {
        r["vec_id"]: r["cell"]
        for r in kmeans_cell_index(spark, SF_SMOKE, _K, _ITERS).collect()
    }
    cents = trained_centroids(spark, SF_SMOKE, _K, _ITERS)
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load(spark, SF_SMOKE, "embeddings")
        .filter("vec_id % 50 = 0")
        .collect()
    }

    def probe_cells(vec: list[float]) -> set[int]:
        dists = sorted(
            (sum((a - b) ** 2 for a, b in zip(vec, c)), ci + 1)
            for ci, c in enumerate(cents)
        )
        return {cell for _, cell in dists[: ivf_nprobe(_K)]}

    by_q: dict[int, list] = {}
    for r in rows:
        assert cells[r["vec_id"]] in probe_cells(emb[r["q_vec_id"]])
        assert r["adc"] >= 0
        by_q.setdefault(r["q_vec_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _FT_TOPK
        for a, b in zip(rs, rs[1:]):
            assert (a["exact_d"], a["vec_id"]) < (b["exact_d"], b["vec_id"])


def test_fully_trained_adc_tracks_exact_distance(spark):
    """The trained-quantizer ADC must correlate with the exact distance on
    the refined shortlist — Spearman over the returned pairs > 0 (the
    quantizer is lossy, so not exact, but a trained codebook that doesn't
    track distance is a broken trainer)."""
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    rows = QUERIES["knn_fully_trained_ivfpq"](spark, SF_SMOKE).collect()
    pairs = [(r["adc"], r["exact_d"]) for r in rows]
    n = len(pairs)
    assert n >= 6
    concordant = sum(
        1
        for i in range(n)
        for j in range(i + 1, n)
        if (pairs[i][0] - pairs[j][0]) * (pairs[i][1] - pairs[j][1]) > 0
    )
    discordant = sum(
        1
        for i in range(n)
        for j in range(i + 1, n)
        if (pairs[i][0] - pairs[j][0]) * (pairs[i][1] - pairs[j][1]) < 0
    )
    assert concordant > discordant


def test_recall_fully_trained_row_is_consistent(spark):
    """One row, integer-exact fields, hits bounded by both pair count and
    the possible set, and the refine guarantee: every returned pair that
    IS in the exact top-k counts as a hit (recall > 0 on the planted
    near-dup structure)."""
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    rows = QUERIES["knn_recall_fully_trained"](spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["method"] == "fully_trained_ivfpq"
    assert 0 <= r["hits"] <= min(r["n_pairs"], r["possible"])
    assert r["recall_e6"] == r["hits"] * 1_000_000 // r["possible"]
    assert r["recall_e6"] > 0
