"""Corpus-scaled LSH band width (operators/scale_params.py) — the coarse_k
recipe applied to BENCH_scale.md finding 1 (round 10)."""

from pyspark.sql import functions as F

from purldb_spark.operators.scale_params import (
    MIN_PLANES,
    PLANES_SLACK,
    lsh_n_planes,
    lsh_planes_for,
)


def test_formula_values():
    # floors out at MIN_PLANES for every verification corpus
    assert lsh_n_planes(1) == MIN_PLANES
    assert lsh_n_planes(500) == MIN_PLANES
    assert lsh_n_planes(2000) == MIN_PLANES
    assert lsh_n_planes(4095) == MIN_PLANES
    # engages past 2^(MIN+SLACK+1) - 1
    assert lsh_n_planes(4096) == MIN_PLANES  # floor(log2)=12 -> 12-4=8
    assert lsh_n_planes(8192) == 9
    assert lsh_n_planes(20000) == 10  # the salted-sf1 embeddings probe
    assert lsh_n_planes(50000) == 11  # sf1 documents
    # occupancy stays ~2^SLACK: doubling n adds one plane
    for n in (1 << 14, 1 << 17, 1 << 20):
        assert lsh_n_planes(2 * n) == lsh_n_planes(n) + 1


def test_formula_matches_sql_expression(spark):
    """The float-free SQL form lsh_band_plan evaluates in BOTH engines —
    greatest(MIN, length(bin(n)) - 1 - SLACK) — must equal the Python
    formula the index builders use, or the dashboard would report a
    different layout than the engine builds."""
    ns = [1, 2, 7, 8, 255, 500, 2000, 4095, 4096, 8191, 8192, 20000,
          50000, 10**6, 10**9]
    df = spark.createDataFrame([(n,) for n in ns], "n long").select(
        "n",
        F.expr(
            f"greatest({MIN_PLANES}, length(bin(n)) - 1 - {PLANES_SLACK})"
        ).alias("w"),
    )
    for r in df.collect():
        assert r["w"] == lsh_n_planes(r["n"]), r


def test_planes_for_yields_oracle_width_at_verification_scales(spark):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        assert lsh_planes_for(spark, sf) == MIN_PLANES


def test_dashboard_reports_what_builders_use(spark):
    """lsh_band_plan's n_planes row for embeddings must equal the width
    block_bands actually builds with — the dashboard exists to detect
    stale layouts, so it must not disagree with the engine."""
    from purldb_spark.plans.q_embed import block_bands
    from purldb_spark.plans.registry import QUERIES, load_inventory

    load_inventory()
    sf = "/root/testdata/sf0.01"
    rows = {
        r["table_name"]: r["n_planes"]
        for r in QUERIES["lsh_band_plan"](spark, sf).collect()
    }
    bands, _ = block_bands(spark, sf)
    assert rows["embeddings"] == len(bands[0])


def test_block_bands_prefix_stability(spark):
    """Fixed per-band seeds mean the verification-scale layout is exactly
    the oracle-baked _BLOCK_BANDS (no re-roll), and a wider layout shares
    its leading planes with the narrower one."""
    from purldb_spark.operators.knn import hyperplanes
    from purldb_spark.plans.q_embed import _BLOCK_BANDS, block_bands

    bands, key = block_bands(spark, "/root/testdata/sf0.01")
    assert bands == _BLOCK_BANDS
    assert key == "block8x8"
    wide = [hyperplanes(dim=64, n_planes=10, seed=100 + b) for b in range(8)]
    for b in range(8):
        assert wide[b][:8] == _BLOCK_BANDS[b]


def test_nprobe_formula_values():
    from purldb_spark.operators.scale_params import MIN_NPROBE, ivf_nprobe

    # floors at MIN_NPROBE for the oracle-baked verification k = 8
    assert ivf_nprobe(1) == MIN_NPROBE
    assert ivf_nprobe(8) == MIN_NPROBE
    # sqrt(nlist) beyond: the sf1 probe trains k = 80 cells
    assert ivf_nprobe(80) == 8
    assert ivf_nprobe(10000) == 100
    # probed-vector sublinearity: nprobe * N/k = N/sqrt(k) grows slower
    # than N under the coarse_k law k ~ N/250
    for n in (10**6, 10**8):
        k = n // 250
        assert ivf_nprobe(k) * (n // k) < n


def test_verification_corpora_stay_below_scaling_floors(spark):
    """ADVICE r10: the static oracles bake MIN_PLANES-wide LSH bands,
    k = _K coarse cells, and nprobe = MIN_NPROBE, all valid only while
    the verification corpora sit below the corpus-scaling thresholds.
    A silently-grown test corpus would invalidate every static oracle
    with nothing but a stderr warning as the clue — pin the invariant
    here so it fails loudly instead."""
    from purldb_spark.catalog.tables import load
    from purldb_spark.operators.scale_params import (
        MIN_NPROBE,
        MIN_PLANES,
        PLANES_SLACK,
        ivf_nprobe,
        lsh_n_planes,
    )
    from purldb_spark.plans.q_cluster import _CELL_TARGET, _K

    planes_ceiling = (1 << (MIN_PLANES + PLANES_SLACK + 1)) - 1  # 8191
    coarse_ceiling = _K * _CELL_TARGET  # 2000: coarse_k yields _K below it
    for sf in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        n = load(spark, sf, "embeddings").count()
        assert n <= planes_ceiling, (sf, n)
        assert lsh_n_planes(n) == MIN_PLANES, (sf, n)
        k = max(_K, n // _CELL_TARGET)
        assert n <= coarse_ceiling and k == _K, (sf, n, k)
        assert ivf_nprobe(k) == MIN_NPROBE, (sf, k)
        n_docs = load(spark, sf, "documents").count()
        assert lsh_n_planes(n_docs) == MIN_PLANES, (sf, n_docs)
