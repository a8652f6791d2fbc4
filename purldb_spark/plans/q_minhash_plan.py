"""minhash_band_plan — the MinHash (b, r) threshold decision as data.

The r10 parameter audit (operators/scale_params.py) recorded WHY MinHash
needs no corpus-scaled bucket width: band keys are concatenated min-hash
VALUES (a 2^120 key space), so random-pair collisions are governed by the
Jaccard similarity distribution, not N^2/2^bits. What that leaves
ungoverned is the (bands b, rows-per-band r) choice itself — it sets the
detection threshold t ~ (1/b)^(1/r) and the candidate probability curve
P(candidate | J) = 1 - (1 - J^r)^b (Leskovec/Rajaraman/Ullman, Mining of
Massive Datasets ch. 3; the reference's matchcode indexes fix an
analogous layout at ingest, matchcode/models.py). This dashboard is the
lsh_band_plan twin for the MinHash family: per candidate layout, the
S-curve at fixed Jaccard grid points, the signature storage bill at the
current corpus size, and which layout the registry ships
(operators/dedup.minhash_bands defaults: 8 hashes = 4 bands x 2 rows,
threshold ~0.5 — exactly the verify_jaccard >= 0.5 gate downstream).

Cross-engine exactness: every probability is an UNROLLED literal product
(J^r and (1-J^r)^b expanded to explicit multiplications — identical IEEE
double sequences in Spark and DuckDB; no pow(), whose libm rounding is
not contractually identical), floored onto the e6 BIGINT grid; corpus
counts are BIGINTs. The expression STRINGS are shared verbatim between
the Spark selectExpr and the oracle SQL, so the two engines parse the
same text.

Scale shape: one count(*) over documents (the memoized corpus_count job
in production) + a constant literal frame of layouts — zero shuffles of
corpus data; the dashboard costs nothing at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from purldb_spark.catalog.tables import load
from purldb_spark.plans.registry import query

# candidate layouts: (name, bands, rows_per_band); 4x2 is the shipped
# minhash_bands default (threshold ~(1/4)^(1/2) = 0.5, the verify gate)
_LAYOUTS = [
    ("8x1_recall", 8, 1),
    ("4x2_shipped", 4, 2),
    ("2x4_precision", 2, 4),
    ("6x2_wide", 6, 2),
]
_J_GRID = [25, 50, 75, 90]  # Jaccard grid points, in percent


def _p_cand_sql(j_pct: int, b: int, r: int) -> str:
    """floor(1e6 * (1 - (1 - J^r)^b)) as one unrolled literal expression —
    the identical text is handed to BOTH engines' parsers. Every numeric
    literal is CAST(... AS DOUBLE): both parsers otherwise type a bare
    decimal literal as DECIMAL, whose multiplication semantics (and
    overflow behavior) are not the IEEE sequence this contract needs."""
    one = "CAST(1.0 AS DOUBLE)"
    j = f"CAST({j_pct / 100.0!r} AS DOUBLE)"
    jr = " * ".join([j] * r)
    q = f"({one} - ({jr}))"
    qb = " * ".join([q] * b)
    return (
        f"CAST(floor(CAST(1000000.0 AS DOUBLE) * ({one} - ({qb})))"
        " AS BIGINT)"
    )


def _layout_cols(name: str, b: int, r: int, n_docs_sql: str) -> list[str]:
    """One layout's column expressions (the identical strings go to both
    engines); ``n_docs_sql`` yields the corpus document count as BIGINT."""
    return [
        f"'{name}' AS layout",
        f"CAST({b} AS BIGINT) AS n_bands",
        f"CAST({r} AS BIGINT) AS rows_per_band",
        f"CAST({b * r} AS BIGINT) AS n_hashes",
        f"{'TRUE' if name.endswith('_shipped') else 'FALSE'} AS is_shipped",
        f"CAST({n_docs_sql} AS BIGINT) AS n_docs",
        # stored band keys: per doc, b keys of r concatenated 32-hex-char
        # min-hash values -> b*r*32 bytes (the index the equi-join probes)
        f"CAST(({n_docs_sql}) * {b * r * 32} AS BIGINT) AS index_bytes",
    ] + [
        f"{_p_cand_sql(j, b, r)} AS p_cand_e6_at_{j}"
        for j in _J_GRID
    ]


@query(
    "minhash_band_plan",
    oracle=" UNION ALL ".join(
        "SELECT "
        + ", ".join(
            _layout_cols(name, b, r, "(SELECT count(*) FROM documents)")
        )
        for name, b, r in _LAYOUTS
    ),
)
def minhash_band_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (b, r) S-curve dashboard (module docstring). The Spark side
    evaluates the SAME expression strings over a one-row frame per layout
    (n_docs as a driver scalar off one count — the memoized
    corpus_count pattern, documented BNLJ avoidance)."""
    n_docs = load(spark, sf_dir, "documents").count()
    frames = [
        spark.range(1).selectExpr(
            *_layout_cols(name, b, r, str(int(n_docs)))
        )
        for name, b, r in _LAYOUTS
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
