"""End-to-end mining dataflow (SURVEY §3.2's collect lifecycle, batch form):

  seeds -> Router dispatch -> visit-to-fixpoint crawl (discovering package
  URIs from listing pages) -> registry-doc mapping -> merge_or_create into
  the catalog -> re-mine with richer data -> level-gated merge.

Everything composes the real modules; the only fake is the in-memory
"registry" the visit callable reads instead of HTTP (T7's fetch seam).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from purldb_spark.operators.merge import MergeSpec, Policy, merge_upsert
from purldb_spark.operators.router import Router, seed_frontier
from purldb_spark.streaming.queue import visit_to_fixpoint

# a tiny crawlable "registry": listing pages point at package pages
REGISTRY = {
    "https://reg.example/index": ["https://reg.example/pkg/a", "https://reg.example/pkg/b"],
    "https://reg.example/pkg/a": ["https://reg.example/pkg/a@1.0.0", "https://reg.example/pkg/a@1.1.0"],
    "https://reg.example/pkg/b": ["https://reg.example/pkg/b@2.0.0"],
}

SPEC = MergeSpec(
    key="purl",
    fields={"description": Policy.FILL_IF_NULL, "homepage": Policy.REPLACE},
    level_col="mining_level",
)


def test_mining_pipeline_end_to_end(spark):
    router = Router()
    router.append(r"https://reg\.example/.*", lambda uri: REGISTRY.get(uri, []), name="reg")

    # 1. crawl to fixpoint: discovers listing pages then version pages
    def visit(frontier):
        rows = [
            (child,)
            for r in frontier.collect()  # tiny frontier: driver-side fetch seam
            for child in router.resolve(r.uri)(r.uri)
        ]
        return (
            spark.createDataFrame(rows, ["uri"])
            if rows
            else spark.createDataFrame([], "uri string")
        )

    seen = visit_to_fixpoint(seed_frontier(spark, ["https://reg.example/index"]), visit)
    uris = sorted(r.uri for r in seen.collect())
    assert len(uris) == 6  # index + 2 package pages + 3 version pages

    # 2. map version URIs -> package rows (X2 mapper shape)
    versions = seen.filter(F.col("uri").rlike("@"))
    mined = versions.select(
        F.regexp_replace(
            F.regexp_extract("uri", r"pkg/(.*)$", 1), "^", "pkg:npm/"
        ).alias("purl"),
        F.lit(None).cast("string").alias("description"),
        F.concat(F.lit("page:"), F.col("uri")).alias("homepage"),
        F.lit(1).alias("mining_level"),
    )

    # 3. merge into an empty catalog -> 3 inserts
    empty = spark.createDataFrame(
        [], "purl string, description string, homepage string, mining_level int"
    )
    catalog, conflicts = merge_upsert(empty, mined, SPEC)
    assert catalog.count() == 3 and conflicts.count() == 0

    # 4. re-mine at higher level with richer data -> fill + replace
    richer = spark.createDataFrame(
        [("pkg:npm/a@1.0.0", "package a", "https://home.example/a", 5)],
        "purl string, description string, homepage string, mining_level int",
    )
    catalog2, _ = merge_upsert(
        catalog.withColumn("mining_level", F.lit(1)), richer, SPEC
    )
    rows = {r.purl: r for r in catalog2.collect()}
    assert len(rows) == 3
    enriched = rows["pkg:npm/a@1.0.0"]
    assert enriched.description == "package a"  # filled (was null)
    assert enriched.homepage == "https://home.example/a"  # replaced (level 5 > 1)
    untouched = rows["pkg:npm/b@2.0.0"]
    assert untouched.homepage.startswith("page:")  # unaffected
