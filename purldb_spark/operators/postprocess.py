"""Match post-processing: choose the best package per matched resource.

Reference: matchcode/pipes/matching.py:469-529
(match_purldb_resources_post_process + _match_purldb_resources_post_process)
and pipelines/matching.py remove_packages_without_resources.

Per ``*-extract`` directory, the reference counts how many matched
resources each candidate package covers (contents of NESTED extract
directories excluded), ranks packages by that coverage (descending),
then walks the ranking greedily: each package keeps the resources not
claimed by a higher-ranked package. Because the counts are computed
before any assignment, the greedy walk is equivalent to a per-resource
argmax over (coverage, tie-break) — which is how it is expressed here:
one aggregation for the counts, one window for the argmax, no loop.

Tie-break deviation: the reference's ordering of equal-coverage
packages is Python dict insertion order (first-resource-appearance
order); here ties break on the package id ascending — deterministic
under any partitioning, documented.

At 100 TB: both shuffles key on (directory, package) / resource — high
cardinality, no skew hot spots; the greedy loop of the reference
(per-directory Python iteration) becomes two set-oriented passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def assign_best_packages(matches: DataFrame) -> DataFrame:
    """(directory, resource_path, package_uid) match triples ->
    one (directory, resource_path, package_uid, package_coverage) row
    per resource, assigned to its best-covering package.

    Nested-archive contents are excluded the way the reference's
    ``exclude(path__regex=rf"^{directory_path}.*-extract\\/.*$")``
    does: rows whose path, inside the directory, crosses another
    ``*-extract/`` boundary are dropped before counting.
    """
    inside = F.substring(
        F.col("resource_path"), F.length("directory") + 1, 1 << 20
    )
    m = matches.filter(~inside.rlike(r".*-extract/.*"))
    counts = m.groupBy("directory", "package_uid").agg(
        F.count("*").alias("package_coverage")
    )
    ranked = m.join(counts, ["directory", "package_uid"])
    w = W.partitionBy("directory", "resource_path").orderBy(
        F.col("package_coverage").desc(), F.col("package_uid").asc()
    )
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("directory", "resource_path", "package_uid", "package_coverage")
    )


def surviving_packages(assignments: DataFrame) -> DataFrame:
    """Packages that kept at least one resource after reassignment —
    the complement of remove_packages_without_resources
    (pipelines/matching.py:136-139): per package, how many resources
    it retained."""
    return assignments.groupBy("package_uid").agg(
        F.count("*").alias("n_resources")
    )
