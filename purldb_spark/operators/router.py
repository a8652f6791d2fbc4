"""X1-X4: the visitor/mapper/collector registry — SURVEY §2.12.

The reference dispatches URIs to miners by regex route (minecode/route.py:
82-200: a Router holds (pattern, callable) rules; `resolve` returns the
first matching handler) and seeds the crawl from Seeder classes
(minecode/seed.py:21-66).

Spark-first shape: the route TABLE is data — a literal DataFrame of
(pattern, handler_name) — and dispatch over a URI column is a single
rlike-cascade expression, so routing a billion frontier rows is one
projection, not a driver loop. The handler bodies (fetch+parse) run either
driver-side (politeness-limited registry APIs, T7) or as mapPartitions over
the routed partitions.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Router:
    """Ordered (pattern -> handler) registry; first match wins
    (minecode/route.py:147-185)."""

    routes: list[tuple[str, str, Callable]] = field(default_factory=list)

    def append(self, pattern: str, handler: Callable, name: str | None = None) -> None:
        self.routes.append((pattern, name or handler.__name__, handler))

    def resolve(self, uri: str) -> Callable:
        for pattern, _name, handler in self.routes:
            if re.match(pattern, uri):
                return handler
        raise KeyError(f"no route for {uri!r}")

    def is_routable(self, uri: str) -> bool:
        return any(re.match(p, uri) for p, _n, _h in self.routes)

    def handler_col(self, uri_col: str = "uri") -> Column:
        """Vectorized dispatch: a CASE cascade of rlike tests producing the
        handler name per row — routing as a column expression."""
        expr = F.lit(None).cast("string")
        for pattern, name, _handler in reversed(self.routes):
            # rlike is unanchored; the Router semantics are re.match (anchored)
            anchored = pattern if pattern.startswith("^") else "^" + pattern
            expr = F.when(F.col(uri_col).rlike(anchored), F.lit(name)).otherwise(expr)
        return expr

    def route_frontier(self, frontier: DataFrame, uri_col: str = "uri") -> DataFrame:
        """Tag every frontier row with its handler; unroutable rows keep
        NULL (the reference drops them as non-visitable)."""
        return frontier.withColumn("handler", self.handler_col(uri_col))


def seed_frontier(spark, seeds: list[str]) -> DataFrame:
    """X4: Seeder -> a static seed DataFrame (minecode/seed.py:21-66)."""
    return spark.createDataFrame([(s,) for s in seeds], ["uri"])
