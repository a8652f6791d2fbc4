"""T7: crawl politeness — per-host rate limiting inside the fetch stage
(run_visit.py:192-211, 385-406: ≥1 s/host between fetches + robots delay).

Not a Spark primitive: rate limiting is imperative per-partition state, so
it lives in mapPartitions around the fetch callable. Two pieces:

- `partition_by_host`: co-locate each host's URIs on one partition so a
  single token bucket governs the host (per-host limits are meaningless if
  a host's URIs scatter across 1000 executors).
- `rate_limited_fetch`: the mapPartitions wrapper with a per-host
  token-bucket (min interval between calls), injectable clock/sleep for
  testability.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_by_host(
    frontier: DataFrame, uri_col: str = "uri", n_partitions: int | None = None
) -> DataFrame:
    """Hash-partition the frontier by host so each host lands on exactly one
    partition (the precondition for per-host politeness)."""
    # scheme per RFC 3986 (letters/digits/+-., any case); lowercase the host
    # so HTTP://Host and http://host share one bucket and unparseable URIs
    # don't all collapse into a single '' bucket with real empty-host rows
    with_host = frontier.withColumn(
        "host",
        F.lower(
            F.regexp_extract(
                F.col(uri_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?]+)", 1
            )
        ),
    )
    if n_partitions:
        return with_host.repartition(n_partitions, "host")
    return with_host.repartition("host")


def rate_limited_fetch(
    fetch: Callable[[str], str],
    min_interval_s: float = 1.0,
    clock: Callable[[], float] = time.monotonic,
    sleep: Callable[[float], None] = time.sleep,
):
    """Returns a mapPartitions function enforcing ≥min_interval_s between
    fetches to the same host within the partition. Rows must carry (uri,
    host); yields (uri, host, payload)."""

    def run(rows: Iterator) -> Iterator[tuple[str, str, str]]:
        last_call: dict[str, float] = {}
        for r in rows:
            host = r.host
            now = clock()
            wait = last_call.get(host, -1e18) + min_interval_s - now
            if wait > 0:
                sleep(wait)
            last_call[host] = clock()
            yield (r.uri, host, fetch(r.uri))

    return run
