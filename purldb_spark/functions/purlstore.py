"""Scan-storage sharding columns for purls.

Reference: clearcode/store_scans.py:157-175 — scans are stored in git
repos sharded by a short purl hash, with a per-purl directory path:

- get_purl_path: type[/namespace]/name/version
- get_purl_hash: sha512(purl)[:length], lower-cased (default length 3
  -> 4096 shards)

Both are pure column expressions; the hash doubles as a uniform
partitioning key at 100 TB (4096 shards of roughly equal size
regardless of ecosystem skew — the same property the reference uses
to spread scans across repos).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def purl_path(
    ptype: Column, namespace: Column, name: Column, version: Column
) -> Column:
    """type[/namespace]/name/version (store_scans.py:157-161)."""
    return F.concat_ws("/", ptype, namespace, name, version)


def purl_hash(purl: Column, length: int = 3) -> Column:
    """sha512(purl)[:length] lower-cased (store_scans.py:164-175)."""
    return F.lower(F.substring(F.sha2(purl, 512), 1, length))
