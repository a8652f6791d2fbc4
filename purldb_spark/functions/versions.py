"""Natural version ordering — SURVEY §2.8 W2 / §2.9 V2.

The reference sorts versions with natsort over the key
``version.replace('.', '~') + 'z'`` (packagedb/models.py:51-53), which gives
Debian-style semantics: numeric segments compare numerically and a
prerelease suffix sorts BEFORE its release ("1.2.3-beta1" < "1.2.3").
`univers` range filtering (packagedb/api.py:1309-1342) needs the same total
order.

Instead of a Python UDF we build an order-preserving STRING key entirely
JVM-side (regexp_extract_all + lpad + array_join): numeric segments are
zero-padded to fixed width, with sentinel suffixes separating prerelease
from release ordering (see nat_version_key). The identical
expression exists in DuckDB, which is what makes the oracle comparison
possible — and at 100 TB the key stays inside whole-stage codegen, is
cache-friendly for sorts, and never crosses the Python boundary.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_PAD = 12


def nat_version_key(col: str | Column) -> Column:
    """Order-preserving sort key for dotted versions w/ optional -suffix.

    Core numeric segments (before the first '-') and prerelease segments are
    kept SEPARATE: the key is `core + ('.+' for releases | '.!' + pre for
    prereleases)`. Sentinels: '!'(33) < '#'(35) < '+'(43) < '0'(48), giving
    every ordering at once — prerelease < its release ('!' < '+'), a release
    sorts below a longer core ('+' < digit: '0' < '0.0'), a prerelease
    never outranks a longer core ('!' < digit: '1.2-beta3' < '1.2.1'), and
    alphabetic segments (marker '#') interleave so '1.2a' < '1.2b' and
    '-alpha' < '-beta' tie-break textually while matching the reference
    natsort key's '1.2-beta' < '1.2a' < '1.2' < '1.2.1' ordering
    (packagedb/models.py:51-53). The sentinel cases were found by the
    hypothesis order-isomorphism test."""
    name = col if isinstance(col, str) else None
    if name is None:
        raise ValueError("pass the column name (expression builds SQL text)")
    core = f"regexp_extract({name}, '^([^-]*)', 1)"
    pre = f"regexp_extract({name}, '-(.*)$', 1)"
    pad = lambda src: (  # noqa: E731
        f"array_join(transform(regexp_extract_all(lower({src}), '([0-9]+|[a-z]+)', 1),"
        f" x -> case when x rlike '^[0-9]' then lpad(x, {_PAD}, '0')"
        f" else concat('#', x) end), '.')"
    )
    expr = (
        f"concat({pad(core)},"
        f" case when contains({name}, '-')"
        f" then concat('.!', {pad(pre)}) else '.+' end)"
    )
    return F.expr(expr)


def nat_version_key_sql(col: str) -> str:
    """DuckDB rendering of the same key (oracle side)."""
    core = f"regexp_extract({col}, '^([^-]*)', 1)"
    pre = f"regexp_extract({col}, '-(.*)$', 1)"
    pad = lambda src: (  # noqa: E731
        f"array_to_string(list_transform(regexp_extract_all(lower({src}), '[0-9]+|[a-z]+'),"
        f" x -> CASE WHEN regexp_matches(x, '^[0-9]') THEN lpad(x, {_PAD}, '0')"
        f" ELSE '#' || x END), '.')"
    )
    return (
        f"{pad(core)} || CASE WHEN contains({col}, '-')"
        f" THEN '.!' || {pad(pre)} ELSE '.+' END"
    )


def _pad_py(src: str) -> str:
    segs = re.findall(r"[0-9]+|[a-z]+", src.lower())
    return ".".join(s.zfill(_PAD) if s[0].isdigit() else "#" + s for s in segs)


def nat_version_key_py(version: str) -> str:
    """Driver-side reference implementation (tests, driver-side sorts)."""
    core, dash, pre = version.partition("-")
    if not dash:
        return _pad_py(core) + ".+"
    return _pad_py(core) + ".!" + _pad_py(pre)


def version_in_range(
    col: str, lo: str | None = None, hi: str | None = None
) -> Column:
    """V2: `vers:` range containment — half-open [lo, hi) under natural
    ordering, the common shape of univers VersionRange filtering."""
    key = nat_version_key(col)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (key >= nat_version_key_py(lo))
    if hi is not None:
        pred = pred & (key < nat_version_key_py(hi))
    return pred


def version_in_range_sql(col: str, lo: str | None = None, hi: str | None = None) -> str:
    key = nat_version_key_sql(col)
    parts = ["TRUE"]
    if lo is not None:
        parts.append(f"{key} >= '{nat_version_key_py(lo)}'")
    if hi is not None:
        parts.append(f"{key} < '{nat_version_key_py(hi)}'")
    return " AND ".join(parts)
