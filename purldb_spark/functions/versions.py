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
    prereleases)`. Sentinels: '!'(33) < '+'(43) < '0'(48), giving all three
    orderings at once — prerelease < its release ('!' < '+'), a release
    sorts below a longer core ('+' < digit: '0' < '0.0'), and a prerelease
    never outranks a longer core ('!' < digit: '1.2-beta3' < '1.2.1'). The
    latter two cases were found by the hypothesis order-isomorphism test."""
    name = col if isinstance(col, str) else None
    if name is None:
        raise ValueError("pass the column name (expression builds SQL text)")
    core = f"regexp_extract({name}, '^([^-]*)', 1)"
    pre = f"regexp_extract({name}, '-(.*)$', 1)"
    pad = lambda src: (  # noqa: E731
        f"array_join(transform(regexp_extract_all({src}, '([0-9]+)', 1),"
        f" x -> lpad(x, {_PAD}, '0')), '.')"
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
        f"array_to_string(list_transform(regexp_extract_all({src}, '[0-9]+'),"
        f" x -> lpad(x, {_PAD}, '0')), '.')"
    )
    return (
        f"{pad(core)} || CASE WHEN contains({col}, '-')"
        f" THEN '.!' || {pad(pre)} ELSE '.+' END"
    )


def nat_version_key_py(version: str) -> str:
    """Driver-side reference implementation (tests, driver-side sorts)."""
    core, dash, pre = version.partition("-")
    core_k = ".".join(s.zfill(_PAD) for s in re.findall(r"[0-9]+", core))
    if not dash:
        return core_k + ".+"
    pre_k = ".".join(s.zfill(_PAD) for s in re.findall(r"[0-9]+", pre))
    return core_k + ".!" + pre_k


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
