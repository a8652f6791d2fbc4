"""Package URL (purl) parse/build — C3 in SURVEY §2.8.

A minimal, dependency-free implementation of the public purl spec
(https://github.com/package-url/purl-spec):

    pkg:type/namespace/name@version?qualifiers#subpath

The reference delegates to the ``packageurl`` library; we re-derive the
subset purldb uses (parse, normalize, to-string, qualifier maps) so the
engine has no extra runtime deps. Used driver-side to build predicates
(operators/filters.py purl_lookups) and as a Spark-side UDF only where a
purl column must be split inside a distributed job (slow path; the hot
paths keep purl fields as separate columns exactly so this UDF isn't
needed — the reference does the same with its purl-field columns,
packagedb/models.py:458-574).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import quote, unquote


@dataclass(frozen=True)
class PackageURL:
    type: str
    namespace: str | None = None
    name: str = ""
    version: str | None = None
    qualifiers: dict[str, str] = field(default_factory=dict)
    subpath: str | None = None

    @classmethod
    def parse(cls, purl: str) -> "PackageURL":
        if not purl.startswith("pkg:"):
            raise ValueError(f"not a purl: {purl!r}")
        rest = purl[4:].lstrip("/")

        subpath = None
        if "#" in rest:
            rest, subpath = rest.split("#", 1)
            subpath = unquote(subpath).strip("/") or None

        qualifiers: dict[str, str] = {}
        if "?" in rest:
            rest, qs = rest.split("?", 1)
            for pair in qs.split("&"):
                if not pair:
                    continue
                k, _, v = pair.partition("=")
                if v:
                    qualifiers[k.lower()] = unquote(v)

        version = None
        if "@" in rest:
            rest, version = rest.rsplit("@", 1)
            version = unquote(version) or None

        segments = [unquote(s) for s in rest.split("/") if s]
        if not segments:
            raise ValueError(f"purl has no type/name: {purl!r}")
        ptype = segments[0].lower()
        if len(segments) == 1:
            raise ValueError(f"purl has no name: {purl!r}")
        name = segments[-1]
        namespace = "/".join(segments[1:-1]) or None
        return cls(ptype, namespace, name, version, qualifiers, subpath)

    def to_string(self) -> str:
        out = [f"pkg:{self.type}/"]
        if self.namespace:
            out.append(
                "/".join(quote(s, safe="") for s in self.namespace.split("/")) + "/"
            )
        out.append(quote(self.name, safe=""))
        if self.version:
            out.append("@" + quote(self.version, safe=""))
        if self.qualifiers:
            qs = "&".join(
                f"{k}={quote(v, safe='')}" for k, v in sorted(self.qualifiers.items())
            )
            out.append("?" + qs)
        if self.subpath:
            out.append("#" + quote(self.subpath, safe="/"))
        return "".join(out)


def purl_to_lookups(purl: str) -> dict[str, str]:
    """purl -> {field: value} dict, the shape packagedb/api.py:276-300 feeds
    into queryset filters. Empty fields are omitted."""
    p = PackageURL.parse(purl)
    out = {"type": p.type, "name": p.name}
    if p.namespace:
        out["namespace"] = p.namespace
    if p.version:
        out["version"] = p.version
    if p.subpath:
        out["subpath"] = p.subpath
    if p.qualifiers:
        out["qualifiers"] = "&".join(f"{k}={v}" for k, v in sorted(p.qualifiers.items()))
    return out
