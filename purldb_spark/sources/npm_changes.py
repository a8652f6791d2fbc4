"""npm replicate registry `_changes` feed visitor (NpmRegistryVisitor,
minecode/miners/npm.py:39-103): one next-index URI from `last_seq`, plus
one pre-visited URI per package record carrying the compacted package doc
(readme stripped), scoped names split into namespace/name.

Spark shape: a changes page is one row; the doc passthrough is whole-JSON
re-serialization of irregular CouchDB documents, so this runs in
Arrow-batched mapInPandas (same boundary class as the zip/codec steps) —
one batch row per page, fan-out one output row per package record, nothing
driver-side. Downstream mapping (packages_from_registry) is columnar.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SCHEMA = T.StructType(
    [
        T.StructField("uri", T.StringType()),
        T.StructField("package_url", T.StringType()),
        T.StructField("source_uri", T.StringType()),
        T.StructField("data", T.StringType()),
        T.StructField("visited", T.BooleanType()),
    ]
)

_NEXT_TEMPLATE = (
    "https://replicate.npmjs.com/registry/_changes"
    "?include_docs=true&limit=1000&since={last_seq}"
)


def _api_url(namespace: str | None, name: str) -> str:
    if namespace:
        return f"https://registry.npmjs.org/{namespace}/{name}"
    return f"https://registry.npmjs.org/{name}"


def npm_changes_uris(
    pages: DataFrame, json_col: str = "doc", uri_col: str = "source_uri"
) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for src, raw in zip(pdf[uri_col], pdf[json_col]):
                content = json.loads(raw)
                rows.append(
                    {
                        "uri": _NEXT_TEMPLATE.format(
                            last_seq=content["last_seq"]
                        ),
                        "package_url": None,
                        "source_uri": src,
                        "data": None,
                        "visited": False,
                    }
                )
                for result in content.get("results") or []:
                    doc = result.get("doc") or {}
                    if "versions" not in doc or "name" not in doc:
                        continue
                    doc.pop("readme", None)
                    name = doc.get("name")
                    namespace = None
                    if name.startswith("@") and "/" in name:
                        namespace, _, name = name.partition("/")
                    rows.append(
                        {
                            "uri": _api_url(namespace, name),
                            "package_url": "pkg:npm/"
                            + (f"{namespace}/" if namespace else "")
                            + name.lower(),
                            "source_uri": src,
                            "data": json.dumps(
                                doc,
                                separators=(",", ":"),
                                ensure_ascii=False,
                            ),
                            "visited": True,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "uri",
                    "package_url",
                    "source_uri",
                    "data",
                    "visited",
                ],
            )

    return pages.mapInPandas(run, schema=_SCHEMA)
