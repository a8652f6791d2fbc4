"""Edge cases for the huggingface/generic collect handlers."""

from __future__ import annotations

from purldb_spark.sources.collectors2 import (
    map_generic_requests,
    map_huggingface_requests,
)


def _reqs(spark, rows):
    return spark.createDataFrame(
        rows, "purl string, namespace string, name string, version string"
    )


def test_hf_no_bin_siblings_yields_no_rows(spark):
    reqs = _reqs(spark, [("pkg:huggingface/o/m@s", "o", "m", "s")])
    models = spark.createDataFrame(
        [("o", "m", '{"siblings":[{"rfilename":"model.safetensors"}]}')],
        "namespace string, name string, doc string",
    )
    rows = map_huggingface_requests(reqs, models).collect()
    # only ".bin" matches the reference generator (huggingface.py:54-64):
    # a model with no .bin sibling produces nothing
    assert rows == []


def test_hf_error_statuses(spark):
    reqs = _reqs(
        spark,
        [
            ("pkg:huggingface/m@s", None, "m", "s"),
            ("pkg:huggingface/o/m", "o", "m", None),
            ("pkg:huggingface/o/gone@s", "o", "gone", "s"),
        ],
    )
    models = spark.createDataFrame(
        [], "namespace string, name string, doc string"
    )
    got = {r["purl"]: r["status"] for r in map_huggingface_requests(reqs, models).collect()}
    assert got == {
        "pkg:huggingface/m@s": "missing_namespace",
        "pkg:huggingface/o/m": "missing_version",
        "pkg:huggingface/o/gone@s": "no_model_data",
    }


def test_generic_decode_and_missing_qualifier(spark):
    docs = spark.createDataFrame(
        [
            ("pkg:generic/x@1?download_url=https%3A%2F%2Fa.ex%2Fx.zip",),
            ("pkg:generic/y",),
        ],
        ["purl"],
    )
    rows = {r["purl"]: r for r in map_generic_requests(docs).collect()}
    ok = rows["pkg:generic/x@1?download_url=https%3A%2F%2Fa.ex%2Fx.zip"]
    assert ok["status"] == "collected"
    assert ok["download_url"] == "https://a.ex/x.zip"
    assert ok["name"] == "x" and ok["version"] == "1"
    assert rows["pkg:generic/y"]["status"] == "missing_download_url"
    assert rows["pkg:generic/y"]["type"] is None
