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


def test_conan_status_ladder_and_url_list(spark):
    from purldb_spark.sources.collectors3 import map_conan_requests

    reqs = spark.createDataFrame(
        [
            ("pkg:conan/zlib@1.3", "zlib", "1.3"),
            ("pkg:conan/zlib", "zlib", None),
            ("pkg:conan/gone@2.0", "gone", "2.0"),
        ],
        "purl string, name string, version string",
    )
    configs = spark.createDataFrame(
        [("zlib", 'versions:\n  "1.3":\n    folder: all\n')],
        "name string, doc string",
    )
    conandatas = spark.createDataFrame(
        [
            (
                "zlib",
                "all",
                'sources:\n  "1.3":\n    url:\n      - "https://a.ex/z.tgz"\n'
                '      - "https://b.ex/z.tgz"\n    sha256: "abc"\n',
            )
        ],
        "name string, folder string, doc string",
    )
    conanfiles = spark.createDataFrame(
        [("zlib", "all", 'class Z(ConanFile):\n    license = "Zlib"\n')],
        "name string, folder string, doc string",
    )
    rows = {
        r["purl"]: r
        for r in map_conan_requests(reqs, configs, conandatas, conanfiles).collect()
    }
    ok = rows["pkg:conan/zlib@1.3"]
    # a url LIST takes its first element (conan.py:87-88)
    assert ok["status"] == "collected"
    assert ok["download_url"] == "https://a.ex/z.tgz"
    assert ok["sha256"] == "abc"
    assert ok["extracted_license_statement"] == "Zlib"
    assert ok["description"] is None
    assert rows["pkg:conan/zlib"]["status"] == "missing_version"
    assert rows["pkg:conan/gone@2.0"]["status"] == "no_recipe"
