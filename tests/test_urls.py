"""C2 canonicalization + to_purl/from_purl conversions."""

from purldb_spark.functions.urls import canonical_url, purl_to_url, url_to_purl


def test_canonical_url_column(spark):
    rows = [
        ("HTTPS://Example.COM:443/Path/#frag",),
        ("http://example.com:80/a/b",),
        ("http://example.com:8080/a",),
        ("https://example.com/",),
        ("not a url",),
    ]
    df = spark.createDataFrame(rows, ["u"])
    out = [r.c for r in df.select(canonical_url("u").alias("c")).collect()]
    assert out == [
        "https://example.com/Path",   # scheme+host lowered, :443 stripped, frag dropped
        "http://example.com/a/b",     # :80 stripped
        "http://example.com:8080/a",  # non-default port kept
        "https://example.com",        # trailing slash stripped
        "not a url",                  # passthrough
    ]


def test_url_to_purl():
    assert (
        url_to_purl("https://registry.npmjs.org/left-pad/-/left-pad-1.3.0.tgz")
        == "pkg:npm/left-pad@1.3.0"
    )
    assert (
        url_to_purl(
            "https://files.pythonhosted.org/packages/source/d/Django/Django-4.2.1.tar.gz"
        )
        == "pkg:pypi/django@4.2.1"
    )
    assert (
        url_to_purl(
            "https://repo1.maven.org/maven2/org/apache/commons/commons-io/2.11.0/commons-io-2.11.0.jar"
        )
        == "pkg:maven/org.apache.commons/commons-io@2.11.0"
    )
    assert url_to_purl("https://example.com/random.zip") is None


def test_purl_to_url_roundtrip():
    for purl in [
        "pkg:npm/left-pad@1.3.0",
        "pkg:pypi/django@4.2.1",
        "pkg:maven/org.apache.commons/commons-io@2.11.0",
    ]:
        url = purl_to_url(purl)
        assert url is not None
        assert url_to_purl(url) == purl
    assert purl_to_url("pkg:npm/left-pad") is None  # versionless -> no URL
    assert purl_to_url("pkg:generic/thing@1.0") is None
