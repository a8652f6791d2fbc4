"""Natural-version key ordering semantics (W2) — pure python checks of the
same key the JVM/DuckDB expressions compute."""

from purldb_spark.functions.versions import nat_version_key_py as key


def test_numeric_segments_beat_lexicographic():
    assert key("0.10.0") > key("0.9.9")
    assert key("1.10.0") > key("1.9.0")
    assert key("10.0.0") > key("9.99.99")


def test_prerelease_sorts_below_release():
    assert key("2.0.0-beta1") < key("2.0.0")
    assert key("2.0.0-beta2") > key("2.0.0-beta1")
    assert key("2.0.0-beta2") < key("2.0.1")


def test_total_order_examples():
    versions = ["0.4.1", "2.0.0-beta2", "1.2.3", "0.10.0", "2.0.0", "1.2.3-beta0"]
    ordered = sorted(versions, key=key)
    assert ordered == [
        "0.4.1",
        "0.10.0",
        "1.2.3-beta0",
        "1.2.3",
        "2.0.0-beta2",
        "2.0.0",
    ]
