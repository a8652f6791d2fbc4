from purldb_spark.sources.csv_enrich import enrich_csv


def test_version_hint_cascade(spark):
    df = spark.createDataFrame(
        [
            ("abbot-0.12.3.jar",),
            ("libfoo_1.2.tar.gz",),
            ("tool-v2.10.1-linux.zip",),
            ("pkg-3.0.0-beta2.tgz",),
            ("noversion.txt",),
        ],
        ["filename"],
    )
    rows = {r.filename: r for r in enrich_csv(df).collect()}
    assert rows["abbot-0.12.3.jar"].version_hint == "0.12.3"
    assert rows["abbot-0.12.3.jar"].name_stem == "abbot"
    assert rows["libfoo_1.2.tar.gz"].version_hint == "1.2"
    assert rows["tool-v2.10.1-linux.zip"].version_hint == "2.10.1"
    assert rows["pkg-3.0.0-beta2.tgz"].version_hint == "3.0.0-beta2"
    assert rows["noversion.txt"].version_hint is None
