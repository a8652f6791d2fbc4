"""T7 politeness: per-host token bucket inside mapPartitions."""

from purldb_spark.streaming.ratelimit import partition_by_host, rate_limited_fetch


def test_partition_by_host_colocates(spark):
    uris = [
        ("https://a.example/1",),
        ("https://a.example/2",),
        ("https://b.example/1",),
    ]
    df = partition_by_host(spark.createDataFrame(uris, ["uri"]), n_partitions=4)
    rows = df.select("uri", "host").collect()
    hosts = {r.uri: r.host for r in rows}
    assert hosts["https://a.example/1"] == "a.example"
    assert hosts["https://b.example/1"] == "b.example"
    # same host -> same partition id
    pid = df.withColumn("pid", __import__("pyspark").sql.functions.spark_partition_id())
    pids = {(r.host, r.pid) for r in pid.select("host", "pid").collect()}
    assert len({p for h, p in pids if h == "a.example"}) == 1


def test_rate_limited_fetch_spacing(spark):
    """Fake clock: verify ≥1s spacing per host, no spacing across hosts."""
    timeline: list[float] = [0.0]
    sleeps: list[float] = []

    def clock() -> float:
        return timeline[0]

    def sleep(s: float) -> None:
        sleeps.append(round(s, 3))
        timeline[0] += s

    df = partition_by_host(
        spark.createDataFrame(
            [("https://a.example/1",), ("https://a.example/2",), ("https://b.example/1",)],
            ["uri"],
        ),
        n_partitions=1,
    )
    run = rate_limited_fetch(lambda uri: f"payload:{uri}", 1.0, clock, sleep)
    # drive the partition function locally (deterministic single partition)
    out = list(run(iter(df.collect())))
    assert len(out) == 3
    assert all(p.startswith("payload:") for _, _, p in out)
    # exactly one sleep: the second a.example fetch waited ~1s; b.example none
    assert len(sleeps) == 1 and 0.9 <= sleeps[0] <= 1.0
