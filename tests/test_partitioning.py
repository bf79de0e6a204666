import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.plans.partitioning import (
    exact_repartition,
    murmur3_int32,
    probe_ints,
    url_range_pids,
)


@pytest.mark.spark
def test_murmur3_matches_spark_hash(spark):
    vals = [0, 1, 2, 41, 42, 1000, -1, -42, 2**31 - 1, -(2**31)]
    rows = spark.createDataFrame([(v,) for v in vals], "x int").select(
        "x", F.hash("x").alias("h")
    ).collect()
    for r in rows:
        assert murmur3_int32(r["x"]) == r["h"], r["x"]


def test_probe_ints_cover_all():
    for p in (1, 2, 7, 32):
        probes = probe_ints(p)
        assert len(probes) == p
        assert [murmur3_int32(x) % p for x in probes] == list(range(p))


@pytest.mark.spark
def test_exact_repartition_places_rows(spark):
    df = spark.range(500).withColumn("pid", (F.col("id") % 13).cast("int"))
    out = (
        exact_repartition(df, 13, "pid")
        .withColumn("actual", F.spark_partition_id())
        .collect()
    )
    assert all(r["pid"] == r["actual"] for r in out)


@pytest.mark.spark
def test_url_range_pids_consistent_with_python(spark):
    urls = [f"https://h{i:03d}.edu/x" for i in range(100)]
    sample = sorted(urls[::7], key=lambda s: s.encode())
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["pid"]
        for r in df.select("url", url_range_pids(sample, 5, F.col("url")).alias("pid")).collect()
    }
    n = len(sample)
    bounds = [sample[(i * n) // 5] for i in range(1, 5)]
    for u in urls:
        assert got[u] == sum(1 for b in bounds if b <= u), u
    # all rows of an equal url share a pid by construction (same value)
