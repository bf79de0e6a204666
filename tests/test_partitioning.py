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


@pytest.mark.spark
class TestBucketingAndSalt:
    def test_bucketed_join_has_no_shuffle(self, spark, tmp_path_factory):
        from uci_searchengine_spark.plans.bucketing import (
            assert_no_shuffle,
            bucketed_join,
            write_bucketed,
        )

        left = spark.range(1000).withColumn("k", (F.col("id") % 50).cast("long")).withColumn("v", F.col("id") * 2)
        right = spark.range(50).withColumn("k", F.col("id").cast("long")).withColumn("w", F.col("id") + 7)
        write_bucketed(left.select("k", "v"), "t_bleft", "k", 8, sort_col="k")
        write_bucketed(right.select("k", "w"), "t_bright", "k", 8, sort_col="k")
        # disable broadcast so the co-located sort-merge path is what's planned
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bucketed_join(spark, "t_bleft", "t_bright", "k")
            assert_no_shuffle(j)
            got = j.groupBy().sum("v").collect()[0][0]
            want = left.join(right, "k").groupBy().sum("v").collect()[0][0]
            assert got == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS t_bleft")
            spark.sql("DROP TABLE IF EXISTS t_bright")

    def test_salted_join_matches_plain(self, spark):
        from uci_searchengine_spark.plans.bucketing import salted_join

        # pathological skew: 90% of rows share one key
        big = spark.range(2000).withColumn(
            "k", F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 7).cast("long")
        ).withColumn("v", F.col("id"))
        small = spark.range(7).withColumn("k", F.col("id").cast("long")).withColumn("w", F.col("id") * 10)
        got = (
            salted_join(big.select("k", "v"), small.select("k", "w"), "k", salt=4)
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw"))
        )
        want = (
            big.select("k", "v").join(small.select("k", "w"), "k")
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw"))
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_weighted_range_bounds_balance():
    from uci_searchengine_spark.plans.partitioning import weighted_range_bounds

    # uniform weights over a sorted key space → near-equal ranges
    samples = [(f"u{i:05d}", 1) for i in range(1000)]
    bounds = weighted_range_bounds(samples, 4)
    assert len(bounds) == 3
    # each boundary sits at ~i/4 of the mass
    idx = [int(b[1:]) for b in bounds]
    for j, i in enumerate(idx, start=1):
        assert abs(i - j * 250) <= 2, (j, i)

    # weighted: one partition sampled at stride 8 must still contribute
    # its full row mass — its samples carry weight 8
    fine = [(f"a{i:05d}", 1) for i in range(100)]      # 100 rows, a* keys
    coarse = [(f"b{i:05d}", 8) for i in range(100)]    # 800 rows, b* keys
    bounds = weighted_range_bounds(fine + coarse, 2)
    # half the total mass (450) is inside the b* range → the single
    # boundary must be a b* key, not an a* key
    assert bounds[0].startswith("b"), bounds


def test_url_stats_fn_decimation_deterministic():
    import pandas as pd

    from uci_searchengine_spark.operators.index_build import _url_stats_fn

    urls = [f"https://h/{i:06d}" for i in range(5000)]

    def run(batch_sizes):
        batches = []
        at = 0
        for b in batch_sizes:
            batches.append(pd.DataFrame({"url": urls[at : at + b]}))
            at += b
        assert at == len(urls)
        (out,) = list(_url_stats_fn(iter(batches)))
        return out

    a = run([1000] * 5)
    b = run([700] * 7 + [100])
    assert a["cnt"].iloc[0] == b["cnt"].iloc[0] == 5000
    # stride decimation selects global indices i % stride == 0 — the
    # kept set must not depend on how rows were chunked into batches
    assert a["stride"].iloc[0] == b["stride"].iloc[0]
    assert list(a["urls"].iloc[0]) == list(b["urls"].iloc[0])
    stride = int(a["stride"].iloc[0])
    assert len(a["urls"].iloc[0]) <= 512
    assert all(
        int(u.rsplit("/", 1)[1]) % stride == 0 for u in a["urls"].iloc[0]
    )
