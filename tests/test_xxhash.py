import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.functions.xxhash import term_shard, xxhash64

CASES = [
    "",
    "a",
    "abc",
    "data",
    "stop0",
    "x" * 7,
    "y" * 8,
    "z" * 31,
    "w" * 32,
    "v" * 100,
    "naïve café 東京",
    "mixed 123 _underscore",
]


@pytest.mark.spark
def test_matches_spark_xxhash64(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string").select(
        "s", F.xxhash64("s").alias("h"), F.pmod(F.xxhash64("s"), F.lit(32)).cast("int").alias("shard")
    )
    for r in df.collect():
        assert xxhash64(r["s"]) == r["h"], r["s"]
        assert term_shard(r["s"], 32) == r["shard"], r["s"]
