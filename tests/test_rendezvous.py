"""Rendezvous (HRW) shard assignment: Spark ≡ python reference, the
minimal-disruption law (n → n+1 moves only-to-the-new-shard, ~1/(n+1)
of keys), uniformity, and the guard."""

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.plans.rendezvous import hrw_shard


def _w(key, s):
    return int(
        hashlib.md5(f"{key}|{s}".encode()).hexdigest()[:15], 16
    )


def _ref(key, n):
    return max(range(n), key=lambda s: (_w(key, s), s))


@pytest.mark.spark
class TestRendezvous:
    def test_equals_python_reference(self, spark):
        keys = list(range(300))
        df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
        for n in (1, 3, 8):
            got = {
                r["doc_id"]: r["s"]
                for r in df.select(
                    "doc_id", hrw_shard(F.col("doc_id"), n).alias("s")
                ).collect()
            }
            for k in keys:
                assert got[k] == _ref(k, n), (k, n)

    def test_minimal_disruption_and_uniformity(self, spark):
        keys = list(range(4000))
        df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
        rows = df.select(
            hrw_shard(F.col("doc_id"), 4).alias("a"),
            hrw_shard(F.col("doc_id"), 5).alias("b"),
        ).collect()
        moved = [r for r in rows if r["a"] != r["b"]]
        # movers go ONLY to the new shard — the HRW law, exactly
        assert all(r["b"] == 4 for r in moved)
        # expected 1/5 of keys move; allow ±4 sigma of Binomial(n, .2)
        frac = len(moved) / len(rows)
        assert abs(frac - 0.2) < 4 * (0.2 * 0.8 / len(rows)) ** 0.5
        # uniformity at n=5: each shard within ±25% of the mean
        c = Counter(r["b"] for r in rows)
        for s in range(5):
            assert abs(c[s] - 800) < 200, c

    def test_guard(self, spark):
        with pytest.raises(ValueError):
            hrw_shard(F.lit(1), 0)
