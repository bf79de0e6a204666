"""Bucketized interval range join: equality with the naive
cross-join + filter reference across bucket widths, exactly-once pair
semantics for long intervals, degenerate-interval handling, partition
invariance, and the plan shape that is the operator's whole point —
an equi-join, not a nested loop."""

import random

import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.rangejoin import (
    explode_interval_buckets,
    interval_join,
)


def _mk(spark, rng, n_pts=400, n_iv=60, axis=1000, max_len=90):
    pts = spark.createDataFrame(
        [(i, rng.randrange(axis)) for i in range(n_pts)], "pid long, d long"
    )
    iv_rows = []
    for j in range(n_iv):
        s = rng.randrange(axis)
        iv_rows.append((j, s, s + rng.randrange(max_len)))
    iv = spark.createDataFrame(iv_rows, "iid long, sd long, ed long")
    return pts, iv


def _naive(pts_rows, iv_rows):
    out = set()
    for pid, d in pts_rows:
        for iid, sd, ed in iv_rows:
            if sd <= d <= ed:
                out.add((pid, iid))
    return out


@pytest.mark.spark
class TestRangeJoin:
    @pytest.mark.parametrize("width", [1, 7, 64, 10_000])
    def test_equals_naive_reference(self, spark, width):
        rng = random.Random(42)
        pts, iv = _mk(spark, rng)
        got = {
            (r["pid"], r["iid"])
            for r in interval_join(pts, iv, "d", "sd", "ed", width)
            .select("pid", "iid")
            .collect()
        }
        want = _naive(
            [(r["pid"], r["d"]) for r in pts.collect()],
            [(r["iid"], r["sd"], r["ed"]) for r in iv.collect()],
        )
        assert got == want

    def test_exactly_once_per_pair(self, spark):
        """An interval spanning MANY buckets must still produce each
        qualifying pair once — the point owns a single bucket."""
        pts = spark.createDataFrame([(0, 500)], "pid long, d long")
        iv = spark.createDataFrame([(0, 0, 1000)], "iid long, sd long, ed long")
        rows = interval_join(pts, iv, "d", "sd", "ed", 7).collect()
        assert len(rows) == 1

    def test_degenerate_interval_dropped(self, spark):
        pts = spark.createDataFrame([(0, 5)], "pid long, d long")
        iv = spark.createDataFrame(
            [(0, 10, 4), (1, 5, 5)], "iid long, sd long, ed long"
        )
        got = [
            r["iid"]
            for r in interval_join(pts, iv, "d", "sd", "ed", 3).collect()
        ]
        assert got == [1]  # end<start matches nothing; exact [5,5] does

    def test_bad_width_raises(self, spark):
        pts = spark.createDataFrame([(0, 5)], "pid long, d long")
        with pytest.raises(ValueError):
            interval_join(pts, pts, "d", "d", "d", 0)

    def test_replication_bound(self, spark):
        """Exploded rows ≤ (len/width + 2) per interval — the cost model
        the width knob controls."""
        iv = spark.createDataFrame(
            [(0, 10, 59), (1, 0, 0)], "iid long, sd long, ed long"
        )
        counts = {
            r["iid"]: r["n"]
            for r in explode_interval_buckets(iv, "sd", "ed", 7)
            .groupBy("iid")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert counts[0] <= (59 - 10) // 7 + 2
        assert counts[1] == 1

    def test_partition_invariance(self, spark):
        rng = random.Random(7)
        pts, iv = _mk(spark, rng, n_pts=200, n_iv=30)
        a = sorted(
            map(
                tuple,
                interval_join(pts, iv, "d", "sd", "ed", 13)
                .select("pid", "iid")
                .collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                interval_join(
                    pts.repartition(11), iv.repartition(5), "d", "sd", "ed", 13
                )
                .select("pid", "iid")
                .collect(),
            )
        )
        assert a == b

    def test_plan_is_equi_join_not_nested_loop(self, spark):
        rng = random.Random(3)
        pts, iv = _mk(spark, rng, n_pts=100, n_iv=20)
        j = interval_join(pts, iv, "d", "sd", "ed", 7)
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert (
            "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan
        )
