"""asof_join (operators/asof.py): merge-formulation backward as-of join
verified against a brute-force reference on randomized data, plus the
semantic edges (inclusive ts, tie-break, tolerance, no-match nulls)."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.asof import asof_join

EPOCH = dt.datetime(2024, 1, 1)


def _mk(spark, seed=7, n_left=200, n_right=300, n_keys=12):
    rng = random.Random(seed)
    left = [
        (
            i,
            rng.randrange(n_keys),
            EPOCH + dt.timedelta(seconds=rng.randrange(0, 5000)),
        )
        for i in range(n_left)
    ]
    right = [
        (
            100_000 + i,
            rng.randrange(n_keys),
            # coarse grid => deliberate ts collisions (tie-break coverage)
            EPOCH + dt.timedelta(seconds=rng.randrange(0, 50) * 100),
            round(rng.uniform(0, 10), 3),
        )
        for i in range(n_right)
    ]
    ldf = spark.createDataFrame(left, "lid long, k int, lts timestamp")
    rdf = spark.createDataFrame(right, "rid long, k int, rts timestamp, v double")
    return left, right, ldf, rdf


def _brute(left, right, tolerance_s=None):
    out = {}
    for lid, k, lts in left:
        best = None
        for rid, rk, rts, v in right:
            if rk != k or rts > lts:
                continue
            if tolerance_s is not None and (lts - rts).total_seconds() > tolerance_s:
                continue
            # backward as-of: max (rts, rid)
            if best is None or (rts, rid) > (best[0], best[1]):
                best = (rts, rid, v)
        out[lid] = None if best is None else (best[1], best[2])
    return out


@pytest.mark.spark
def test_asof_matches_bruteforce(spark):
    left, right, ldf, rdf = _mk(spark)
    got = {
        r["lid"]: (None if r["asof_rid"] is None else (r["asof_rid"], r["asof_v"]))
        for r in asof_join(
            ldf,
            rdf,
            on="k",
            left_ts="lts",
            right_ts="rts",
            value_cols={"rid": "asof_rid", "v": "asof_v"},
            tiebreak="rid",
        ).collect()
    }
    assert got == _brute(left, right)
    assert len(got) == len(left)  # left-outer: every left row survives


@pytest.mark.spark
def test_asof_inclusive_and_tiebreak(spark):
    # right rows AT the left timestamp must match (inclusive <=), and the
    # max-tiebreak row wins among equal timestamps
    ldf = spark.createDataFrame(
        [(1, 5, EPOCH)], "lid long, k int, lts timestamp"
    )
    rdf = spark.createDataFrame(
        [
            (10, 5, EPOCH, 1.0),
            (11, 5, EPOCH, 2.0),  # same ts, higher rid -> wins
            (12, 5, EPOCH + dt.timedelta(seconds=1), 9.0),  # after: excluded
        ],
        "rid long, k int, rts timestamp, v double",
    )
    (row,) = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts",
        value_cols={"rid": "asof_rid", "v": "asof_v"}, tiebreak="rid",
    ).collect()
    assert (row["asof_rid"], row["asof_v"]) == (11, 2.0)


@pytest.mark.spark
def test_asof_tolerance_and_key_rename(spark):
    left, right, ldf, rdf = _mk(spark, seed=11)
    ldf2 = ldf.withColumnRenamed("k", "leftk")
    got = {
        r["lid"]: (None if r["asof_rid"] is None else (r["asof_rid"], r["asof_v"]))
        for r in asof_join(
            ldf2,
            rdf,
            on=("leftk", "k"),
            left_ts="lts",
            right_ts="rts",
            value_cols={"rid": "asof_rid", "v": "asof_v"},
            tiebreak="rid",
            tolerance_micros=600 * 1_000_000,
        ).collect()
    }
    assert got == _brute(left, right, tolerance_s=600)
    # the tolerance must actually bite on this data
    loose = _brute(left, right)
    assert got != loose


@pytest.mark.spark
def test_asof_plan_has_single_shuffle(spark):
    _, _, ldf, rdf = _mk(spark, n_left=20, n_right=20)
    plan = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts",
        value_cols={"rid": "asof_rid"}, tiebreak="rid",
    )._jdf.queryExecution().executedPlan().toString()
    # merge formulation: exactly one Exchange (the union's key shuffle),
    # no join operator anywhere (a range/theta join would explode rows)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
