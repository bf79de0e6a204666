"""CDC operators (operators/cdc.py): the round-trip law
apply(old, diff(old, new)) ≡ new on random snapshots, latest-wins
through multi-version changelogs, delete semantics, and guards."""

import random

import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.cdc import (
    apply_changelog,
    snapshot_diff,
)

SCHEMA = "k long, a string, b double"


def _snap(rng, keys):
    return [(k, rng.choice("xyzw"), float(rng.randrange(100))) for k in keys]


def test_roundtrip_law(spark):
    rng = random.Random(23)
    old_rows = _snap(rng, range(40))
    # new: drop some, mutate some, insert some
    new_rows = [
        (k, (a if k % 3 else "MUT"), b + (5 if k % 4 == 1 else 0))
        for k, a, b in old_rows
        if k % 5 != 0
    ] + _snap(rng, range(100, 110))
    old = spark.createDataFrame(old_rows, SCHEMA)
    new = spark.createDataFrame(new_rows, SCHEMA)
    log = snapshot_diff(old, new, ["k"])
    got = sorted(
        tuple(r) for r in apply_changelog(old, log, ["k"]).collect()
    )
    assert got == sorted(new_rows)
    # ops are only emitted for actual differences
    ops = {r["k"]: r["op"] for r in log.collect()}
    for k, a, b in old_rows:
        if k % 5 == 0:
            assert ops[k] == "D"
        elif (k % 3 == 0) or (k % 4 == 1):
            assert ops[k] == "U"
        else:
            assert k not in ops  # unchanged: no row


def test_latest_wins_and_delete(spark):
    old = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA)
    log = spark.createDataFrame(
        [
            (1, "v1", 1.0, 1, "U"),
            (1, "v3", 3.0, 3, "U"),
            (1, "v2", 2.0, 2, "U"),
            (2, "b", 2.0, 1, "D"),
            (3, "new", 9.0, 1, "I"),
        ],
        SCHEMA + ", version long, op string",
    )
    got = sorted(
        tuple(r) for r in apply_changelog(old, log, ["k"]).collect()
    )
    assert got == [(1, "v3", 3.0), (3, "new", 9.0)]


def test_delete_then_higher_version_reinsert(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    log = spark.createDataFrame(
        [(1, "a", 1.0, 1, "D"), (1, "back", 5.0, 2, "I")],
        SCHEMA + ", version long, op string",
    )
    got = [tuple(r) for r in apply_changelog(old, log, ["k"]).collect()]
    assert got == [(1, "back", 5.0)]


def test_guards(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    bad = spark.createDataFrame([(1, 1)], "k long, version long")
    with pytest.raises(ValueError):
        apply_changelog(old, bad, ["k"])
    other = spark.createDataFrame([(1, "a")], "k long, a string")
    with pytest.raises(ValueError):
        snapshot_diff(old, other, ["k"])


def test_plan_aggregate_argmax_no_window(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], SCHEMA)
    log = spark.createDataFrame(
        [(1, "a", 1.0, 1, "U")], SCHEMA + ", version long, op string"
    )
    out = apply_changelog(old, log, ["k"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
