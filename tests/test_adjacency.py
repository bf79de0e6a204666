"""ES adjacency_matrix agg (operators/adjacency.py) vs a brute-force
python matrix, plus the ES contract edges (empty buckets omitted,
separator-name rejection, filter-count cap)."""

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.adjacency import (
    MAX_FILTERS,
    adjacency_matrix,
)

ROWS = [
    # (priority, price, status)
    ("1-URGENT", 200000.0, "O"),
    ("1-URGENT", 50000.0, "F"),
    ("2-HIGH", 160000.0, "O"),
    ("3-MED", 160000.0, "O"),
    ("2-HIGH", 10000.0, "F"),
    ("3-MED", 10.0, "P"),
]


def _brute(filters_py):
    from collections import Counter

    c = Counter()
    for row in ROWS:
        names = sorted(n for n, f in filters_py.items() if f(row))
        for n in names:
            c[n] += 1
        for a, b in combinations(names, 2):
            c[f"{a}&{b}"] += 1
    return dict(c)


def test_matches_brute_force_and_omits_empty(spark):
    df = spark.createDataFrame(ROWS, "prio string, price double, st string")
    filters = {
        "urgent": F.col("prio") == "1-URGENT",
        "high": F.col("prio") == "2-HIGH",
        "big": F.col("price") > 150000,
        "open_status": F.col("st") == "O",
    }
    filters_py = {
        "urgent": lambda r: r[0] == "1-URGENT",
        "high": lambda r: r[0] == "2-HIGH",
        "big": lambda r: r[1] > 150000,
        "open_status": lambda r: r[2] == "O",
    }
    got = {
        r["key"]: r["doc_count"]
        for r in adjacency_matrix(df, filters).collect()
    }
    want = _brute(filters_py)
    assert got == want
    # disjoint filters: the pair bucket must be absent, not zero
    assert "high&urgent" not in got and "urgent&high" not in got
    # pair keys use sorted-name order
    assert "big&urgent" in got and "urgent&big" not in got


def test_guards(spark):
    df = spark.createDataFrame(ROWS, "prio string, price double, st string")
    with pytest.raises(ValueError):
        adjacency_matrix(df, {})
    with pytest.raises(ValueError):
        adjacency_matrix(df, {"a&b": F.lit(True)})
    too_many = {f"f{i}": F.lit(True) for i in range(MAX_FILTERS + 1)}
    with pytest.raises(ValueError):
        adjacency_matrix(df, too_many)


def test_plan_single_pass_no_join(spark):
    df = spark.createDataFrame(ROWS, "prio string, price double, st string")
    out = adjacency_matrix(df, {"a": F.col("price") > 0, "b": F.col("st") == "O"})
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan
    # exactly one physical Exchange (the groupBy shuffle) — formatted
    # explain prints each node once in the tree and once in the detail
    assert plan.count("+- Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
