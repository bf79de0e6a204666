"""Ordered proximity ("sloppy phrase") search: greedy semantics vs
brute force, the JVM HOF and DuckDB mirrors vs the Python reference,
and the segment-path operator (positional + doc-store strategies, Spark
+ task-local twins) vs the single-node oracle."""

import math
import random
from itertools import combinations

import pytest

from uci_searchengine_spark.functions.phrase import (
    count_near_py,
    count_phrase_py,
    near_count_sql,
)


def brute_near(toks, seq, slop):
    """Exhaustive reference: a start matches iff ANY in-order position
    assignment fits the gap budget (not just the greedy one)."""
    n = len(seq)
    if n == 0 or len(toks) < n:
        return 0
    hits = 0
    for i in range(len(toks)):
        if toks[i] != seq[0]:
            continue
        found = False
        for combo in combinations(range(i + 1, len(toks)), n - 1):
            pos = (i,) + combo
            if all(toks[p] == w for p, w in zip(pos, seq)) and (
                pos[-1] - pos[0]
            ) - (n - 1) <= slop:
                found = True
                break
        if found:
            hits += 1
    return hits


CASES = [
    (["a", "b"], 0),
    (["a", "b"], 2),
    (["a", "b", "c"], 1),
    (["b", "b"], 3),
    (["a"], 2),
    (["a", "c", "a", "b"], 4),
]


def _random_docs(n=200, max_len=12, seed=11):
    rng = random.Random(seed)
    alpha = ["a", "b", "c", "d"]
    return [
        [rng.choice(alpha) for _ in range(rng.randint(0, max_len))]
        for _ in range(n)
    ]


def test_greedy_equals_brute_force():
    for toks in _random_docs():
        for seq, slop in CASES:
            assert count_near_py(toks, seq, slop) == brute_near(
                toks, seq, slop
            ), (toks, seq, slop)


def test_slop_zero_is_exact_phrase():
    for toks in _random_docs(seed=12):
        for seq in (["a", "b"], ["a", "b", "c"], ["b", "b"]):
            assert count_near_py(toks, seq, 0) == count_phrase_py(toks, seq)


def test_slop_monotone_and_edges():
    # widening the budget can only add matches
    for toks in _random_docs(n=80, seed=13):
        for seq in (["a", "b"], ["a", "c", "b"]):
            prev = -1
            for slop in range(0, 5):
                cur = count_near_py(toks, seq, slop)
                assert cur >= prev
                prev = cur
    assert count_near_py([], ["a"], 1) == 0
    assert count_near_py(["a"], [], 1) == 0
    assert count_near_py(["a", "x", "x", "b"], ["a", "b"], 1) == 0
    assert count_near_py(["a", "x", "x", "b"], ["a", "b"], 2) == 1


def test_near_count_sql_matches_py():
    import duckdb
    import pandas as pd

    docs = _random_docs(seed=14)
    con = duckdb.connect()
    con.register(
        "docs",
        pd.DataFrame({"i": range(len(docs)), "t": docs}),
    )
    for seq, slop in [(["a", "b"], 0), (["a", "b"], 2), (["b", "b"], 3)]:
        got = dict(
            con.execute(
                f"SELECT i, {near_count_sql(seq, slop)} AS n FROM docs"
            ).fetchall()
        )
        for i, toks in enumerate(docs):
            assert got[i] == count_near_py(toks, seq, slop), (i, toks)
    with pytest.raises(ValueError):
        near_count_sql(["a", "b", "c"], 1)


@pytest.mark.spark
class TestNearSpark:
    def test_near_count_col_matches_py(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F

        from uci_searchengine_spark.functions.phrase import near_count_col

        docs = _random_docs(seed=15)
        df = spark.createDataFrame(
            pd.DataFrame({"i": range(len(docs)), "t": docs})
        )
        sel = [
            near_count_col(F.col("t"), seq, slop).alias(f"c{k}")
            for k, (seq, slop) in enumerate(CASES)
        ]
        got = {r["i"]: r for r in df.select("i", *sel).collect()}
        for i, toks in enumerate(docs):
            for k, (seq, slop) in enumerate(CASES):
                assert got[i][f"c{k}"] == count_near_py(toks, seq, slop), (
                    i,
                    toks,
                    seq,
                    slop,
                )

    @pytest.mark.parametrize(
        "phrase,slop",
        [
            ("stop0 stop1", 2),
            ("arbak stop1", 1),
            ("arband arbast", 3),
            ("stop0 stop0", 2),
            ("stop0 arbak stop1", 2),
            ("zzzznotaword stop0", 4),
        ],
    )
    def test_near_search_matches_oracle(
        self, spark, index_positional, oracle_small, phrase, slop
    ):
        """Both physical strategies and the task-local twin == oracle."""
        from uci_searchengine_spark.operators.index_build import IndexMeta
        from uci_searchengine_spark.operators.local_search import (
            phrase_topk_local,
        )
        from uci_searchengine_spark.operators.phrase import phrase_search

        expected = oracle_small.top_k_near(phrase, 10, slop)
        for method in ("positions", "docstore"):
            got = [
                (r["doc_id"], r["score"], r["n_occ"])
                for r in phrase_search(
                    spark, index_positional, phrase, 10, method, slop
                ).collect()
            ]
            assert len(got) == len(expected), (method, got, expected)
            for (gd, gs, gn), (ed, es, en) in zip(got, expected):
                assert gd == ed and gn == en, (method, got, expected)
                assert math.isclose(gs, es, rel_tol=1e-9)
        meta = IndexMeta.load(index_positional)
        loc = [
            (r["doc_id"], r["score"], r["n_occ"])
            for r in phrase_topk_local(
                index_positional, meta, phrase, 10, slop=slop
            )
        ]
        assert [(d, n) for d, _, n in loc] == [
            (d, n) for d, _, n in expected
        ]

    def test_slop_widens_match_set(
        self, spark, index_positional, oracle_small
    ):
        """On the fixture corpus a slop>0 query matches at least the
        exact-phrase set, and strictly more for a gapped pair."""
        from uci_searchengine_spark.operators.phrase import phrase_search

        phrase = "stop0 stop1"
        exact = {
            r["doc_id"]
            for r in phrase_search(
                spark, index_positional, phrase, 1000, "positions", 0
            ).collect()
        }
        near = {
            r["doc_id"]
            for r in phrase_search(
                spark, index_positional, phrase, 1000, "positions", 3
            ).collect()
        }
        assert exact <= near
        oracle_near = {
            d for d, _, _ in oracle_small.top_k_near(phrase, 1000, 3)
        }
        assert near == oracle_near

    def test_bad_slop_rejected(self, spark, index_positional):
        from uci_searchengine_spark.operators.phrase import phrase_search

        with pytest.raises(ValueError):
            phrase_search(spark, index_positional, "a b", 10, slop=-1)


@pytest.mark.spark
class TestNearServing:
    def test_phrase_rows_slop_both_plans(
        self, spark, index_positional, oracle_small
    ):
        from uci_searchengine_spark.operators.serving import Searcher

        phrase, slop = "stop0 stop1", 3
        expected = oracle_small.top_k_near(phrase, 10, slop)
        s = Searcher(spark, index_positional, query_cache=0)
        for plan in ("local", "spark"):
            rows = s.phrase_rows(phrase, k=10, plan=plan, slop=slop)
            got = [(r["doc_id"], r["n_occ"]) for r in rows]
            assert got == [(d, n) for d, _, n in expected], plan
            assert s.last_plan == plan
        env = s.phrase_envelope(phrase, k=5, slop=slop)
        assert env["slop"] == slop and len(env["results"]) == 5


def test_parse_phrase_slop_syntax():
    from uci_searchengine_spark.functions.queryparse import parse_query
    from uci_searchengine_spark.functions.tokenize import tokenize_py

    bq = parse_query('"stop0 stop1"~2 arbak -"a b"~3 "c d"', tokenize_py)
    assert bq.phrases == [["stop0", "stop1"], ["c", "d"]]
    assert bq.slops() == [2, 0]
    assert bq.not_terms == ["a", "b"]  # negated phrase ignores slop
    # hand-built BoolQuery without phrase_slops stays valid
    from uci_searchengine_spark.functions.queryparse import BoolQuery

    hand = BoolQuery(phrases=[["x", "y"]])
    assert hand.slops() == [0]


@pytest.mark.spark
class TestBooleanSlop:
    BQUERIES = [
        '"stop0 stop1"~3 arbak',
        '+arbak "stop0 stop1"~2',
        '"arband arbast"~4 -stop3',
        '"stop0 stop1"~2 "arbak stop2"~3',
    ]

    @pytest.mark.parametrize("query", BQUERIES)
    def test_boolean_slop_matches_oracle_both_strategies(
        self, spark, index_small, index_positional, oracle_small, query
    ):
        from uci_searchengine_spark.operators.boolean import boolean_search

        exp = oracle_small.boolean_top_k(query, 10)
        for idx in (index_small, index_positional):
            got = [
                (r["doc_id"], r["score"])
                for r in boolean_search(spark, idx, query, 10).collect()
            ]
            assert [d for d, _ in got] == [d for d, _ in exp], (query, idx)
            for (_, gs), (_, es) in zip(got, exp):
                assert math.isclose(gs, es, rel_tol=1e-9)

    def test_boolean_slop_local_plan(
        self, spark, index_positional, oracle_small
    ):
        from uci_searchengine_spark.operators.index_build import IndexMeta
        from uci_searchengine_spark.operators.local_search import (
            boolean_topk_local,
        )

        query = '"stop0 stop1"~3 arbak'
        exp = oracle_small.boolean_top_k(query, 10)
        meta = IndexMeta.load(index_positional)
        got = boolean_topk_local(index_positional, meta, query, 10)
        assert [r["doc_id"] for r in got] == [d for d, _ in exp]

    def test_slop_widens_boolean_matches(
        self, spark, index_positional, oracle_small
    ):
        from uci_searchengine_spark.operators.boolean import boolean_search

        exact = {
            r["doc_id"]
            for r in boolean_search(
                spark, index_positional, '"stop0 stop1"', 1000
            ).collect()
        }
        near = {
            r["doc_id"]
            for r in boolean_search(
                spark, index_positional, '"stop0 stop1"~3', 1000
            ).collect()
        }
        assert exact <= near and exact != near


@pytest.mark.spark
class TestPercolateSlop:
    def test_slopped_registered_query(self, spark):
        from uci_searchengine_spark.functions.phrase import count_near_py
        from uci_searchengine_spark.functions.tokenize import tokenize_py
        from uci_searchengine_spark.operators.percolate import (
            compile_queries,
            match_tokens,
            percolate,
        )

        texts = [
            "alpha beta gamma",          # adjacent
            "alpha xx beta",             # gap 1
            "alpha xx yy zz beta",       # gap 3 — outside ~2
            "beta alpha",                # wrong order
            "alpha beta alpha beta",
        ]
        docs = spark.createDataFrame(
            [(i, tokenize_py(t)) for i, t in enumerate(texts)],
            "doc_id long, t array<string>",
        )
        qmap = {"q_near": '"alpha beta"~2', "q_exact": '"alpha beta"'}
        got = {
            (r["query_id"], r["doc_id"])
            for r in percolate(docs, qmap).collect()
        }
        exp = set()
        for i, tx in enumerate(texts):
            toks = tokenize_py(tx)
            if count_near_py(toks, ["alpha", "beta"], 2) > 0:
                exp.add(("q_near", i))
            if count_near_py(toks, ["alpha", "beta"], 0) > 0:
                exp.add(("q_exact", i))
        assert got == exp
        assert ("q_near", 1) in exp and ("q_exact", 1) not in exp
        assert ("q_near", 2) not in exp  # gap 3 outside ~2
        # python twin agrees
        compiled = compile_queries(qmap)
        for qid, bq in compiled.items():
            for i, tx in enumerate(texts):
                assert match_tokens(bq, tokenize_py(tx)) == (
                    (qid, i) in exp
                )


from pyspark.sql import functions as F  # noqa: E402  (unordered-near block)


@pytest.mark.spark
class TestUnorderedNear:
    def test_gap_vs_python(self, spark):
        from uci_searchengine_spark.functions.phrase import (
            unordered_near_gap_col,
        )

        docs = [
            (0, ["a", "x", "b"]),          # gap 1, a before b
            (1, ["b", "a"]),               # gap 0, reversed order
            (2, ["a", "x", "x", "x", "b", "x", "a"]),  # min over pairs: b..a = 1
            (3, ["a", "a"]),               # b absent -> NULL
            (4, ["x"]),                    # both absent -> NULL
        ]
        df = spark.createDataFrame(docs, "id long, t array<string>")
        got = {
            r["id"]: r["g"]
            for r in df.select(
                "id", unordered_near_gap_col(F.col("t"), "a", "b").alias("g")
            ).collect()
        }
        assert got == {0: 1, 1: 0, 2: 1, 3: None, 4: None}

    def test_reversed_order_matches_where_ordered_does_not(self, spark):
        from uci_searchengine_spark.functions.phrase import (
            near_count_col,
            unordered_near_gap_col,
        )

        df = spark.createDataFrame(
            [(0, ["join", "customer"])], "id long, t array<string>"
        )
        row = df.select(
            near_count_col(F.col("t"), ["customer", "join"], 2).alias("o"),
            unordered_near_gap_col(F.col("t"), "customer", "join").alias("u"),
        ).collect()[0]
        assert row["o"] == 0 and row["u"] == 0

    def test_rejects_same_term(self, spark):
        from uci_searchengine_spark.functions.phrase import (
            unordered_near_gap_col,
        )

        with pytest.raises(ValueError):
            unordered_near_gap_col(F.col("t"), "a", "a")
