"""Two-phase rescoring: the segments-path operator vs a python oracle
(window selection, blend, weights, slop), the bounded phase-2
primitive, and the k<=window contract."""

import math

import pytest

QUERY = "stop0 arbak stop1"
PHRASE = "stop0 stop1"


def _expected(oracle, query, phrase, k, window, qw, rw, slop):
    from uci_searchengine_spark.functions.phrase import count_near_py
    from uci_searchengine_spark.functions.tokenize import tokenize_py

    top = oracle.top_k(query, window)
    rows = []
    for d, s in top:
        n = count_near_py(tokenize_py(oracle.texts[d]), tokenize_py(phrase), slop)
        rows.append((d, qw * s + rw * math.log1p(n), s, n))
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]


@pytest.mark.spark
class TestRescore:
    @pytest.mark.parametrize(
        "window,qw,rw,slop",
        [(50, 1.0, 1.0, 0), (30, 0.5, 2.0, 0), (50, 1.0, 1.0, 2)],
    )
    def test_matches_python_oracle(
        self, spark, index_positional, oracle_small, window, qw, rw, slop
    ):
        from uci_searchengine_spark.operators.rescore import rescore_phrase

        exp = _expected(
            oracle_small, QUERY, PHRASE, 10, window, qw, rw, slop
        )
        got = [
            (r["doc_id"], r["score"], r["primary"], r["n_occ"])
            for r in rescore_phrase(
                spark, index_positional, QUERY, PHRASE,
                k=10, window=window, query_weight=qw,
                rescore_weight=rw, slop=slop,
            ).collect()
        ]
        assert [(d, n) for d, _, _, n in got] == [
            (d, n) for d, _, _, n in exp
        ]
        for (_, gf, gp, _), (_, ef, ep, _) in zip(got, exp):
            assert math.isclose(gf, ef, rel_tol=1e-9)
            assert math.isclose(gp, ep, rel_tol=1e-9)

    def test_rescore_actually_reorders(
        self, spark, index_positional, oracle_small
    ):
        """A doc holding the exact phrase must outrank a primary-better
        doc without it when the rescore weight dominates."""
        from uci_searchengine_spark.operators.rescore import rescore_phrase

        got = [
            (r["doc_id"], r["n_occ"])
            for r in rescore_phrase(
                spark, index_positional, QUERY, PHRASE,
                k=10, window=100, rescore_weight=10.0,
            ).collect()
        ]
        primary_order = [d for d, _ in oracle_small.top_k(QUERY, 10)]
        assert [d for d, _ in got] != primary_order
        assert got[0][1] > 0  # a phrase-holding doc leads

    def test_docstore_strategy_agrees(
        self, spark, index_small, index_positional
    ):
        from uci_searchengine_spark.operators.rescore import rescore_phrase

        a = rescore_phrase(
            spark, index_positional, QUERY, PHRASE, k=10, window=40,
            method="positions",
        ).collect()
        b = rescore_phrase(
            spark, index_small, QUERY, PHRASE, k=10, window=40,
            method="docstore",
        ).collect()
        assert [(r["doc_id"], r["n_occ"]) for r in a] == [
            (r["doc_id"], r["n_occ"]) for r in b
        ]

    def test_k_window_contract(self, spark, index_positional):
        from uci_searchengine_spark.operators.rescore import rescore_phrase

        with pytest.raises(ValueError):
            rescore_phrase(
                spark, index_positional, QUERY, PHRASE, k=20, window=10
            )

    def test_phrase_occ_for_ids_bounded_input(
        self, spark, index_positional, oracle_small
    ):
        import numpy as np

        from uci_searchengine_spark.functions.phrase import count_near_py
        from uci_searchengine_spark.functions.tokenize import tokenize_py
        from uci_searchengine_spark.operators.index_build import IndexMeta
        from uci_searchengine_spark.operators.rescore import (
            phrase_occ_for_ids,
        )

        meta = IndexMeta.load(index_positional)
        ids = np.asarray(
            sorted(range(len(oracle_small.texts)))[:40], dtype=np.int64
        )
        occ = phrase_occ_for_ids(
            index_positional, meta, PHRASE, ids, slop=1
        )
        seq = tokenize_py(PHRASE)
        for d in ids:
            exp = count_near_py(
                tokenize_py(oracle_small.texts[int(d)]), seq, 1
            )
            assert occ.get(int(d), 0) == exp, d
