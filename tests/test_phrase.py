"""Phrase search: JVM HOF count vs the Python reference, and the
segment-path match-then-verify operator vs the single-node oracle."""

import math

import pytest

from uci_searchengine_spark.functions.phrase import count_phrase_py

PHRASES = [
    "stop0 stop1",       # common bigram
    "arbak stop1",       # query used in the OR tests, as a phrase
    "stop0",             # single-token phrase == AND == term match
    "arband arbast",     # rare pair
    "stop0 stop0",       # repeated-token phrase (overlap counting)
    "zzzznotaword stop0",  # absent head term → empty
    "!!! ...",           # tokenizes to nothing → empty
]


def test_count_phrase_py_overlap():
    assert count_phrase_py(list("ababa"), ["a", "b", "a"]) == 2  # overlapping
    assert count_phrase_py(["x"], ["x", "y"]) == 0
    assert count_phrase_py([], ["x"]) == 0
    assert count_phrase_py(["x", "y"], []) == 0


@pytest.mark.spark
class TestPhrase:
    def test_phrase_count_col_matches_py(self, spark):
        """JVM HOF == Python reference on crafted rows incl. edge cases."""
        import pandas as pd
        from pyspark.sql import functions as F

        from uci_searchengine_spark.functions.phrase import phrase_count_col

        rows = [
            ["a", "b", "a", "b", "a"],
            ["a"],
            [],
            ["b", "a"],
            ["a", "b"],
            ["x", "a", "b", "x", "a", "b"],
        ]
        seq = ["a", "b"]
        df = spark.createDataFrame(
            pd.DataFrame({"i": range(len(rows)), "t": rows})
        )
        got = {
            r["i"]: r["n"]
            for r in df.select(
                "i", phrase_count_col(F.col("t"), seq).alias("n")
            ).collect()
        }
        for i, toks in enumerate(rows):
            assert got[i] == count_phrase_py(toks, seq), (i, toks)

    @pytest.mark.parametrize("phrase", PHRASES)
    def test_phrase_search_matches_oracle(
        self, spark, index_small, oracle_small, phrase
    ):
        from uci_searchengine_spark.operators.phrase import phrase_search

        expected = oracle_small.top_k_phrase(phrase, 10)
        got = [
            (r["doc_id"], r["score"], r["n_occ"])
            for r in phrase_search(spark, index_small, phrase, 10).collect()
        ]
        assert len(got) == len(expected), (phrase, got, expected)
        for (gd, gs, gn), (ed, es, en) in zip(got, expected):
            assert gd == ed and gn == en, (phrase, got, expected)
            assert math.isclose(gs, es, rel_tol=1e-9), (phrase, gd, gs, es)
