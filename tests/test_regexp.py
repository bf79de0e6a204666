"""Regex term queries (Lucene RegexpQuery rewrite): syntax parsing,
literal-prefix extraction, Spark expansion vs the in-process replica vs
a python reference, and end-to-end regexp_search vs the oracle."""

import math
import re

import pytest

from uci_searchengine_spark.functions.tokenize import tokenize_py
from uci_searchengine_spark.operators.regexp import (
    MAX_EXPANSIONS,
    expand_regexp_local,
    literal_prefix,
    parse_regexps,
)


def test_parse_regexps_syntax():
    lits, pats = parse_regexps("spark /dat[a-z]/ JOIN /AR.*K/ not/slashed")
    assert lits == ["spark", "JOIN", "not/slashed"]
    assert pats == ["dat[a-z]", "ar.*k"]  # lowered


def test_literal_prefix_rules():
    assert literal_prefix("data") == "data"
    assert literal_prefix("dat[a-z]") == "dat"
    assert literal_prefix("dat.*") == "dat"
    assert literal_prefix("dat?x") == "da"  # ? makes the t optional
    assert literal_prefix("dat*") == "da"
    assert literal_prefix("dat{0,2}") == "da"
    assert literal_prefix("[ab]cd") == ""
    assert literal_prefix(".*") == ""


def _expand_ref(vocab_df, pattern, cap=MAX_EXPANSIONS):
    rx = re.compile(pattern)
    cand = [(-df, t) for t, df in vocab_df if rx.fullmatch(t)]
    cand.sort()
    return [t for _, t in cand[:cap]]


@pytest.mark.spark
class TestRegexp:
    @pytest.mark.parametrize(
        "pattern",
        [
            "arba[kl]",
            "arb.*",
            "stop[0-9]",
            "ar(band|bast)",
            "zzz+",
            "arbak",
        ],
    )
    def test_expansion_spark_local_ref_agree(
        self, spark, index_small, vocab_rows, pattern
    ):
        from uci_searchengine_spark.operators.regexp import expand_regexp

        ref = _expand_ref(vocab_rows, pattern)
        got = expand_regexp(spark, index_small, pattern)
        assert got == ref, pattern
        terms = [t for t, _ in vocab_rows]
        dfs = [d for _, d in vocab_rows]
        assert expand_regexp_local(terms, dfs, pattern) == ref, pattern

    def test_full_match_not_substring(self, spark, index_small, vocab_rows):
        """'arba' matches no term fully even though many contain it."""
        from uci_searchengine_spark.operators.regexp import expand_regexp

        assert any(t.startswith("arba") for t, _ in vocab_rows)
        assert expand_regexp(spark, index_small, "arba") == []

    def test_bad_pattern_raises(self, spark, index_small):
        from uci_searchengine_spark.operators.regexp import expand_regexp

        with pytest.raises(re.error):
            expand_regexp(spark, index_small, "([")

    @pytest.mark.parametrize(
        "query", ["/arba[kl]/", "/stop[0-9]/ arbak", "/zzz+x/ stop1"]
    )
    def test_regexp_search_matches_oracle(
        self, spark, index_small, oracle_small, vocab_rows, query
    ):
        from uci_searchengine_spark.operators.regexp import regexp_search

        lits, pats = parse_regexps(query)
        terms = tokenize_py(" ".join(lits)) if lits else []
        for p in pats:
            terms.extend(_expand_ref(vocab_rows, p))
        terms = list(dict.fromkeys(terms))
        scores = oracle_small.score(" ".join(terms)) if terms else {}
        expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = [
            (r["doc_id"], r["score"])
            for r in regexp_search(spark, index_small, query, k=10).collect()
        ]
        assert len(got) == len(expected), (query, got, expected)
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gd == ed, (query, got, expected)
            assert math.isclose(gs, es, rel_tol=1e-9)

    def test_search_envelope_regex_token(
        self, spark, index_small, oracle_small, vocab_rows
    ):
        """A ``/pat/`` token in Searcher.search — both plans — and
        composition with a wildcard."""
        from uci_searchengine_spark.operators.serving import Searcher

        query = "/arba[kl]/ univers*"
        from uci_searchengine_spark.operators.prefix import (
            expand_prefix_local,
        )

        terms = _expand_ref(vocab_rows, "arba[kl]")
        terms += expand_prefix_local(
            [t for t, _ in vocab_rows], [d for _, d in vocab_rows], "univers"
        )
        terms = list(dict.fromkeys(terms))
        scores = oracle_small.score(" ".join(terms))
        expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        s = Searcher(spark, index_small, query_cache=0)
        for plan in ("local", "spark"):
            env = s.search(query, page=1, per_page=5, plan=plan)
            assert env["total_results"] == len(scores), plan
            got = [round(r["score"], 9) for r in env["results"]]
            assert got == [round(sc, 9) for _, sc in expected], plan
        with pytest.raises(ValueError):
            s.search(query, mode="and")
