"""Fuzzy term queries (Lucene FuzzyQuery rewrite): syntax parsing, the
Spark expansion vs the in-process replica vs a python reference, and
end-to-end fuzzy_search vs an oracle built from the same pinned
semantics (expand → OR-sum BM25)."""

import math

import pytest

from uci_searchengine_spark.functions.tokenize import tokenize_py
from uci_searchengine_spark.operators.fuzzy import (
    MAX_EXPANSIONS,
    auto_fuzziness,
    expand_fuzzy_local,
    parse_fuzzy,
)


def test_parse_fuzzy_syntax():
    lits, fuz = parse_fuzzy("spark dat~1 JOIN~ x~0 plain~9 tail")
    assert lits == ["spark", "plain~9", "tail"]  # ~9 is not fuzzy syntax
    assert fuz == [("dat", 1), ("join", auto_fuzziness("join")), ("x", 0)]


def test_auto_fuzziness_es_rule():
    assert auto_fuzziness("ab") == 0
    assert auto_fuzziness("abc") == 1
    assert auto_fuzziness("abcde") == 1
    assert auto_fuzziness("abcdef") == 2


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _expand_ref(vocab_df, word, max_edits, prefix_length=0, cap=MAX_EXPANSIONS):
    """Python reference of the pinned expansion rule."""
    if max_edits == 0:
        return [word]
    cand = []
    for t, df in vocab_df:
        if abs(len(t) - len(word)) > max_edits:
            continue
        if prefix_length and not t.startswith(word[:prefix_length]):
            continue
        d = _lev(t, word)
        if d <= max_edits:
            cand.append((d, -df, t))
    cand.sort()
    return [t for _, _, t in cand[:cap]]


@pytest.mark.spark
class TestFuzzy:
    @pytest.mark.parametrize(
        "word,edits,plen",
        [
            ("arbak", 1, 0),
            ("arbak", 2, 0),
            ("stop0", 1, 0),
            ("arbam", 2, 2),
            ("zzzzzzz", 1, 0),
            ("arbak", 0, 0),
        ],
    )
    def test_expansion_spark_local_ref_agree(
        self, spark, index_small, vocab_rows, word, edits, plen
    ):
        from uci_searchengine_spark.operators.fuzzy import expand_fuzzy

        ref = _expand_ref(vocab_rows, word, edits, plen)
        got = expand_fuzzy(spark, index_small, word, edits, plen)
        assert got == ref, (word, edits, plen)
        terms = [t for t, _ in vocab_rows]
        dfs = [d for _, d in vocab_rows]
        loc = expand_fuzzy_local(terms, dfs, word, edits, plen)
        assert loc == ref, (word, edits, plen)

    @pytest.mark.parametrize(
        "query", ["arbak~1", "arbak~2 stop1", "arbam~ stop0", "zzzzzzz~1"]
    )
    def test_fuzzy_search_matches_oracle(
        self, spark, index_small, oracle_small, vocab_rows, query
    ):
        from uci_searchengine_spark.operators.fuzzy import fuzzy_search

        lits, fuz = parse_fuzzy(query)
        terms = tokenize_py(" ".join(lits)) if lits else []
        for w, e in fuz:
            terms.extend(_expand_ref(vocab_rows, w, e))
        terms = list(dict.fromkeys(terms))
        scores = oracle_small.score(" ".join(terms)) if terms else {}
        expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = [
            (r["doc_id"], r["score"])
            for r in fuzzy_search(spark, index_small, query, k=10).collect()
        ]
        assert len(got) == len(expected), (query, got, expected)
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gd == ed, (query, got, expected)
            assert math.isclose(gs, es, rel_tol=1e-9)

    def test_expansion_cap_in_plan(self, spark, index_small, vocab_rows):
        """A 2-edit neighborhood larger than the cap is truncated at the
        pinned ordering's boundary."""
        from uci_searchengine_spark.operators.fuzzy import expand_fuzzy

        full = _expand_ref(vocab_rows, "arbak", 2, cap=10**9)
        assert len(full) > MAX_EXPANSIONS  # the cap is actually engaged
        got = expand_fuzzy(spark, index_small, "arbak", 2)
        assert got == full[:MAX_EXPANSIONS]


@pytest.mark.spark
class TestFuzzyServing:
    def test_search_envelope_fuzzy_token(
        self, spark, index_small, oracle_small, vocab_rows
    ):
        """A ``word~N`` token in Searcher.search expands like the
        operator path and scores as ordinary OR terms — both plans."""
        from uci_searchengine_spark.operators.serving import Searcher

        query = "arbak~1 stop1"
        terms = ["stop1"] + _expand_ref(vocab_rows, "arbak", 1)
        terms = list(dict.fromkeys(terms))
        scores = oracle_small.score(" ".join(terms))
        expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        s = Searcher(spark, index_small, query_cache=0)
        for plan in ("local", "spark"):
            env = s.search(query, page=1, per_page=5, plan=plan)
            assert env["total_results"] == len(scores)
            got = [round(r["score"], 9) for r in env["results"]]
            assert got == [round(sc, 9) for _, sc in expected], plan
            assert s.last_plan == plan

    def test_fuzzy_requires_or_mode(self, spark, index_small):
        from uci_searchengine_spark.operators.serving import Searcher

        with pytest.raises(ValueError):
            Searcher(spark, index_small, query_cache=0).search(
                "arbak~1 stop1", mode="and"
            )
