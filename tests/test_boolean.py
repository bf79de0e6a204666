"""Boolean query executor vs the single-node oracle."""

import math

import pytest

QUERIES = [
    "stop0 arbak",              # pure OR == top_k
    "stop0 -arbak",             # OR + NOT
    "+arbak stop1",             # MUST + OR
    "+arband +arbast",          # pure MUST (== AND mode)
    'stop0 "arbak stop1"',      # phrase + OR
    '"arband arbast" -stop2',   # phrase + NOT
    "-stop0",                   # no positives → empty
    "+zzzznotaword stop1",      # absent MUST → empty
    '+stop0 -stop0',            # contradiction → empty (NOT wins)
    'stop0 +arbak -zzzznotaword',  # NOT on absent term is a no-op
]


def test_parse_query_shapes():
    from uci_searchengine_spark.functions.queryparse import parse_query
    from uci_searchengine_spark.functions.tokenize import tokenize_py

    bq = parse_query('a +b -c "d e" -"f g"', tokenize_py)
    assert bq.or_terms == ["a"]
    assert bq.must_terms == ["b"]
    assert set(bq.not_terms) == {"c", "f", "g"}
    assert bq.phrases == [["d", "e"]]
    assert bq.required_terms == ["b", "d", "e"]
    # multi-token chunk keeps its prefix on every token
    bq2 = parse_query("+data-base -x.y", tokenize_py)
    assert bq2.must_terms == ["data", "base"]
    assert set(bq2.not_terms) == {"x", "y"}
    # single-token quoted chunk is a plain term, not a phrase
    bq3 = parse_query('"solo" +"req"', tokenize_py)
    assert bq3.or_terms == ["solo"] and bq3.must_terms == ["req"]
    assert bq3.phrases == []


@pytest.mark.spark
class TestBooleanSearch:
    @pytest.mark.parametrize("query", QUERIES)
    def test_matches_oracle_docstore(self, spark, index_small, oracle_small, query):
        from uci_searchengine_spark.operators.boolean import boolean_search

        exp = oracle_small.boolean_top_k(query, 10)
        got = [
            (r["doc_id"], r["score"])
            for r in boolean_search(spark, index_small, query, 10).collect()
        ]
        assert len(got) == len(exp), (query, got, exp)
        for (gd, gs), (ed, es) in zip(got, exp):
            assert gd == ed, (query, got, exp)
            assert math.isclose(gs, es, rel_tol=1e-9)


@pytest.mark.spark
class TestBooleanPositional:
    @pytest.mark.parametrize(
        "query", [q for q in QUERIES if '"' in q]
    )
    def test_phrases_via_positions(
        self, spark, index_positional, oracle_small, query
    ):
        from uci_searchengine_spark.operators.boolean import boolean_search

        exp = oracle_small.boolean_top_k(query, 10)
        got = [
            (r["doc_id"], r["score"])
            for r in boolean_search(
                spark, index_positional, query, 10, phrase_method="positions"
            ).collect()
        ]
        assert len(got) == len(exp), (query, got, exp)
        for (gd, gs), (ed, es) in zip(got, exp):
            assert gd == ed and math.isclose(gs, es, rel_tol=1e-9)


def test_parse_query_properties():
    """Random-query invariants: positives never intersect NOT terms,
    phrases keep analyzer order, required ⊇ must ∪ phrase tokens."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from uci_searchengine_spark.functions.queryparse import parse_query
    from uci_searchengine_spark.functions.tokenize import tokenize_py

    word = st.text(alphabet="abcxyz", min_size=1, max_size=5)
    chunk = st.one_of(
        word,
        word.map(lambda w: "+" + w),
        word.map(lambda w: "-" + w),
        st.tuples(word, word).map(lambda t: f'"{t[0]} {t[1]}"'),
        st.tuples(word, word).map(lambda t: f'-"{t[0]} {t[1]}"'),
    )

    @given(st.lists(chunk, max_size=8).map(" ".join))
    @settings(max_examples=300, deadline=None)
    def check(q):
        bq = parse_query(q, tokenize_py)
        ban = set(bq.not_terms)
        assert not (set(bq.or_terms) & ban)
        assert not (set(bq.must_terms) & ban)
        assert len(set(bq.or_terms)) == len(bq.or_terms)  # deduped
        assert len(set(bq.must_terms)) == len(bq.must_terms)
        req = set(bq.required_terms)
        assert set(bq.must_terms) <= req
        for p in bq.phrases:
            assert len(p) >= 2  # single-token quotes are plain terms
            assert set(p) <= req
        pos = set(bq.positive_terms)
        assert set(bq.or_terms) | req == pos

    check()
