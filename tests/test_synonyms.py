"""Query-time synonyms: map normalization rules, per-clause rewrite
semantics, and the boolean path vs the oracle under a map — both plans
and the serving twin."""

import math

import pytest

from uci_searchengine_spark.functions.queryparse import parse_query
from uci_searchengine_spark.functions.synonyms import (
    apply_synonyms,
    normalize_synonyms,
)
from uci_searchengine_spark.functions.tokenize import tokenize_py


def test_normalize_rules():
    raw = {
        "Car": ["Auto", "car", "motor vehicle", "automobile"],
        "two words": ["x"],
        "a": [],
    }
    n = normalize_synonyms(raw, tokenize_py)
    # keys/values analyzed; self-map and multi-token entries dropped
    assert n == {"car": ["auto", "automobile"]}
    sym = normalize_synonyms({"car": ["auto"]}, tokenize_py, symmetric=True)
    assert sym == {"car": ["auto"], "auto": ["car"]}


def test_apply_per_clause_rules():
    syn = {"car": ["auto"], "fast": ["quick"], "red": ["crimson"]}
    bq = parse_query('car +fast -red "new car"~1 (van|truck)', tokenize_py)
    out = apply_synonyms(bq, syn)
    assert out.or_terms == ["car", "auto"]          # SHOULD joins
    assert out.must_terms == []                     # must became a group
    assert ["fast", "quick"] in out.groups          # required any-of
    assert ["van", "truck"] in out.groups           # untouched group
    assert set(out.not_terms) == {"red", "crimson"}  # class banned
    assert out.phrases == [["new", "car"]]          # phrases untouched
    assert out.slops() == [1]
    # group members expand too
    out2 = apply_synonyms(
        parse_query("(car|van)", tokenize_py), {"car": ["auto"]}
    )
    assert ["car", "van", "auto"] in out2.groups or [
        "car", "auto", "van",
    ] in out2.groups
    # ban-wins invariant survives the rewrite
    out3 = apply_synonyms(
        parse_query("car -auto", tokenize_py),
        {"car": ["auto"], "auto": ["car"]},
    )
    assert out3.or_terms == [] and set(out3.not_terms) == {"auto", "car"}


SYN = {"stop0": ["stop1"], "arbak": ["arbal"]}
BQUERIES = [
    "+stop0 arbak",       # must -> group, should joins
    "arbak -stop0",       # NOT bans stop1 too
    "+arbak +stop3",      # one synonymed must, one plain
    '"stop0 stop1" arbak',  # phrase untouched, should expands
]


@pytest.mark.spark
class TestSynonymSearch:
    @pytest.mark.parametrize("query", BQUERIES)
    def test_matches_oracle(self, spark, index_small, oracle_small, query):
        from uci_searchengine_spark.operators.boolean import boolean_search

        exp = oracle_small.boolean_top_k(query, 10, synonyms=SYN)
        got = [
            (r["doc_id"], r["score"])
            for r in boolean_search(
                spark, index_small, query, 10, synonyms=SYN
            ).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], (query, got, exp)
        for (_, gs), (_, es) in zip(got, exp):
            assert math.isclose(gs, es, rel_tol=1e-9)

    def test_serving_both_plans(self, spark, index_small, oracle_small):
        from uci_searchengine_spark.operators.serving import Searcher

        query = "+stop0 arbak"
        exp = oracle_small.boolean_top_k(query, 10, synonyms=SYN)
        s = Searcher(spark, index_small, query_cache=0)
        for plan in ("local", "spark"):
            rows = s.boolean_rows(query, k=10, plan=plan, synonyms=SYN)
            assert [r["doc_id"] for r in rows] == [d for d, _ in exp], plan
            assert s.last_plan == plan

    def test_synonyms_widen_strictly(self, spark, index_small):
        from uci_searchengine_spark.operators.boolean import boolean_search

        plain = {
            r["doc_id"]
            for r in boolean_search(
                spark, index_small, "+arbanq", 1000
            ).collect()
        }
        syn = {
            r["doc_id"]
            for r in boolean_search(
                spark, index_small, "+arbanq", 1000,
                synonyms={"arbanq": ["arband"]},
            ).collect()
        }
        assert plain <= syn and plain != syn
