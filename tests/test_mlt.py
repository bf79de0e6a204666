"""More-Like-This pinned against a python oracle that replays the exact
Lucene-shaped contract: tf·idf term selection (maxQueryTerms cap,
deterministic ties) → BM25 OR disjunction → source excluded."""

import math
from collections import Counter

import pytest

from uci_searchengine_spark.functions.tokenize import tokenize_py
from uci_searchengine_spark.operators.mlt import more_like_this, select_terms


def _oracle_mlt(oracle, doc_id, k=10, max_terms=25):
    tf = Counter(tokenize_py(oracle.texts[doc_id]))
    scored = sorted(
        ((c * oracle.idf(t), t) for t, c in tf.items() if t in oracle.postings),
        key=lambda x: (-x[0], x[1]),
    )
    terms = [t for _, t in scored[:max_terms]]
    scores = oracle.score(" ".join(terms))
    scores.pop(doc_id, None)
    return terms, sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_select_terms_matches_oracle(spark, index_small, oracle_small):
    from uci_searchengine_spark.operators.index_build import IndexMeta

    meta = IndexMeta.load(index_small)
    for doc_id in (0, 17, 123):
        want, _ = _oracle_mlt(oracle_small, doc_id)
        got = select_terms(
            spark, index_small, meta, oracle_small.texts[doc_id]
        )
        assert got == want, doc_id


@pytest.mark.parametrize("doc_id", [0, 42, 222])
def test_mlt_vs_oracle(spark, index_small, oracle_small, doc_id):
    _, want = _oracle_mlt(oracle_small, doc_id)
    got = [
        (r["doc_id"], r["score"])
        for r in more_like_this(spark, index_small, doc_id, k=10).collect()
    ]
    assert doc_id not in [d for d, _ in got]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-12), (doc_id, gd)


def test_mlt_missing_doc(spark, index_small, oracle_small):
    assert (
        more_like_this(spark, index_small, oracle_small.n_docs + 5, k=5).count()
        == 0
    )


def test_mlt_max_terms_cap(spark, index_small, oracle_small):
    doc_id = 7
    _, want = _oracle_mlt(oracle_small, doc_id, max_terms=5)
    got = [
        (r["doc_id"], r["score"])
        for r in more_like_this(
            spark, index_small, doc_id, k=10, max_terms=5
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_searcher_similar_envelope(spark, index_small, oracle_small):
    from uci_searchengine_spark.operators.serving import Searcher

    doc_id = 42
    terms_want, want = _oracle_mlt(oracle_small, doc_id)
    env = Searcher(spark, index_small).similar(doc_id, k=10)
    assert env["doc_id"] == doc_id
    assert env["terms"] == terms_want
    assert [r["url"] for r in env["results"]] == [
        oracle_small.urls[d] for d, _ in want
    ]
    for r, (d, sc) in zip(env["results"], want):
        assert math.isclose(r["score"], sc, rel_tol=1e-12)
    # unknown doc -> empty envelope
    empty = Searcher(spark, index_small).similar(oracle_small.n_docs + 9)
    assert empty["results"] == [] and empty["terms"] == []
