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


def test_searcher_explain(spark, index_small, oracle_small):
    """Explanation total == oracle score exactly; components match the
    oracle's postings; non-matching and unknown docs explain as
    unmatched."""
    from uci_searchengine_spark.operators.serving import Searcher

    s = Searcher(spark, index_small)
    q = "stop0 arbak"
    scores = oracle_small.score(q)
    doc_id = max(scores, key=lambda d: scores[d])
    exp = s.explain(q, doc_id)
    assert exp["matched"] and exp["score"] == scores[doc_id]
    by_term = {t["term"]: t for t in exp["terms"]}
    for t in ("stop0", "arbak"):
        if doc_id in oracle_small.postings.get(t, {}):
            row = by_term[t]
            assert row["tf"] == oracle_small.postings[t][doc_id]
            assert row["df"] == len(oracle_small.postings[t])
            assert math.isclose(row["idf"], oracle_small.idf(t), rel_tol=1e-15)
    # ranked score agreement (scorer reassociates the float sum)
    from uci_searchengine_spark.operators.wand import score_wand

    ranked = {
        r["doc_id"]: r["score"]
        for r in score_wand(spark, index_small, q, k=1000).collect()
    }
    assert math.isclose(exp["score"], ranked[doc_id], rel_tol=1e-12)
    # a doc with no query terms (data-derived: any term that is NOT in
    # every doc)
    rare = next(
        t
        for t, p in oracle_small.postings.items()
        if 0 < len(p) < oracle_small.n_docs
    )
    non = next(
        d
        for d in range(oracle_small.n_docs)
        if d not in oracle_small.postings[rare]
    )
    assert s.explain(rare, non)["matched"] is False
    assert s.explain(q, oracle_small.n_docs + 7)["matched"] is False


def test_mlt_deleted_source_doc(spark, index_small, tmp_path):
    """A tombstoned source doc gets no recommendations (documented
    contract — the doc store still holds the row until compaction)."""
    import shutil

    from uci_searchengine_spark.operators.serving import Searcher
    from uci_searchengine_spark.operators.tombstones import delete_docs

    idx = str(tmp_path / "idx")
    shutil.copytree(index_small, idx)
    assert more_like_this(spark, idx, 42, k=5).count() > 0
    delete_docs(idx, [42])
    assert more_like_this(spark, idx, 42, k=5).count() == 0
    env = Searcher(spark, idx).similar(42, k=5)
    assert env["results"] == [] and env["terms"] == []
