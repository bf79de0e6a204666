"""End-to-end: Spark index build + both scorers vs the single-node oracle.

Rank-identity contract (FIXTURES.md §6): same top-k doc_ids in the same
order, scores equal within 1e-9 relative tolerance, ties broken doc_id asc.
"""

import math

import pytest

from uci_searchengine_spark.oracle.oracle import REFERENCE_QUERIES

K = 10


def _assert_rank_identical(got: list, expected: list, query: str):
    assert len(got) == len(expected), (query, got, expected)
    for (gd, gs), (ed, es) in zip(got, expected):
        assert gd == ed, (query, got, expected)
        assert math.isclose(gs, es, rel_tol=1e-9), (query, gd, gs, es)


@pytest.mark.spark
class TestSearchE2E:
    def test_meta_matches_oracle(self, spark, index_small, oracle_small):
        from uci_searchengine_spark.operators.index_build import IndexMeta

        meta = IndexMeta.load(index_small)
        assert meta.n_docs == oracle_small.n_docs
        assert math.isclose(meta.avgdl, oracle_small.avgdl, rel_tol=1e-12)

    @pytest.mark.parametrize("query", REFERENCE_QUERIES)
    def test_naive_scorer_matches_oracle(self, spark, index_small, oracle_small, query):
        from uci_searchengine_spark.operators.bm25 import score_naive

        expected = oracle_small.top_k(query, K)
        got = [
            (r["doc_id"], r["score"])
            for r in score_naive(spark, index_small, query, K).collect()
        ]
        _assert_rank_identical(got, expected, query)

    @pytest.mark.parametrize("query", REFERENCE_QUERIES)
    def test_wand_scorer_matches_oracle(self, spark, index_small, oracle_small, query):
        from uci_searchengine_spark.operators.wand import score_wand

        expected = oracle_small.top_k(query, K)
        got = [
            (r["doc_id"], r["score"])
            for r in score_wand(spark, index_small, query, K).collect()
        ]
        _assert_rank_identical(got, expected, query)

    @pytest.mark.parametrize("query", REFERENCE_QUERIES)
    def test_and_mode_scorers_match_oracle(
        self, spark, index_small, oracle_small, query
    ):
        """Conjunctive (ALL-terms) mode: naive HAVING-count form and the
        segment rarest-first intersection both rank-identical to the
        oracle's eligible-set filter."""
        from uci_searchengine_spark.operators.bm25 import score_naive
        from uci_searchengine_spark.operators.wand import score_wand

        expected = oracle_small.top_k_and(query, K)
        for scorer in (score_naive, score_wand):
            got = [
                (r["doc_id"], r["score"])
                for r in scorer(spark, index_small, query, K, mode="and").collect()
            ]
            _assert_rank_identical(got, expected, f"and:{query}")

    def test_envelope_matches_oracle(self, spark, index_small, oracle_small):
        from uci_searchengine_spark.operators.bm25 import search

        q = "stop0 arbak"
        got = search(spark, index_small, q, page=1, per_page=5)
        exp = oracle_small.search(q, page=1, per_page=5)
        assert got["total_results"] == exp["total_results"]
        assert got["total_pages"] == exp["total_pages"]
        assert [r["url"] for r in got["results"]] == [r["url"] for r in exp["results"]]
        assert [r["title"] for r in got["results"]] == [
            r["title"] for r in exp["results"]
        ]
        assert [r["snippet"] for r in got["results"]] == [
            r["snippet"] for r in exp["results"]
        ]
        for g, e in zip(got["results"], exp["results"]):
            assert math.isclose(g["score"], e["score"], rel_tol=1e-9)

    def test_and_envelope(self, spark, index_small, oracle_small):
        """AND-mode envelope: totals and page equal the oracle's
        conjunctive eligible set, with both scorers."""
        from uci_searchengine_spark.operators.bm25 import score_naive, search
        from uci_searchengine_spark.operators.wand import score_wand

        q = "stop0 arbak"
        exp = oracle_small.top_k_and(q, 10**6)
        for scorer in (score_naive, score_wand):
            got = search(spark, index_small, q, per_page=5, scorer=scorer, mode="and")
            assert got["total_results"] == len(exp)
            assert [r["score"] for r in got["results"]] == pytest.approx(
                [s for _, s in exp[:5]], rel=1e-9
            )

    def test_searcher_and_mode(self, spark, index_small, oracle_small):
        from uci_searchengine_spark.operators.serving import Searcher

        q = "stop0 arbak"
        exp = oracle_small.top_k_and(q, 10)
        s = Searcher(spark, index_small)
        got = [
            (r["doc_id"], r["score"]) for r in s.top_k(q, 10, mode="and").collect()
        ]
        _assert_rank_identical(got, [(d, sc) for d, sc in exp], f"searcher-and:{q}")
        env = s.search(q, per_page=3, mode="and")
        assert env["total_results"] == len(oracle_small.top_k_and(q, 10**6))

    def test_searcher_envelope_matches_oracle_one_job(
        self, spark, index_small, oracle_small
    ):
        """Searcher.search folds total_results AND the doc-store fetch
        into the scoring pass (wand.topk_count_docs): envelope equals the
        oracle's and the whole query is ONE Spark action."""
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, index_small)
        q = "stop0 arbak"
        sc = spark.sparkContext
        sc.setJobGroup("env-one-job", "searcher envelope job count")
        got = s.search(q, page=1, per_page=5)
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup("env-one-job")
        sc.setJobGroup(None, None)
        exp = oracle_small.search(q, page=1, per_page=5)
        assert got["total_results"] == exp["total_results"]
        assert got["total_pages"] == exp["total_pages"]
        assert [r["url"] for r in got["results"]] == [r["url"] for r in exp["results"]]
        for g, e in zip(got["results"], exp["results"]):
            assert math.isclose(g["score"], e["score"], rel_tol=1e-9)
        assert got["did_you_mean"] is None
        # exactly ONE action: the folded scorer+count+doc-fetch collect
        # (AQE fans one action into several job ids, so count distinct
        # collect call-sites, not jobs)
        sites = set()
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for st in ji.stageIds:
                si = tracker.getStageInfo(st)
                if si is not None:
                    sites.add(si.name.split(" at ")[-1])
        assert len(sites) <= 1, sites

    def test_searcher_envelope_zero_hits_did_you_mean(self, spark, index_small):
        """Envelope-shape parity with bm25.search: the did_you_mean key is
        present, and the zero-hit path consults the vocabulary."""
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, index_small)
        env = s.search("arbak1")  # off-by-one typo of an indexed term
        assert env["total_results"] == 0
        assert "did_you_mean" in env
        assert env["did_you_mean"] == "arbak"
        env2 = s.search("!!! ...")
        assert env2["total_results"] == 0 and "did_you_mean" in env2

    def test_empty_query_envelope(self, spark, index_small):
        from uci_searchengine_spark.operators.bm25 import search

        got = search(spark, index_small, "!!! ...")
        assert got["total_results"] == 0
        assert got["results"] == []
        assert got["total_pages"] == 0
