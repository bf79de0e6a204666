"""Query-time term boosts (Lucene ``term^N``): parser, scorer weight
math, plan parity (local == spark == score_wand), and the serving
surface's chunk→analyzed-term resolution."""

import math

import pytest

from uci_searchengine_spark.functions.queryparse import parse_boosts


class TestParseBoosts:
    def test_strips_and_collects(self):
        rest, b = parse_boosts("data^2 spark join^0.5")
        assert rest == "data spark join"
        assert b == {"data": 2.0, "join": 0.5}

    def test_no_boosts_passthrough(self):
        rest, b = parse_boosts("+data -spark (a|b)")
        assert rest == "+data -spark (a|b)" and b == {}

    def test_phrase_and_group_untouched(self):
        rest, b = parse_boosts('"a b"^2 (x|y)^3')
        assert rest == '"a b"^2 (x|y)^3' and b == {}

    def test_duplicate_takes_max(self):
        _, b = parse_boosts("data^2 data^3")
        assert b == {"data": 3.0}

    def test_zero_boost_rejected(self):
        with pytest.raises(ValueError):
            parse_boosts("data^0")

    def test_wildcard_chunk_collected(self):
        rest, b = parse_boosts("arbak* dat*^2")
        assert rest == "arbak* dat*" and b == {"dat*": 2.0}


@pytest.mark.spark
class TestBoostedScoring:
    def test_boost_equals_manual_recompute(self, spark, index_small, oracle_small):
        """score(boosted) == Σ boost(t)·idf(t)·tf_part(t): recompute the
        boosted score from the per-term explain breakdown."""
        from uci_searchengine_spark.operators.serving import Searcher
        from uci_searchengine_spark.operators.wand import score_wand

        boosts = {"stop0": 3.0, "arbak": 0.25}
        got = score_wand(
            spark, index_small, "stop0 arbak", k=5, boosts=boosts
        ).collect()
        assert got
        s = Searcher(spark, index_small, query_cache=0)
        for r in got:
            ex = s.explain("stop0 arbak", r["doc_id"])
            want = sum(
                boosts[t["term"]] * t["contribution"] for t in ex["terms"]
            )
            assert r["score"] == pytest.approx(want, rel=1e-9)

    def test_boost_one_is_identity(self, spark, index_small):
        from uci_searchengine_spark.operators.wand import score_wand

        a = score_wand(spark, index_small, "stop0 arbak", k=10).collect()
        b = score_wand(
            spark, index_small, "stop0 arbak", k=10,
            boosts={"stop0": 1.0, "arbak": 1.0},
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]

    def test_boosted_full_ranking_matches_oracle(
        self, spark, index_small, oracle_small
    ):
        """The WHOLE boosted match-set ranking equals a brute-force
        python recomputation (boost·idf·tf_part per term, OR-sum, score
        desc / doc asc on 9-digit-rounded scores — rounding on both
        sides because the scorer accumulates upper-bound-first while the
        brute force adds in term order)."""
        from uci_searchengine_spark import BM25_B, BM25_K1
        from uci_searchengine_spark.operators.wand import score_wand

        boosts = {"stop0": 0.1, "arbak": 50.0}
        got = score_wand(
            spark, index_small, "stop0 arbak", k=10**6, boosts=boosts
        ).collect()
        o = oracle_small
        scores: dict[int, float] = {}
        for t, b in boosts.items():
            w = o.idf(t) * b
            for d, tf in o.postings.get(t, {}).items():
                dl = o.doc_len[d]
                tf_part = tf * (BM25_K1 + 1.0) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / o.avgdl)
                )
                scores[d] = scores.get(d, 0.0) + w * tf_part
        want = sorted(
            ((d, round(s, 9)) for d, s in scores.items() if s > 0),
            key=lambda kv: (-kv[1], kv[0]),
        )
        got_r = sorted(
            ((r["doc_id"], round(r["score"], 9)) for r in got),
            key=lambda kv: (-kv[1], kv[0]),
        )
        assert got_r == want

    def test_envelope_plans_agree(self, spark, index_small):
        """term^N through Searcher.search: the task-local and the
        distributed plan return identical boosted envelopes, and they
        differ from the unboosted envelope."""
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, index_small, query_cache=0)
        q = "arbak stop0^50"
        local = s.search(q, per_page=10, plan="local")
        assert s.last_plan == "local"
        dist = s.search(q, per_page=10, plan="spark")
        assert s.last_plan == "spark"
        assert [r["url"] for r in local["results"]] == [
            r["url"] for r in dist["results"]
        ]
        assert [round(r["score"], 9) for r in local["results"]] == [
            round(r["score"], 9) for r in dist["results"]
        ]
        plain = s.search("arbak stop0", per_page=10, plan="local")
        # the boost changed every matched doc's score (this corpus's
        # uniform tf pattern keeps the ORDER stable — the oracle test
        # above pins the reranking math itself)
        assert [round(r["score"], 9) for r in plain["results"]] != [
            round(r["score"], 9) for r in local["results"]
        ]
        # total_results is boost-invariant (eligibility never changes)
        assert plain["total_results"] == local["total_results"]

    def test_boosted_wildcard_boosts_expansions(self, spark, index_small):
        """arbak*^N boosts every expansion — equivalent to boosting each
        expanded term explicitly."""
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, index_small, query_cache=0)
        a = s.search("stop0 arbak*^7", per_page=10, plan="local")
        terms = s._expand_prefix("arbak")
        manual = " ".join(["stop0"] + [f"{t}^7" for t in terms])
        b = s.search(manual, per_page=10, plan="local")
        assert [r["url"] for r in a["results"]] == [
            r["url"] for r in b["results"]
        ]
        assert [round(r["score"], 9) for r in a["results"]] == [
            round(r["score"], 9) for r in b["results"]
        ]

    def test_fuzzy_boost_rejected(self, spark, index_small):
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, index_small, query_cache=0)
        with pytest.raises(ValueError):
            s.search("arbak~1^2")

    def test_site_filter_composes_with_boost(self, spark, index_small):
        """site: + boost: the filtered envelope applies the boosted
        weights (scores match the unfiltered boosted ranking restricted
        to the allowed host)."""
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, index_small, query_cache=0)
        full = s.search("stop0 arbak^50", per_page=1000, plan="local")
        host = None
        for r in full["results"]:
            if r["url"]:
                host = r["url"].split("://")[1].split("/")[0].lower()
                break
        assert host
        filt = s.search(f"stop0 arbak^50 site:{host}", per_page=1000)
        want = [
            (r["url"], round(r["score"], 9))
            for r in full["results"]
            if r["url"] and r["url"].split("://")[1].split("/")[0].lower() == host
        ]
        got = [(r["url"], round(r["score"], 9)) for r in filt["results"]]
        assert got == want
