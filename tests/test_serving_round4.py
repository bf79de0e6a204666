"""Round-4 serving additions: collapsed envelope (+HTTP), scroll-style
bulk export, and a fuzz pass over the whole query-parse surface (no
crash, parse-determinism) on random query strings."""

import json
import random
import threading
import urllib.parse
import urllib.request

import pytest


@pytest.fixture(scope="module")
def http_server(spark, index_small):
    from uci_searchengine_spark.http_api import make_server

    srv = make_server(spark, index_small, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, srv
    srv.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path) as r:
        return r.status, json.loads(r.read())


@pytest.mark.spark
class TestCollapseServing:
    def test_collapsed_envelope_vs_operator(self, spark, index_small):
        from uci_searchengine_spark.operators.collapse import collapsed_topk
        from uci_searchengine_spark.operators.serving import Searcher

        q = "stop0 arbak"
        s = Searcher(spark, index_small, query_cache=0)
        env = s.collapsed_envelope(q, k=5)
        exp = collapsed_topk(spark, index_small, q, k=5).collect()
        assert [r["group"] for r in env["results"]] == [
            r["group"] for r in exp
        ]
        assert [round(r["score"], 9) for r in env["results"]] == [
            round(r["score"], 9) for r in exp
        ]
        # one result per host by default
        groups = [r["group"] for r in env["results"]]
        assert len(groups) == len(set(groups))
        assert all(r["url"] for r in env["results"])

    def test_collapse_http(self, spark, index_small, http_server):
        base, _ = http_server
        q = urllib.parse.quote("stop0 arbak")
        code, got = _get(
            base, f"/api/advanced?query={q}&mode=collapse&k=5&per_group=1"
        )
        assert code == 200 and got["mode"] == "collapse"
        groups = [r["group"] for r in got["results"]]
        assert groups and len(groups) == len(set(groups))


@pytest.mark.spark
class TestExport:
    def test_export_is_full_ranked_match_set(
        self, spark, index_small, oracle_small, tmp_path
    ):
        from uci_searchengine_spark.operators.bm25 import export_matches

        q = "stop0 arbak"
        out = str(tmp_path / "export")
        n = export_matches(spark, index_small, q, out)
        exp = oracle_small.top_k(q, 10**9)
        assert n == len(exp)
        got = (
            spark.read.parquet(out)
            .orderBy("doc_id")
            .collect()
        )
        exp_sorted = sorted(exp)
        assert [r["doc_id"] for r in got] == [d for d, _ in exp_sorted]
        # overwrite is idempotent
        assert export_matches(spark, index_small, q, out) == n


@pytest.mark.spark
class TestQuerySurfaceFuzz:
    def test_random_queries_never_crash(self, spark, index_small):
        """Every random junk string must parse and search without an
        exception (ValueError for documented mode conflicts aside) and
        return a well-formed envelope."""
        from uci_searchengine_spark.operators.serving import Searcher

        rng = random.Random(42)
        pieces = [
            "arbak", "stop0", "zz", '"stop0 stop1"', '"a b"~2', "+", "-",
            "(arbak|stop1)", "dat*", "arbak~1", "/arb.*/", "~", "*", "|",
            '"unclosed', "site:x.example.com", "()", '""~3', "a~9",
            "стоп", "🙂", "-stop0",
            # range-ish tokens: well-formed ones raise the documented
            # unknown-plane ValueError on this plane-less index;
            # malformed ones must flow through as ordinary junk
            "rank:[0.1 TO 0.9]", "rank:[1 to 2]", "x:[* TO", "a:{2 TO *]",
        ]
        from uci_searchengine_spark.operators.filtered import (
            parse_range_filters,
        )

        s = Searcher(spark, index_small, query_cache=0)
        for i in range(40):
            q = " ".join(
                rng.choice(pieces) for _ in range(rng.randint(1, 4))
            )
            _, ranges = parse_range_filters(q)
            if ranges:
                with pytest.raises(ValueError, match="no doc-values"):
                    s.search(q, page=1, per_page=3)
                continue
            env = s.search(q, page=1, per_page=3)
            assert set(env) >= {
                "query", "total_results", "results", "total_pages",
            }, q
            assert env["total_results"] >= 0, q

    def test_parse_determinism_on_junk(self):
        from uci_searchengine_spark.functions.queryparse import parse_query
        from uci_searchengine_spark.functions.tokenize import tokenize_py

        rng = random.Random(7)
        chars = 'ab "+-()|~*/:0'
        for _ in range(300):
            q = "".join(
                rng.choice(chars) for _ in range(rng.randint(0, 24))
            )
            a = parse_query(q, tokenize_py)
            b = parse_query(q, tokenize_py)
            assert (
                a.or_terms, a.must_terms, a.not_terms, a.phrases,
                a.slops(), a.groups,
            ) == (
                b.or_terms, b.must_terms, b.not_terms, b.phrases,
                b.slops(), b.groups,
            ), q
