"""HTTP serving surface: the /api routes serve exactly the resident
Searcher's envelope (reference shape, routes.py:378-387) plus the
status/statistics introspection shapes (routes.py:268-307)."""

import json
import threading
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


def _get_err(base, path):
    try:
        with urllib.request.urlopen(base + path) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.mark.spark
class TestHttpApi:
    def test_search_equals_searcher_envelope(self, spark, index_small, http_server):
        from uci_searchengine_spark.operators.serving import Searcher

        base, _ = http_server
        code, got = _get(base, "/api/search?query=stop0%20arbak&page=1&per_page=5")
        assert code == 200
        exp = Searcher(spark, index_small).search("stop0 arbak", page=1, per_page=5)
        # HTTP json == the exact envelope dict (float round-trip via json)
        assert got == json.loads(json.dumps(exp))

    def test_and_mode_and_pagination(self, spark, index_small, http_server):
        base, _ = http_server
        code, got = _get(base, "/api/search?query=stop0+arbak&mode=and&per_page=3&page=2")
        assert code == 200
        assert got["page"] == 2 and got["per_page"] == 3
        assert len(got["results"]) <= 3

    def test_zero_hits_did_you_mean(self, http_server):
        base, _ = http_server
        code, got = _get(base, "/api/search?query=arbak1")
        assert code == 200
        assert got["total_results"] == 0
        assert got["did_you_mean"] == "arbak"

    def test_validation_422(self, http_server):
        base, _ = http_server
        for p in (
            "/api/search",  # missing query
            "/api/search?query=x&page=0",
            "/api/search?query=x&per_page=51",
            "/api/search?query=x&page=abc",
            "/api/search?query=x&mode=xor",
            "/api/suggest",
        ):
            code, body = _get_err(base, p)
            assert code == 422, p
            assert "detail" in body

    def test_404(self, http_server):
        base, _ = http_server
        code, _ = _get_err(base, "/api/nope")
        assert code == 404

    def test_crawler_status_shape(self, http_server):
        base, _ = http_server
        code, got = _get(base, "/api/crawler/status")
        assert code == 200
        assert set(got) == {"status", "statistics"}
        st = got["statistics"]
        assert set(st) == {"urls_crawled", "urls_failed", "urls_in_queue"}
        assert st["urls_crawled"] > 0

    def test_crawler_statistics_shape(self, spark, index_small, http_server):
        from uci_searchengine_spark.operators.index_build import IndexMeta

        base, _ = http_server
        code, got = _get(base, "/api/crawler/statistics")
        assert code == 200
        assert set(got) == {"crawler_statistics", "database_statistics"}
        cs, ds = got["crawler_statistics"], got["database_statistics"]
        assert set(cs) == {
            "status", "urls_crawled", "urls_failed", "unique_domains",
            "urls_in_queue",
        }
        assert set(ds) == {"total_documents", "total_terms", "total_index_entries"}
        assert ds["total_documents"] == IndexMeta.load(index_small).n_docs
        assert ds["total_terms"] > 0 and ds["total_index_entries"] > 0
        assert cs["unique_domains"] > 0

    def test_suggest_route(self, http_server):
        base, _ = http_server
        code, got = _get(base, "/api/suggest?word=arbak1")
        assert code == 200
        assert got["suggestions"][0]["term"] == "arbak"

    def test_concurrent_requests(self, http_server):
        """Parallel clients serialize on the engine lock without error."""
        base, _ = http_server
        results = []

        def hit():
            results.append(_get(base, "/api/search?query=stop0")[0])

        ts = [threading.Thread(target=hit) for _ in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert results == [200] * 6
