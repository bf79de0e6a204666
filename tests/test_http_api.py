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

    def test_wildcard_query_over_http(self, spark, index_small, http_server):
        from uci_searchengine_spark.operators.serving import Searcher

        base, _ = http_server
        code, got = _get(base, "/api/search?query=stop0%20arb*&per_page=5")
        assert code == 200
        assert got["total_results"] > 0
        exp = Searcher(spark, index_small).search("stop0 arb*", per_page=5)
        assert got == json.loads(json.dumps(exp))

    def test_site_filter_over_http(self, spark, index_small, http_server):
        import urllib.parse

        from uci_searchengine_spark.operators.serving import Searcher

        base, _ = http_server
        exp_any = Searcher(spark, index_small).search("stop0")
        host = urllib.parse.urlparse(exp_any["results"][0]["url"]).netloc
        q = urllib.parse.quote(f"stop0 site:{host}")
        code, got = _get(base, f"/api/search?query={q}&per_page=5")
        assert code == 200
        assert 0 < got["total_results"] <= exp_any["total_results"]
        assert all(
            urllib.parse.urlparse(r["url"]).netloc == host
            for r in got["results"]
        )

    def test_similar_route(self, spark, index_small, http_server):
        from uci_searchengine_spark.operators.serving import Searcher

        base, _ = http_server
        code, got = _get(base, "/api/similar?doc_id=42&k=5")
        assert code == 200
        exp = Searcher(spark, index_small).similar(42, k=5)
        assert got == json.loads(json.dumps(exp))
        code, err = _get_err(base, "/api/similar")
        assert code == 422
        code, err = _get_err(base, "/api/similar?doc_id=notanint")
        assert code == 422

    def test_terms_enum_route(self, spark, index_small, oracle_small, http_server):
        base, _ = http_server
        code, got = _get(base, "/api/terms?prefix=arb&k=5")
        assert code == 200 and got["prefix"] == "arb"
        vocab = {t: len(p) for t, p in oracle_small.postings.items()}
        want = sorted(
            ((t, d) for t, d in vocab.items() if t.startswith("arb")),
            key=lambda kv: (-kv[1], kv[0]),
        )[:5]
        assert [(r["term"], r["df"]) for r in got["terms"]] == want
        code, _err = _get_err(base, "/api/terms?k=0")
        assert code == 422

    def test_explain_route(self, spark, index_small, http_server):
        from uci_searchengine_spark.operators.serving import Searcher

        base, _ = http_server
        env = Searcher(spark, index_small).search("stop0")
        # take a real hit's doc id via similar route shape: explain top hit
        code, got = _get(base, "/api/explain?query=stop0&doc_id=0")
        assert code == 200
        exp = Searcher(spark, index_small).explain("stop0", 0)
        assert got == json.loads(json.dumps(exp))
        code, _err = _get_err(base, "/api/explain?query=stop0")
        assert code == 422

    def test_advanced_wildcard_boolean_over_http(self, spark, index_small, http_server):
        from uci_searchengine_spark.operators.serving import Searcher

        base, _ = http_server
        q = urllib.parse.quote("arb* +stop0")
        code, got = _get(base, f"/api/advanced?query={q}&mode=boolean&k=5")
        assert code == 200
        exp = Searcher(spark, index_small).boolean_envelope("arb* +stop0", k=5)
        assert got == json.loads(json.dumps(exp))
        assert len(got["results"]) == 5

    def test_health_observability(self, http_server):
        base, _ = http_server
        code, got = _get(base, "/api/health")
        assert code == 200 and got["ok"] is True
        assert got["n_docs"] > 0 and got["generations"] >= 1
        assert "query_cache_hits" in got

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


@pytest.fixture(scope="module")
def registry_server(spark, index_small, tmp_path_factory):
    """Two registered index versions behind /api/databases routes."""
    import os
    import shutil

    from uci_searchengine_spark.http_api import make_server
    from uci_searchengine_spark.operators.index_build import build_index
    from uci_searchengine_spark.registry import IndexRegistry
    from uci_searchengine_spark.sources.synth import synth_pages

    root = str(tmp_path_factory.mktemp("reg"))
    reg = IndexRegistry(root, default="main")
    reg.add("main", index_small)
    alt_src = os.path.join(root, "_alt_build")
    pages = spark.createDataFrame(
        [("https://alt.example/one", None,
          bytearray(b"<html><head><title>alt</title></head>\n<body>zzzaltonly text</body></html>"),
          "zzzaltonly text", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    build_index(spark, pages, alt_src, num_shards=2, n_buckets=1,
                input_snapshot="alt")
    reg.add("alt", alt_src, move=True)
    srv = make_server(spark, None, port=0, registry=reg)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, reg
    srv.shutdown()


def _post(base, path, payload):
    import urllib.error

    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _delete(base, path, key=None):
    import urllib.error

    headers = {"X-Secret-Key": key} if key else {}
    req = urllib.request.Request(base + path, headers=headers, method="DELETE")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.mark.spark
class TestAliasesHttp:
    """Runs BEFORE TestIndexManagement (definition order): leaves the
    registry exactly as it found it (current=main, no aliases)."""

    def test_alias_lifecycle(self, registry_server):
        from uci_searchengine_spark.http_api import SECRET_KEY

        base, reg = registry_server
        # auth + validation
        assert _post(base, "/api/databases/aliases",
                     {"alias": "serving", "db_name": "main",
                      "secret_key": "wrong"})[0] == 401
        assert _post(base, "/api/databases/aliases",
                     {"alias": "serving", "secret_key": SECRET_KEY})[0] == 422
        assert _post(base, "/api/databases/aliases",
                     {"alias": "serving", "db_name": "nope",
                      "secret_key": SECRET_KEY})[0] == 404
        assert _post(base, "/api/databases/aliases",
                     {"alias": "alt", "db_name": "main",
                      "secret_key": SECRET_KEY})[0] == 400  # shadows
        # create + list
        code, _ = _post(base, "/api/databases/aliases",
                        {"alias": "serving", "db_name": "alt",
                         "secret_key": SECRET_KEY})
        assert code == 200
        assert _get(base, "/api/databases")[1]["aliases"] == {
            "serving": "alt"
        }
        # switch BY alias serves the aliased corpus
        code, msg = _post(base, "/api/databases/switch",
                          {"db_name": "serving", "secret_key": SECRET_KEY})
        assert code == 200
        env = _get(base, "/api/search?query=zzzaltonly")[1]
        assert env["total_results"] == 1
        assert _get(base, "/api/databases")[1]["current"] == "alt"
        # aliased version cannot be deleted (repoint/drop first)
        _post(base, "/api/databases/switch",
              {"db_name": "main", "secret_key": SECRET_KEY})
        assert _delete(base, "/api/databases/alt", SECRET_KEY)[0] == 400
        # alias delete: auth, 404, then success restores clean state
        assert _delete(base, "/api/databases/aliases/serving")[0] == 401
        assert _delete(base, "/api/databases/aliases/nope",
                       SECRET_KEY)[0] == 404
        assert _delete(base, "/api/databases/aliases/serving",
                       SECRET_KEY)[0] == 200
        assert _get(base, "/api/databases")[1]["aliases"] == {}


@pytest.mark.spark
class TestIndexManagement:
    def test_list_switch_serves_new_index(self, registry_server):
        from uci_searchengine_spark.http_api import SECRET_KEY

        base, reg = registry_server
        code, got = _get(base, "/api/databases")
        assert code == 200 and got["current"] == "main"
        assert set(got["available"]) == {"alt", "main"}
        # main index doesn't know the alt corpus
        assert _get(base, "/api/search?query=zzzaltonly")[1]["total_results"] == 0
        # bad key → 401; unknown name → 404
        assert _post(base, "/api/databases/switch",
                     {"db_name": "alt", "secret_key": "wrong"})[0] == 401
        assert _post(base, "/api/databases/switch",
                     {"db_name": "nope", "secret_key": SECRET_KEY})[0] == 404
        code, msg = _post(base, "/api/databases/switch",
                          {"db_name": "alt", "secret_key": SECRET_KEY})
        assert code == 200 and "alt" in msg["message"]
        # hot-swapped searcher serves the other corpus now
        env = _get(base, "/api/search?query=zzzaltonly")[1]
        assert env["total_results"] == 1
        assert _get(base, "/api/databases")[1]["current"] == "alt"
        # switch back for the delete test
        _post(base, "/api/databases/switch",
              {"db_name": "main", "secret_key": SECRET_KEY})

    def test_delete_protections(self, registry_server):
        from uci_searchengine_spark.http_api import SECRET_KEY

        base, reg = registry_server
        assert _delete(base, "/api/databases/alt")[0] == 401
        assert _delete(base, "/api/databases/nope", SECRET_KEY)[0] == 404
        # current + default protected
        assert _delete(base, "/api/databases/main", SECRET_KEY)[0] == 400
        code, msg = _delete(base, "/api/databases/alt", SECRET_KEY)
        assert code == 200
        assert _get(base, "/api/databases")[1]["available"] == ["main"]


@pytest.mark.spark
class TestAdvancedRoute:
    def test_boolean_envelope_parity(self, spark, index_small, http_server):
        """HTTP boolean results == boolean_results (doc-attached gate
        surface): same url/title/snippet/score in the same order."""
        from uci_searchengine_spark.operators.boolean import boolean_results

        base, _ = http_server
        q = 'stop0 +arbak -stop9'
        code, got = _get(
            base, "/api/advanced?query=" + q.replace(" ", "%20").replace("+", "%2B")
        )
        assert code == 200 and got["mode"] == "boolean"
        exp = [
            {"url": r["url"], "title": r["title"], "snippet": r["snippet"],
             "score": r["score"]}
            for r in boolean_results(spark, index_small, q, 10).collect()
        ]
        assert json.loads(json.dumps(got["results"])) == json.loads(
            json.dumps(exp)
        )

    def test_phrase_envelope_parity(self, spark, index_small, http_server):
        from uci_searchengine_spark.operators.phrase import phrase_results

        base, _ = http_server
        code, got = _get(
            base, "/api/advanced?query=arbak%20stop1&mode=phrase&k=5"
        )
        assert code == 200 and got["mode"] == "phrase"
        exp = [
            {"url": r["url"], "title": r["title"], "snippet": r["snippet"],
             "score": r["score"]}
            for r in phrase_results(spark, index_small, "arbak stop1", 5).collect()
        ]
        got_stripped = [
            {kk: v for kk, v in r.items() if kk != "n_occ"}
            for r in got["results"]
        ]
        assert json.loads(json.dumps(got_stripped)) == json.loads(
            json.dumps(exp)
        )
        assert all(r["n_occ"] >= 1 for r in got["results"])

    def test_analyze_route(self, http_server):
        base, _ = http_server
        code, got = _get(base, "/api/analyze?text=Hello%2C%20World-2!")
        assert code == 200
        assert got["stem"] is False
        assert [t["token"] for t in got["tokens"]] == ["hello", "world", "2"]
        assert [t["position"] for t in got["tokens"]] == [0, 1, 2]
        code, _err = _get_err(base, "/api/analyze")
        assert code == 422

    def test_advanced_fields_over_http(self, spark, index_small, http_server):
        from uci_searchengine_spark.operators.serving import Searcher

        base, _ = http_server
        code, got = _get(
            base,
            "/api/advanced?query=page%20arban&mode=fields&k=5"
            "&w_title=3&variant=most_fields",
        )
        assert code == 200
        exp = Searcher(spark, index_small).fields_envelope(
            "page arban", k=5, w_title=3.0, variant="most_fields"
        )
        assert got == json.loads(json.dumps(exp))
        assert got["weights"] == {"title": 3.0, "text": 1.0}
        assert got["results"]

    def test_advanced_dismax_over_http(self, spark, index_small, http_server):
        from uci_searchengine_spark.operators.serving import Searcher

        base, _ = http_server
        code, got = _get(
            base,
            "/api/advanced?query=page%20arban&mode=fields&k=5"
            "&variant=dis_max&tie_breaker=0.3",
        )
        assert code == 200
        exp = Searcher(spark, index_small).fields_envelope(
            "page arban", k=5, variant="dis_max", tie_breaker=0.3
        )
        assert got == json.loads(json.dumps(exp))
        assert got["variant"] == "dis_max"
        assert got["tie_breaker"] == 0.3
        assert got["results"]

    def test_advanced_validation(self, http_server):
        base, _ = http_server
        for p in (
            "/api/advanced",                       # missing query
            "/api/advanced?query=x&mode=regex",    # bad mode
            "/api/advanced?query=x&k=0",
            "/api/advanced?query=x&k=51",
            "/api/advanced?query=x&mode=fields&variant=nope",
            "/api/advanced?query=x&mode=fields&w_title=abc",
            "/api/advanced?query=x&mode=fields&w_title=-1",
            "/api/advanced?query=x&mode=fields&variant=dis_max"
            "&tie_breaker=1.5",
            "/api/advanced?query=x&mode=fields&tie_breaker=abc",
        ):
            code, body = _get_err(base, p)
            assert code == 422, p
            assert "detail" in body


@pytest.mark.spark
class TestLogsRoute:
    def test_logs_tail_and_cursor(self, http_server):
        """Manifest-commit tail (reference WS payload shape): first poll
        returns the build's events, polling with the returned cursor
        returns nothing new."""
        base, _ = http_server
        code, got = _get(base, "/api/crawler/logs")
        assert code == 200
        assert got["cursor"] > 0
        assert got["events"], "a built index must have manifest events"
        for e in got["events"]:
            assert set(e) == {"message", "timestamp"}
            assert "committed" in e["message"]
        code, again = _get(base, f"/api/crawler/logs?cursor={got['cursor']}")
        assert code == 200
        assert again["events"] == []
        assert again["cursor"] == got["cursor"]


@pytest.mark.spark
class TestHttpRangeQuery:
    def test_range_filter_over_http(self, spark, index_small, tmp_path_factory):
        import shutil
        import threading
        import urllib.parse

        from uci_searchengine_spark.http_api import make_server
        from uci_searchengine_spark.operators.docvalues import (
            attach_doc_values,
        )
        from uci_searchengine_spark.operators.index_build import IndexMeta
        from uci_searchengine_spark.operators.serving import Searcher

        d = str(tmp_path_factory.mktemp("http_range") / "idx")
        shutil.copytree(index_small, d)
        n = IndexMeta.load(d).n_docs
        attach_doc_values(
            spark,
            d,
            spark.range(n).selectExpr(
                "id AS doc_id",
                "((id * 37) % 101) / cast(101 AS DOUBLE) AS value",
            ),
            "rank",
        )
        srv = make_server(spark, d, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            q = urllib.parse.quote("stop0 rank:[0.2 TO 0.6]")
            code, got = _get(base, f"/api/search?query={q}&per_page=5")
            assert code == 200
            exp = Searcher(spark, d).search(
                "stop0 rank:[0.2 TO 0.6]", per_page=5
            )
            assert got == json.loads(json.dumps(exp))
            assert 0 < got["total_results"]

            # unknown plane -> clean 422, not a 500
            q2 = urllib.parse.quote("stop0 nosuch:[1 TO 2]")
            code2, err = _get_err(base, f"/api/search?query={q2}")
            assert code2 == 422 and "detail" in err
        finally:
            srv.shutdown()
