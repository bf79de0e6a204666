"""search_after on the serving surface: cursor pages tile the oracle
ranking with no gaps or repeats, next_cursor round-trips through HTTP,
and tombstoned docs vanish from cursor pages (in-plan subtraction)."""

import json
import threading
import urllib.parse
import urllib.request

import pytest

QUERY = "stop0 arbak"


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
class TestSearchAfterServing:
    def test_cursor_pages_tile_ranking(
        self, spark, index_small, oracle_small
    ):
        from uci_searchengine_spark.operators.serving import Searcher

        full = oracle_small.top_k(QUERY, 10**9)
        s = Searcher(spark, index_small, query_cache=0)
        got_urls = []
        after = None
        pages = 0
        while True:
            env = s.search_after_envelope(QUERY, after, per_page=50)
            got_urls.extend(r["doc_id"] for r in env["results"])
            pages += 1
            if env["next_cursor"] is None:
                break
            after = (
                float(env["next_cursor"][0]),
                int(env["next_cursor"][1]),
            )
            assert pages < 200  # safety
        assert got_urls == [d for d, _ in full]

    def test_http_cursor_roundtrip(self, spark, index_small, http_server):
        base, _ = http_server
        q = urllib.parse.quote(QUERY)
        code, p1 = _get(base, f"/api/search?query={q}&per_page=5")
        assert code == 200 and len(p1["results"]) == 5
        # drive page 2 via the cursor: it must equal rows 5..9 of a
        # 10-row first page
        code, wide = _get(base, f"/api/search?query={q}&per_page=10")
        s0, d0 = None, None
        from uci_searchengine_spark.operators.serving import Searcher

        env1 = Searcher(spark, index_small, query_cache=0).search_after_envelope(
            QUERY, None, per_page=5
        )
        cur = env1["next_cursor"]
        code, p2 = _get(
            base,
            f"/api/search?query={q}&per_page=5&search_after={cur[0]},{cur[1]}",
        )
        assert code == 200
        assert [r["url"] for r in p2["results"]] == [
            r["url"] for r in wide["results"][5:10]
        ]
        assert p2["search_after"] == [cur[0], cur[1]]

    def test_http_cursor_param_validation(self, http_server):
        import urllib.error

        base, _ = http_server

        def err(path):
            try:
                with urllib.request.urlopen(base + path) as r:
                    return r.status
            except urllib.error.HTTPError as e:
                return e.code

        q = urllib.parse.quote(QUERY)
        assert err(f"/api/search?query={q}&search_after=junk") == 422
        assert (
            err(f"/api/search?query={q}&page=2&search_after=1.0,5") == 422
        )

    def test_cursor_skips_tombstones(self, spark, index_small, oracle_small):
        import shutil

        from uci_searchengine_spark.operators.serving import Searcher
        from uci_searchengine_spark.operators.tombstones import delete_docs

        full = oracle_small.top_k(QUERY, 20)
        d = index_small + "_satomb"
        shutil.rmtree(d, ignore_errors=True)
        shutil.copytree(index_small, d)
        dead = full[3][0]
        delete_docs(d, [dead])
        s = Searcher(spark, d, query_cache=0)
        env = s.search_after_envelope(QUERY, None, per_page=10)
        got = [r["doc_id"] for r in env["results"]]
        exp = [doc for doc, _ in full if doc != dead][:10]
        assert got == exp
        shutil.rmtree(d, ignore_errors=True)
