"""Count and term-vectors introspection surfaces (ES _count /
_termvectors analogs): Searcher methods vs the oracle, HTTP routes."""

import json
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
class TestCount:
    def test_count_equals_oracle(self, spark, index_small, oracle_small):
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, index_small, query_cache=0)
        for q in ("stop0 arbak", "zzznotaword", "arbak arb*"):
            got = s.count(q)
            if "*" in q:
                continue  # oracle below covers plain queries only
            assert got["count"] == len(oracle_small.score(q)), q

    def test_count_http(self, spark, index_small, oracle_small, http_server):
        base, _ = http_server
        q = urllib.parse.quote("stop0 arbak")
        code, got = _get(base, f"/api/count?query={q}")
        assert code == 200
        assert got["count"] == len(oracle_small.score("stop0 arbak"))
        assert got["mode"] == "or"


@pytest.mark.spark
class TestTermVectors:
    def test_vs_tokenizer(self, spark, index_small, oracle_small):
        from uci_searchengine_spark.functions.tokenize import tokenize_py
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, index_small, query_cache=0)
        doc_id = 3
        tv = s.term_vectors(doc_id)
        toks = tokenize_py(oracle_small.texts[doc_id])
        assert tv["found"] and tv["doc_len"] == len(toks)
        exp_tf: dict[str, int] = {}
        exp_pos: dict[str, list[int]] = {}
        for i, t in enumerate(toks):
            exp_tf[t] = exp_tf.get(t, 0) + 1
            exp_pos.setdefault(t, []).append(i)
        assert [r["term"] for r in tv["terms"]] == sorted(exp_tf)
        for r in tv["terms"]:
            assert r["tf"] == exp_tf[r["term"]]
            assert r["positions"] == exp_pos[r["term"]]
            # df == the oracle's posting-list length
            assert r["df"] == len(
                oracle_small.postings.get(r["term"], ())
            )

    def test_missing_doc_and_http(self, spark, index_small, http_server):
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, index_small, query_cache=0)
        assert s.term_vectors(10**9)["found"] is False
        base, _ = http_server
        code, got = _get(base, "/api/termvectors?doc_id=3")
        assert code == 200 and got["found"] and got["terms"]
        code, nop = _get(
            base, "/api/termvectors?doc_id=3&positions=false"
        )
        assert "positions" not in nop["terms"][0]
