"""Federated envelope + HTTP surface: the federated envelope over a
split corpus must equal the single-Searcher envelope over the whole
corpus (totals, per-page urls, scores — docIDs are url-rank dense so
the two tie-breaks coincide), and /api/search?dbs=a,b serves it with
member labels, 404 on unknown names, 422 on cursor mixing."""

import json
import threading
import urllib.request

import pytest
from pyspark.sql import functions as F

SEED = 7171
N = 160


def _get(base, path):
    import urllib.error

    try:
        with urllib.request.urlopen(base + path) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def fed_fixture(spark, tmp_path_factory):
    from uci_searchengine_spark.operators.index_build import build_index
    from uci_searchengine_spark.sources.synth import synth_pages

    corpus = synth_pages(spark, N, SEED, partitions=4)
    whole = str(tmp_path_factory.mktemp("fedh_whole"))
    build_index(
        spark, corpus, whole, num_shards=4, n_buckets=2,
        input_snapshot="fedh-whole",
    )
    urls = sorted(r["url"] for r in corpus.select("url").collect())
    cut = urls[70]
    dirs = []
    for i, part in enumerate(
        (corpus.filter(F.col("url") < cut), corpus.filter(F.col("url") >= cut))
    ):
        d = str(tmp_path_factory.mktemp(f"fedh_part{i}"))
        build_index(
            spark, part, d, num_shards=4, n_buckets=2,
            input_snapshot=f"fedh-part{i}",
        )
        dirs.append(d)
    return whole, dirs


@pytest.mark.spark
@pytest.mark.slow
class TestFederatedEnvelope:
    def test_envelope_equals_whole_index(self, spark, fed_fixture):
        from uci_searchengine_spark.operators.federate import (
            federated_envelope,
        )
        from uci_searchengine_spark.operators.serving import Searcher

        whole, dirs = fed_fixture
        s = Searcher(spark, whole)
        for q, page in (("stop0 arbak", 1), ("stop0 arbak", 2), ("stop1", 1)):
            want = s.search(q, page=page, per_page=5)
            got = federated_envelope(
                spark, dirs, q, page=page, per_page=5
            )
            assert got["total_results"] == want["total_results"]
            assert got["total_pages"] == want["total_pages"]
            assert [r["url"] for r in got["results"]] == [
                r["url"] for r in want["results"]
            ]
            for a, b in zip(got["results"], want["results"]):
                assert abs(a["score"] - b["score"]) < 1e-6
                assert a["index"] in ("0", "1")

    def test_zero_hits_did_you_mean(self, spark, fed_fixture):
        from uci_searchengine_spark.operators.federate import (
            federated_envelope,
        )

        _, dirs = fed_fixture
        got = federated_envelope(spark, dirs, "arbaq", per_page=5)
        assert got["total_results"] == 0 and got["results"] == []
        assert got["did_you_mean"]  # vocabulary neighbor exists

    def test_http_dbs_param(self, spark, fed_fixture, tmp_path_factory):
        from uci_searchengine_spark.http_api import make_server
        from uci_searchengine_spark.registry import IndexRegistry

        whole, dirs = fed_fixture
        root = str(tmp_path_factory.mktemp("fedh_reg"))
        reg = IndexRegistry(root, default="main")
        reg.add("main", dirs[0])
        reg.add("alt", dirs[1])
        srv = make_server(spark, None, port=0, registry=reg)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            code, env = _get(
                base, "/api/search?query=stop0+arbak&dbs=main,alt&per_page=5"
            )
            assert code == 200
            assert {r["index"] for r in env["results"]} <= {"main", "alt"}
            assert env["total_results"] > len(env["results"]) > 0

            # single-member federation == plain search on that member
            code, one = _get(
                base, "/api/search?query=stop0+arbak&dbs=main&per_page=5"
            )
            code2, plain = _get(
                base, "/api/search?query=stop0+arbak&per_page=5"
            )
            assert code == code2 == 200
            assert [r["url"] for r in one["results"]] == [
                r["url"] for r in plain["results"]
            ]
            assert one["total_results"] == plain["total_results"]

            code, _ = _get(base, "/api/search?query=x&dbs=nope")
            assert code == 404
            code, _ = _get(
                base, "/api/search?query=x&dbs=main&search_after=1.0,2"
            )
            assert code == 422
        finally:
            srv.shutdown()
