"""Crawl ingestion e2e against REAL local HTTP servers: BFS frontier,
robots gating, 404 handling, per-domain pacing, resume, and
crawl → build_index → search."""

import http.server
import threading
import time

import pytest


class _Site(http.server.BaseHTTPRequestHandler):
    pages: dict[str, bytes] = {}
    log: list[tuple[float, str]] = []

    def log_message(self, *a):
        pass

    def do_GET(self):  # noqa: N802
        type(self).log.append((time.monotonic(), self.path))
        body = type(self).pages.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def _serve(pages: dict[str, bytes]):
    handler = type("H", (_Site,), {"pages": pages, "log": []})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, handler


@pytest.fixture(scope="module")
def site():
    """Two 'domains' (distinct ports): A has a robots.txt-gated area and
    a dead link; B is a remote page A links to."""
    b_srv, b_h = _serve({"/remote.html": b"<html><head><title>remote</title></head>\n<body>zzzremote word</body></html>"})
    b_base = f"http://127.0.0.1:{b_srv.server_address[1]}"
    a_pages = {
        "/robots.txt": b"User-agent: *\nDisallow: /private/\n",
        "/index.html": (
            "<html><head><title>home</title></head>\n<body>zzzhome start "
            '<a href="/a.html">a</a> <a href="/b.html">b</a> '
            '<a href="/private/secret.html">s</a> <a href="/missing.html">m</a> '
            f'<a href="{b_base}/remote.html">r</a></body></html>'
        ).encode(),
        "/a.html": b'<html><head><title>a</title></head>\n<body>zzzalpha text <a href="/index.html">back</a></body></html>',
        "/b.html": b"<html><head><title>b</title></head>\n<body>zzzbeta text</body></html>",
        "/private/secret.html": b"<html><body>zzzsecret never seen</body></html>",
    }
    a_srv, a_h = _serve(a_pages)
    a_base = f"http://127.0.0.1:{a_srv.server_address[1]}"
    yield a_base, a_h, b_base, b_h
    a_srv.shutdown()
    b_srv.shutdown()


def test_rate_limiter_unit():
    """min-interval pacing (rate_limiter.py:37-49 semantics), fake clock."""
    from uci_searchengine_spark.crawler import DomainRateLimiter

    t = [0.0]
    slept = []

    def clock():
        return t[0]

    def sleep(s):
        slept.append(round(s, 6))
        t[0] += s

    lim = DomainRateLimiter(2.0, clock=clock, sleep=sleep)  # 0.5s interval
    lim.wait("a")            # first request: no sleep
    lim.wait("a")            # immediate: sleeps 0.5
    t[0] += 0.2
    lim.wait("a")            # 0.2 elapsed: sleeps 0.3
    lim.wait("b")            # other domain: independent, no sleep
    assert slept == [0.5, 0.3]


@pytest.mark.spark
@pytest.mark.slow
class TestCrawlE2E:
    def test_crawl_discovers_gates_and_builds(self, spark, site, tmp_path):
        from uci_searchengine_spark.crawler import crawl
        from uci_searchengine_spark.operators.bm25 import search
        from uci_searchengine_spark.operators.index_build import build_index

        a_base, a_h, b_base, b_h = site
        out = str(tmp_path / "crawl")
        st = crawl(
            spark,
            [f"{a_base}/index.html"],
            out,
            max_rounds=4,
            requests_per_second=100.0,
            fetch_partitions=4,
        )
        stats = st.statistics()
        # ok: index, a, b, remote; failed: missing(404) + robots-blocked
        assert stats["urls_crawled"] == 4, stats
        assert stats["urls_failed"] == 2, stats
        assert stats["urls_in_queue"] == 0
        # the robots-disallowed page was NEVER requested
        assert all("/private/" not in path for _, path in a_h.log)
        # both domains fetched
        assert any(p == "/remote.html" for _, p in b_h.log)

        pages = spark.read.parquet(st.pages_dir)
        assert pages.count() == 4
        idx = str(tmp_path / "idx")
        build_index(spark, pages, idx, num_shards=4, n_buckets=2,
                    input_snapshot="crawl-e2e")
        env = search(spark, idx, "zzzremote")
        assert env["total_results"] == 1
        assert env["results"][0]["url"].endswith("/remote.html")
        env2 = search(spark, idx, "zzzsecret")
        assert env2["total_results"] == 0

        # resume: frontier is drained — rerun fetches NOTHING new
        n_req = len(a_h.log) + len(b_h.log)
        crawl(spark, [f"{a_base}/index.html"], out, max_rounds=6,
              requests_per_second=100.0, fetch_partitions=4)
        assert len(a_h.log) + len(b_h.log) == n_req

    def test_incremental_crawl_to_index(self, spark, site, tmp_path):
        """The crawl-to-query pipeline, incrementally: each crawl round's
        delta (hive round=N dir) is appended as an index generation;
        the final index answers queries exactly like a one-shot build
        over the full crawl."""
        from uci_searchengine_spark.crawler import crawl
        from uci_searchengine_spark.operators.index_append import append_index
        from uci_searchengine_spark.operators.index_build import build_index
        from uci_searchengine_spark.operators.wand import score_wand

        a_base, _, _, _ = site
        out = str(tmp_path / "crawl_inc")
        st = crawl(spark, [f"{a_base}/index.html"], out, max_rounds=4,
                   requests_per_second=100.0, fetch_partitions=4)
        rounds = [m["round"] for m in st.round_manifests() if m["fetched_ok"]]
        assert len(rounds) >= 2  # BFS produced at least two delta rounds

        inc = str(tmp_path / "idx_inc")
        for i, rnd in enumerate(rounds):
            delta = spark.read.parquet(st.round_pages_dir(rnd))
            if i == 0:
                build_index(spark, delta, inc, num_shards=4, n_buckets=2,
                            input_snapshot=f"round{rnd}")
            else:
                append_index(spark, delta, inc, input_snapshot=f"round{rnd}")

        full = str(tmp_path / "idx_full")
        build_index(spark, spark.read.parquet(st.pages_dir)
                    .select("url", "warc_ts", "html", "text", "lang"),
                    full, num_shards=4, n_buckets=2, input_snapshot="full")

        from uci_searchengine_spark.operators.index_build import load_docs

        def by_url(idx, q):
            id2url = {r["doc_id"]: r["url"]
                      for r in load_docs(spark, idx).select("doc_id", "url").collect()}
            return sorted(
                (id2url[r["doc_id"]], round(r["score"], 9))
                for r in score_wand(spark, idx, q, 10).collect()
            )

        for q in ("zzzremote", "zzzalpha text", "text"):
            assert by_url(inc, q) == by_url(full, q), q

    def test_crawl_output_feeds_streaming_ingest(self, spark, site, tmp_path):
        """The live pipeline end: readStream over the crawl's pages table
        (round=N dirs are discovered as they land) drives the incremental
        postings ingest — streamed postings equal the batch dataflow's."""
        from uci_searchengine_spark.crawler import crawl
        from uci_searchengine_spark.streaming.ingest import (
            incremental_postings,
            stream_pages,
        )

        a_base, _, _, _ = site
        out = str(tmp_path / "crawl_stream")
        st = crawl(spark, [f"{a_base}/index.html"], out, max_rounds=4,
                   requests_per_second=100.0, fetch_partitions=4)
        pages_glob = st.pages_dir + "/round=*"
        q = incremental_postings(
            stream_pages(spark, pages_glob, max_files=2),
            str(tmp_path / "flat"), str(tmp_path / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()
        streamed = spark.read.parquet(str(tmp_path / "flat"))
        batch_pages = spark.read.parquet(st.pages_dir).select(
            "url", "warc_ts", "html", "text", "lang"
        )
        from uci_searchengine_spark.streaming.ingest import _batch_postings

        expected = _batch_postings(batch_pages)
        got = {(r["doc_id"], r["term"], r["tf"]) for r in streamed.collect()}
        exp = {(r["doc_id"], r["term"], r["tf"]) for r in expected.collect()}
        assert got == exp and len(got) > 0
