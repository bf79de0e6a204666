"""HTTP crawl control + seed-URL + index import/export e2e against a
REAL local HTTP site (reference routes.py:133-240, 390-431, 117-130,
440-460): start(fresh) builds a brand-new registry version from the
live crawl, failed-urls lists the injected 404 with its error,
stop/continue validation mirrors the reference's 400s, and an index
round-trips through download → upload → switch → search."""

import http.server
import json
import threading
import time
import urllib.error
import urllib.request

import pytest


class _Site(http.server.BaseHTTPRequestHandler):
    pages: dict[str, bytes] = {}

    def log_message(self, *a):
        pass

    def do_GET(self):  # noqa: N802
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


@pytest.fixture(scope="module")
def site():
    pages = {
        "/robots.txt": b"User-agent: *\nAllow: /\n",
        "/index.html": (
            b"<html><head><title>home</title></head>\n<body>zzzcrawlhome "
            b'start <a href="/a.html">a</a> <a href="/dead.html">d</a>'
            b"</body></html>"
        ),
        "/a.html": (
            b"<html><head><title>a</title></head>\n"
            b"<body>zzzcrawlalpha text</body></html>"
        ),
    }
    handler = type("H", (_Site,), {"pages": pages})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@pytest.fixture(scope="module")
def ctl_server(spark, index_small, tmp_path_factory):
    """Registry-backed server (crawl control requires the registry)."""
    from uci_searchengine_spark.http_api import make_server
    from uci_searchengine_spark.registry import IndexRegistry

    root = str(tmp_path_factory.mktemp("ctlreg"))
    reg = IndexRegistry(root, default="main")
    reg.add("main", index_small)
    srv = make_server(spark, None, port=0, registry=reg)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, reg
    srv.shutdown()


def _get(base, path, key=None, raw=False):
    headers = {"X-Secret-Key": key} if key else {}
    req = urllib.request.Request(base + path, headers=headers)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, (r.read() if raw else json.loads(r.read()))
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(base, path, payload=None, data=None, key=None):
    headers = {"X-Secret-Key": key} if key else {}
    if data is None:
        data = json.dumps(payload or {}).encode()
        headers["Content-Type"] = "application/json"
    req = urllib.request.Request(base + path, data=data, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _wait_stopped(base, timeout=180):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        code, got = _get(base, "/api/crawler/status")
        assert code == 200
        if got["status"] == "stopped":
            return got
        time.sleep(1.0)
    raise AssertionError("crawler did not stop in time")


@pytest.mark.spark
@pytest.mark.slow
class TestHttpCrawlControl:
    def test_full_crawl_control_flow(self, spark, site, ctl_server):
        from uci_searchengine_spark.http_api import SECRET_KEY

        base, reg = ctl_server

        # --- seed-url management (routes.py:390-403)
        code, got = _get(base, "/api/seed-urls")
        assert code == 200 and got == {"seed_urls": []}
        code, _ = _post(base, "/api/seed-urls",
                        {"seed_urls": [f"{site}/index.html"],
                         "secret_key": "wrong"})
        assert code == 401
        code, _ = _post(base, "/api/seed-urls",
                        {"seed_urls": [f"{site}/index.html"],
                         "secret_key": SECRET_KEY})
        assert code == 200
        code, got = _get(base, "/api/seed-urls")
        assert got["seed_urls"] == [f"{site}/index.html"]

        # --- validation mirrors the reference's 400s
        code, got = _post(base, "/api/crawler/start?mode=bogus",
                          {"secret_key": SECRET_KEY})
        assert code == 400 and "Invalid mode" in got["detail"]
        code, got = _post(base, "/api/crawler/start?mode=continue",
                          {"secret_key": SECRET_KEY})
        assert code == 400 and "No previous crawler state" in got["detail"]
        code, got = _post(base, "/api/crawler/stop",
                          {"secret_key": SECRET_KEY})
        assert code == 400 and "not running" in got["detail"]
        code, _ = _post(base, "/api/crawler/start?mode=fresh",
                        {"secret_key": "nope"})
        assert code == 401

        # --- fresh crawl: seeds come from the persisted list
        code, got = _post(
            base, "/api/crawler/start?mode=fresh",
            {"secret_key": SECRET_KEY,
             "params": {"max_rounds": 3, "requests_per_second": 100,
                        "num_shards": 2}},
        )
        assert code == 200 and "fresh mode" in got["message"]
        # double-start while running (or immediately after) → 400 or ok
        status = _wait_stopped(base)
        assert "error" not in status, status
        stats = status["statistics"]
        assert stats["urls_crawled"] == 2  # index + a
        assert stats["urls_failed"] == 1  # dead.html
        assert stats["urls_in_queue"] == 0

        # fresh built a NEW version holding ONLY the crawl, and switched
        assert reg.current() == "crawl"
        code, got = _get(base, "/api/search?query=zzzcrawlhome")
        assert code == 200 and got["total_results"] == 1
        assert got["results"][0]["url"].endswith("/index.html")
        code, got = _get(base, "/api/search?query=zzzcrawlalpha")
        assert got["total_results"] == 1
        # the pre-existing main corpus is NOT in the fresh version
        code, got = _get(base, "/api/search?query=stop0")
        assert got["total_results"] == 0

        # --- failed-urls (routes.py:406-431)
        code, got = _get(base, "/api/crawler/failed-urls")
        assert code == 200
        urls = {f["url"]: f for f in got["failed_urls"]}
        assert f"{site}/dead.html" in urls
        f = urls[f"{site}/dead.html"]
        assert "404" in f["error"] and f["failed_at"]

        # --- continue with an exhausted frontier → reference's 400
        code, got = _post(base, "/api/crawler/start?mode=continue",
                          {"secret_key": SECRET_KEY})
        assert code == 400 and "No URLs found" in got["detail"]

        # --- recrawl: re-fetches everything, upserts into the SAME
        # version (old generations tombstoned) — doc count stable
        code, got = _post(
            base, "/api/crawler/start?mode=recrawl",
            {"secret_key": SECRET_KEY,
             "params": {"max_rounds": 3, "requests_per_second": 100,
                        "num_shards": 2}},
        )
        assert code == 200 and "recrawl mode" in got["message"]
        status = _wait_stopped(base)
        assert "error" not in status, status
        assert status["statistics"]["urls_crawled"] == 2
        code, got = _get(base, "/api/search?query=zzzcrawlhome")
        assert got["total_results"] == 1  # upsert, not duplicate

    def test_download_upload_roundtrip(self, ctl_server):
        from uci_searchengine_spark.http_api import SECRET_KEY

        base, reg = ctl_server
        # secret-key protections
        code, _ = _get(base, "/api/databases/main/download")
        assert code == 401
        code, _ = _get(base, "/api/databases/nope/download", key=SECRET_KEY)
        assert code == 404
        code, blob = _get(base, "/api/databases/main/download",
                          key=SECRET_KEY, raw=True)
        assert code == 200 and blob[:2] == b"\x1f\x8b"  # gzip magic

        code, _ = _post(base, "/api/databases/upload?name=copy", data=blob)
        assert code == 401
        code, got = _post(base, "/api/databases/upload?name=copy",
                          data=blob, key=SECRET_KEY)
        assert code == 200 and "copy" in got["message"]
        assert "copy" in reg.available()
        # name collision → 409
        code, _ = _post(base, "/api/databases/upload?name=copy",
                        data=blob, key=SECRET_KEY)
        assert code == 409
        # garbage payload → 400/500, not a registered index
        code, _ = _post(base, "/api/databases/upload?name=bad",
                        data=b"not a tarball", key=SECRET_KEY)
        assert code in (400, 500)
        assert "bad" not in reg.available()

        # the uploaded copy serves identically after a switch
        code, _ = _post(base, "/api/databases/switch",
                        {"db_name": "copy", "secret_key": SECRET_KEY})
        assert code == 200
        code, got = _get(base, "/api/search?query=stop0")
        assert code == 200 and got["total_results"] > 0
        # switch back for test isolation
        _post(base, "/api/databases/switch",
              {"db_name": reg.default, "secret_key": SECRET_KEY})
