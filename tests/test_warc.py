"""WARC source: byte-level parser cases + Spark read round-trip +
end-to-end into the extractor."""

import gzip

import pytest

from uci_searchengine_spark.sources.warc import (
    parse_warc_bytes,
    write_warc,
)

PAGES = [
    (
        "https://a.com/1",
        "2026-08-01T00:00:00Z",
        b"<html><title>One</title><body>first page</body></html>",
    ),
    (
        "https://b.com/2",
        "2026-08-02T12:30:00Z",
        b"<html><body>second</body></html>",
    ),
]


class TestParser:
    def test_roundtrip_plain_and_gz(self, tmp_path):
        for name in ("t.warc", "t.warc.gz"):
            p = str(tmp_path / name)
            assert write_warc(PAGES, p) == 2
            raw = open(p, "rb").read()
            got = list(parse_warc_bytes(raw))
            assert got == PAGES

    def test_non_response_records_skipped(self):
        rec = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n"
            b"\r\nhello\r\n\r\n"
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://x.com/\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: 31\r\n"
            b"\r\nHTTP/1.1 200 OK\r\nH: v\r\n\r\n<html>\r\n\r\n"
        )
        got = list(parse_warc_bytes(rec))
        assert got == [("https://x.com/", "2026-01-01T00:00:00Z", b"<html>")]

    def test_binary_body_with_embedded_separators(self, tmp_path):
        body = b"<html>" + b"\r\n\r\n" + b"WARC/1.0 fake" + b"</html>"
        p = str(tmp_path / "x.warc")
        write_warc([("https://c.com/", "2026-01-01T00:00:00Z", body)], p)
        got = list(parse_warc_bytes(open(p, "rb").read()))
        # Content-Length framing must survive separator bytes in the body
        assert got[0][2] == body

    def test_truncated_header_stops_cleanly(self):
        assert list(parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: resp")) == []

    def test_gzip_autodetect(self):
        raw_plain = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://z.com/\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: 6\r\n"
            b"\r\n<html>\r\n\r\n"
        )
        assert list(parse_warc_bytes(gzip.compress(raw_plain))) == list(
            parse_warc_bytes(raw_plain)
        )


@pytest.mark.spark
class TestReadWarc:
    def test_spark_read_shape_and_values(self, spark, tmp_path):
        from uci_searchengine_spark.sources.warc import read_warc

        d = tmp_path / "segs"
        d.mkdir()
        write_warc(PAGES[:1], str(d / "seg-00000.warc.gz"))
        write_warc(PAGES[1:], str(d / "seg-00001.warc.gz"))
        df = read_warc(spark, str(d)).orderBy("url")
        assert df.columns == ["url", "warc_ts", "html", "warc_path"]
        rows = df.collect()
        assert [r["url"] for r in rows] == [u for u, _t, _b in PAGES]
        assert [bytes(r["html"]) for r in rows] == [b for _u, _t, b in PAGES]
        assert rows[0]["warc_ts"].year == 2026
        # one file per input row pre-parse: per-file task parallelism
        assert {r["warc_path"].rsplit("/", 1)[-1] for r in rows} == {
            "seg-00000.warc.gz",
            "seg-00001.warc.gz",
        }

    def test_feeds_the_extractor(self, spark, tmp_path):
        from uci_searchengine_spark.functions.extract import extract_pages
        from uci_searchengine_spark.sources.warc import read_warc

        p = str(tmp_path / "one.warc.gz")
        write_warc(PAGES, p)
        pages = read_warc(spark, p)
        ex = extract_pages(pages).orderBy("url").collect()
        assert ex[0]["title"] == "One"
        assert "first page" in ex[0]["extracted_text"]

    def test_warc_to_index_to_search(self, spark, tmp_path):
        from uci_searchengine_spark.operators.bm25 import search
        from uci_searchengine_spark.operators.index_build import build_index
        from uci_searchengine_spark.sources.warc import read_warc

        p = str(tmp_path / "seg.warc.gz")
        write_warc(PAGES, p)
        idx = str(tmp_path / "idx")
        build_index(
            spark,
            read_warc(spark, p).drop("warc_path"),
            idx,
            num_shards=2,
            n_buckets=1,
            input_snapshot=f"warc:{p}",
        )
        # note: the pinned extractor concatenates adjacent text nodes
        # ("Onefirst page"), so query a token with whitespace around it
        env = search(spark, idx, "page")
        assert env["total_results"] == 1
        assert env["results"][0]["url"] == "https://a.com/1"
        env2 = search(spark, idx, "second")
        assert env2["total_results"] == 1
        assert env2["results"][0]["url"] == "https://b.com/2"
