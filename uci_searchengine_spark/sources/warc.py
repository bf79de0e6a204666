"""WARC source: read Common-Crawl-style WARC(.gz) archives into the
engine's pages shape ``(url, warc_ts, html)``.

The reference ingests live HTTP only (crawler); real web-scale corpora
arrive as WARC — the ISO-28500 archive format Common Crawl publishes
(~1 GB gzipped ``*.warc.gz`` segment files). This reader turns a
directory/glob of them into the same DataFrame every downstream stage
(extract → index → train-prep) already consumes.

Spark-first shape and its honest constraint: gzip is NOT splittable,
so the unit of parallelism is the FILE — exactly why Common Crawl
ships ~1 GB segments (64 000 files per crawl): a 1000-executor cluster
maps one file per task with no shuffle at all. The read is
``binaryFile`` (whole file per row) → ``mapInPandas`` parsing WARC
records with stdlib gzip/bytes ops — Arrow-batched, one Python pass
per file, memory bounded by the segment size (the format's own
contract). Record filtering (``WARC-Type: response``) and the
HTTP-envelope strip happen inside the same pass, so only parsed pages
cross the Arrow boundary.

Parsing semantics (pinned by tests/test_warc.py round-trips):
* records delimited per ISO 28500: ``WARC/1.x`` header block,
  ``\\r\\n\\r\\n``, ``Content-Length`` payload bytes, ``\\r\\n\\r\\n``.
* only ``WARC-Type: response`` records yield rows; url =
  ``WARC-Target-URI``, warc_ts = ``WARC-Date`` (ISO-8601 → timestamp).
* the HTTP response envelope (status line + headers) is stripped at
  the first ``\\r\\n\\r\\n``; the remaining body bytes are the html
  column (bytes, not text — charset decoding belongs to the
  extractor, which already decodes utf-8/replace).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF2 = b"\r\n\r\n"


def parse_warc_bytes(raw: bytes) -> Iterator[tuple[str, str, bytes]]:
    """Yield (url, warc_date, body_bytes) for each response record of
    one WARC file's raw bytes (gzip auto-detected by magic number)."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record blank lines
        while raw.startswith(b"\r\n", pos):
            pos += 2
        if not raw.startswith(b"WARC/", pos):
            break
        hdr_end = raw.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break  # malformed: cannot locate the next record safely
        body = raw[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") == "response":
            url = headers.get("warc-target-uri", "")
            ts = headers.get("warc-date", "")
            # strip the HTTP envelope if present
            if body[:5] == b"HTTP/":
                split = body.find(_CRLF2)
                body = body[split + 4 :] if split >= 0 else b""
            if url:
                yield url, ts, body


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """path (file/dir/glob of .warc or .warc.gz) → DataFrame
    ``(url, warc_ts timestamp, html binary, warc_path string)``."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for url, ts, body in parse_warc_bytes(bytes(content)):
                    rows.append((url, ts, body, p))
            yield pd.DataFrame(
                rows, columns=["url", "_ts", "html", "warc_path"]
            )

    out = files.select("path", "content").mapInPandas(
        parse, "url string, _ts string, html binary, warc_path string"
    )
    return out.select(
        "url",
        F.to_timestamp("_ts").alias("warc_ts"),
        "html",
        "warc_path",
    )


def write_warc(pages: Iterable[tuple[str, str, bytes]], path: str) -> int:
    """Write (url, warc_date, html_body) tuples as one WARC(.gz) file —
    the test/export side of the round-trip (response records with a
    minimal HTTP/1.1 200 envelope). Returns the record count."""
    buf = io.BytesIO()
    n = 0
    for url, ts, body in pages:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(http)}"
        ).encode()
        buf.write(hdr + _CRLF2 + http + _CRLF2)
        n += 1
    data = buf.getvalue()
    if path.endswith(".gz"):
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
    return n
