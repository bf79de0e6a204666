"""HTML → (title, text, links) extraction as a vectorized Arrow UDF.

Pinned semantics (FIXTURES.md §4, transcribed from the reference):

* text: `_extract_text_content` (backend/app/api/crawler.py:412-418) —
  drop <script>/<style> subtrees, concatenate remaining text nodes in
  document order (bs4 ``get_text()`` with the stdlib ``html.parser``
  backend, crawler.py:200), then per line: strip, split on two spaces,
  strip each chunk, join non-empty chunks with a single space.
* title: first <title> string, fallback to the page url when absent/empty
  (crawler.py:201).
* links: every <a href=...>, skipping href starting with '#' or 'mailto:',
  resolved with ``urljoin`` against the page url (crawler.py:241-247) and
  normalized per `_normalize_url` (crawler.py:384-397).

bs4 itself is not available in this environment; the parse is implemented
directly on stdlib ``html.parser.HTMLParser`` — the exact backend the
reference pins — reproducing ``get_text()``'s document-order text-node
concatenation (entities decoded, comments/doctype excluded, script/style
raw data skipped). The single-node oracle (oracle/oracle.py) shares this
parser, and tests assert byte-identity between the Spark UDF output and
the oracle per url.

The UDF boundary is Arrow-batched (``pandas_udf``): per-row parsing happens
inside the batch (HTML parsing is irreducibly per-document), amortized over
Arrow transfer — the sanctioned boundary per BASELINE.json north_star.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from uci_searchengine_spark.schema import EXTRACT_SCHEMA

_SKIP_TAGS = frozenset(("script", "style"))
# void elements never get end tags; track only for title-nesting detection
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _TextParser(HTMLParser):
    """Document-order text/title/link collector matching bs4 get_text()."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pieces: list[str] = []
        self.hrefs: list[str] = []
        # anchor text per href (same order as hrefs); captured additively
        # without touching the pinned text/title/links semantics above
        self.anchor_pieces: list[list[str]] = []
        self._open_anchor: list[str] | None = None
        self._skip_depth = 0
        self._in_title = False
        self._title_done = False
        self._title_pieces: list[str] = []
        self._title_has_child_tag = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "title" and not self._title_done:
            self._in_title = True
            return
        if self._in_title and tag not in _VOID:
            # <title>a<b>c</b></title> → soup.title.string is None
            self._title_has_child_tag = True
        if tag == "a":
            # a new <a> auto-closes a still-open one (browser behavior)
            self._open_anchor = None
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    self._open_anchor = []
                    self.anchor_pieces.append(self._open_anchor)
                    break

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
            return
        if tag == "a":
            self._open_anchor = None
        if tag == "title" and self._in_title:
            self._in_title = False
            self._title_done = True

    def handle_data(self, data):
        if self._skip_depth:
            return
        self.pieces.append(data)
        if self._open_anchor is not None:
            self._open_anchor.append(data)
        if self._in_title:
            self._title_pieces.append(data)

    @property
    def title(self) -> str | None:
        if not self._title_done or self._title_has_child_tag:
            return None
        t = "".join(self._title_pieces)
        return t if t else None


def _clean_text(raw: str) -> str:
    # crawler.py:415-418 verbatim semantics
    lines = (line.strip() for line in raw.splitlines())
    chunks = (phrase.strip() for line in lines for phrase in line.split("  "))
    return " ".join(chunk for chunk in chunks if chunk)


def normalize_url(url: str) -> str:
    """URL normalization per crawler.py:384-397.

    scheme://netloc/path, trailing '/' stripped, lowercased; query string
    kept only for .php/.aspx/.jsp paths or queries containing one of
    id/article/page/p (substring match, as in the reference).
    """
    parsed = urlparse(url)
    normalized = f"{parsed.scheme}://{parsed.netloc}{parsed.path}".rstrip("/").lower()
    if parsed.query and (
        any(parsed.path.endswith(ext) for ext in (".php", ".aspx", ".jsp"))
        or any(param in parsed.query for param in ("id", "article", "page", "p"))
    ):
        normalized += f"?{parsed.query}"
    return normalized


def extract_one(html: bytes, url: str) -> tuple[str, str, list[str]]:
    """Parse one document. Returns (title, text, normalized_links)."""
    p = _TextParser()
    p.feed(html.decode("utf-8", errors="replace"))
    p.close()
    text = _clean_text("".join(p.pieces))
    title = p.title if p.title is not None else url
    links = [
        normalize_url(urljoin(url, h))
        for h in p.hrefs
        if not (h.startswith("#") or h.startswith("mailto:"))
    ]
    return title, text, links


def extract_anchors_one(html: bytes, url: str) -> list[tuple[str, str]]:
    """Parse one document into (normalized_href, anchor_text) pairs —
    the link-with-anchor variant of ``extract_one``. Same skip rules
    ('#'/'mailto:'), same urljoin + normalize_url; anchor text is the
    <a> element's document-order text run through the pinned
    ``_clean_text`` whitespace rule. Pairs keep multiplicity (the same
    target linked twice with different anchors is two signals)."""
    p = _TextParser()
    p.feed(html.decode("utf-8", errors="replace"))
    p.close()
    return [
        (normalize_url(urljoin(url, h)), _clean_text("".join(pieces)))
        for h, pieces in zip(p.hrefs, p.anchor_pieces)
        if not (h.startswith("#") or h.startswith("mailto:"))
    ]


_ANCHORS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("href", T.StringType()),
            T.StructField("anchor", T.StringType()),
        ]
    )
)


@pandas_udf(_ANCHORS_TYPE)
def extract_anchors(html: pd.Series, url: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_anchors_one(h, u) for h, u in zip(html, url)]
    )


@pandas_udf(EXTRACT_SCHEMA)
def extract_html(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    rows = [extract_one(h, u) for h, u in zip(html, url)]
    return pd.DataFrame(rows, columns=["title", "text", "links"])


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → + title/extracted_text/links."""
    ex = F.col("_ex")
    return (
        pages.withColumn("_ex", extract_html(F.col("html"), F.col("url")))
        .withColumn("title", ex["title"])
        .withColumn("extracted_text", ex["text"])
        .withColumn("links", ex["links"])
        .drop("_ex")
    )
