import pandas as pd
import pytest

from uci_searchengine_spark.functions.extract import extract_one, normalize_url
from uci_searchengine_spark.functions.tokenize import tokenize_py, tokenize_series


class TestTokenizer:
    def test_basic(self):
        assert tokenize_py("Hello, World!") == ["hello", "world"]

    def test_unicode_word(self):
        # Python \w is Unicode-aware
        assert tokenize_py("naïve café") == ["naïve", "café"]

    def test_digits_underscore_kept(self):
        assert tokenize_py("abc_1 42") == ["abc_1", "42"]

    def test_empty_and_punct(self):
        assert tokenize_py("") == []
        assert tokenize_py("!!! ...") == []

    def test_whitespace_collapse(self):
        assert tokenize_py("a\n\n  b\t c") == ["a", "b", "c"]

    def test_series_matches_py(self):
        texts = [
            "Hello, World!",
            "",
            "!!! ...",
            "naïve café 東京",
            "a\n b\t\tc  d",
            "MiXeD CaSe_9",
        ]
        out = tokenize_series(pd.Series(texts))
        for t, o in zip(texts, out):
            assert list(o) == tokenize_py(t), t


class TestExtract:
    def test_script_style_dropped(self):
        html = b"<html><head><style>p{color:red}</style></head><body><script>var x=1;</script><p>keep me</p></body></html>"
        title, text, links = extract_one(html, "http://u")
        assert text == "keep me"
        assert "color" not in text and "var" not in text

    def test_title_fallback_to_url(self):
        html = b"<html><body><p>x</p></body></html>"
        title, _, _ = extract_one(html, "http://example.com/a")
        assert title == "http://example.com/a"

    def test_title_extracted(self):
        html = b"<html><head><title>My Title</title></head><body>b</body></html>"
        title, _, _ = extract_one(html, "http://u")
        assert title == "My Title"

    def test_two_space_split_and_strip(self):
        # the pinned cleanup: line-strip, split on "  ", join non-empty with " "
        html = b"<html><body><p>  a  b   c </p>\n<p>d</p></body></html>"
        _, text, _ = extract_one(html, "http://u")
        assert text == "a b c d"

    def test_entities_decoded(self):
        html = b"<p>fish &amp; chips&nbsp;now</p>"
        _, text, _ = extract_one(html, "http://u")
        assert "&" in text and "amp" not in text

    def test_comments_excluded(self):
        html = b"<body><!-- hidden -->shown</body>"
        _, text, _ = extract_one(html, "http://u")
        assert text == "shown"

    def test_links_filtered_joined_normalized(self):
        html = (
            b'<body><a href="#frag">s</a><a href="mailto:a@b">m</a>'
            b'<a href="/REL/x/">r</a><a href="http://other.com/P/">abs</a>'
            b'<a href="item.php?id=3">q</a><a href="/x?track=only">dropq</a></body>'
        )
        _, _, links = extract_one(html, "https://host.edu/dir/page")
        assert links == [
            "https://host.edu/rel/x",
            "http://other.com/p",
            "https://host.edu/dir/item.php?id=3",
            "https://host.edu/x",
        ]

    def test_nested_text_order(self):
        html = b"<div>a<div>b<span>c</span></div>d</div>"
        _, text, _ = extract_one(html, "http://u")
        assert text == "abcd"


class TestNormalizeUrl:
    # semantics per backend/app/api/crawler.py:384-397
    def test_basic(self):
        assert normalize_url("HTTPS://Host.EDU/Path/") == "https://host.edu/path"

    def test_query_dropped(self):
        assert normalize_url("https://h.edu/a?track=zz") == "https://h.edu/a"

    def test_query_kept_php(self):
        assert normalize_url("https://h.edu/a.php?x=1") == "https://h.edu/a.php?x=1"

    def test_query_kept_id_param(self):
        assert normalize_url("https://h.edu/a?id=1") == "https://h.edu/a?id=1"

    def test_query_kept_p_substring(self):
        # the reference matches 'p' as a substring of the query string
        assert normalize_url("https://h.edu/a?page=2") == "https://h.edu/a?page=2"


@pytest.mark.spark
def test_extract_udf_matches_oracle_byte_identical(spark, pages_tiny_pdf):
    """The per-row invariant from BASELINE.json input_hint: the Spark UDF's
    extracted text is byte-identical per url to the single-node oracle
    (which is also what's stored in the `text` column)."""
    from pyspark.sql import functions as F

    from uci_searchengine_spark.functions.extract import extract_html
    from uci_searchengine_spark.schema import PAGES_SCHEMA

    sdf = spark.createDataFrame(pages_tiny_pdf, schema=PAGES_SCHEMA)
    out = (
        sdf.repartition(5)
        .withColumn("_ex", extract_html(F.col("html"), F.col("url")))
        .select("url", F.col("_ex")["text"].alias("ex_text"), "text")
        .collect()
    )
    assert len(out) == len(pages_tiny_pdf)
    for r in out:
        assert r["ex_text"] == r["text"], r["url"]


class TestExtractAnchors:
    def _pairs(self, html, url="https://ex.com/a"):
        from uci_searchengine_spark.functions.extract import (
            extract_anchors_one,
        )

        return extract_anchors_one(html.encode(), url)

    def test_basic_pairs(self):
        got = self._pairs(
            '<a href="/x">Click  Here</a> mid <a href="https://o.org/Y/">o</a>'
        )
        assert got == [
            ("https://ex.com/x", "Click Here"),
            ("https://o.org/y", "o"),
        ]

    def test_skip_fragment_and_mailto(self):
        got = self._pairs(
            '<a href="#top">t</a><a href="mailto:a@b">m</a><a href="/k">k</a>'
        )
        assert got == [("https://ex.com/k", "k")]

    def test_nested_markup_inside_anchor(self):
        got = self._pairs('<a href="/x">big <b>bold</b> text</a>')
        assert got == [("https://ex.com/x", "big bold text")]

    def test_unclosed_anchor_autocloses_at_next(self):
        got = self._pairs('<a href="/x">one <a href="/y">two</a>')
        assert got == [
            ("https://ex.com/x", "one"),
            ("https://ex.com/y", "two"),
        ]

    def test_script_inside_anchor_excluded(self):
        got = self._pairs('<a href="/x">ok<script>var t="no";</script></a>')
        assert got == [("https://ex.com/x", "ok")]

    def test_href_less_anchor_ignored(self):
        got = self._pairs("<a>plain</a><a href='/z'>z</a>")
        assert got == [("https://ex.com/z", "z")]

    def test_keeps_multiplicity_same_target(self):
        got = self._pairs('<a href="/x">one</a><a href="/x">two</a>')
        assert got == [
            ("https://ex.com/x", "one"),
            ("https://ex.com/x", "two"),
        ]

    def test_pinned_outputs_untouched(self):
        # the anchor capture must not perturb the byte-pinned extractor
        from uci_searchengine_spark.functions.extract import extract_one

        html = b'<title>T</title><p>body  text</p><a href="/x">Click</a>'
        title, text, links = extract_one(html, "https://ex.com/a")
        assert (title, text, links) == (
            "T",
            "Tbody textClick",  # raw text-node concat, two-space split
            ["https://ex.com/x"],
        )


@pytest.mark.spark
class TestAnchorPlane:
    def test_rollup_matches_python(self, spark):
        from uci_searchengine_spark.operators.links import anchor_plane

        rows = [
            ("s1", "d1", "big data"),
            ("s2", "d1", "big spark"),
            ("s3", "d1", "big"),
            ("s1", "d2", "lake"),
            ("s1", "d2", "lake house"),  # same src twice: 1 distinct inlink
        ]
        edges = spark.createDataFrame(
            rows, "src_url string, dst_url string, anchor string"
        )
        got = {
            r["dst_url"]: (r["n_inlinks"], r["anchors"])
            for r in anchor_plane(edges, k=2).collect()
        }
        assert got == {
            "d1": (3, "big:3 data:1"),  # ties broken term-asc, capped k=2
            "d2": (1, "lake:2 house:1"),
        }

    def test_min_count_prunes_singletons(self, spark):
        from uci_searchengine_spark.operators.links import anchor_plane

        edges = spark.createDataFrame(
            [("s1", "d1", "hot hot cold")],
            "src_url string, dst_url string, anchor string",
        )
        got = anchor_plane(edges, k=5, min_count=2).collect()[0]
        assert got["anchors"] == "hot:2"

    def test_html_to_plane_end_to_end(self, spark):
        from uci_searchengine_spark.operators.links import (
            anchor_edges,
            anchor_plane,
        )

        pages = spark.createDataFrame(
            [
                (
                    "https://a.com/p1",
                    b'<a href="https://t.com/x">great engine</a>',
                ),
                (
                    "https://b.com/p2",
                    b'<a href="https://t.com/x/">fast engine</a>',
                ),
            ],
            "url string, html binary",
        )
        plane = anchor_plane(anchor_edges(pages), k=3).collect()
        assert len(plane) == 1
        r = plane[0]
        assert r["dst_url"] == "https://t.com/x"  # normalized union
        assert r["n_inlinks"] == 2
        assert r["anchors"] == "engine:2 fast:1 great:1"
