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
