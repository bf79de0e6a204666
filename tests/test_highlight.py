"""Multi-fragment highlighting: the pinned fragment/tagging rules and
the bounded serving + HTTP surface."""

import pytest

from uci_searchengine_spark.functions.highlight import highlight_fragments


def test_basic_tagging_and_windows():
    text = "alpha beta gamma " * 20  # occurrences every 17 chars
    frags = highlight_fragments(text, ["beta"], n_frags=2, frag_len=40)
    assert len(frags) == 2
    for f in frags:
        assert "<em>beta</em>" in f
        # fragment body (tags removed) never exceeds frag_len
        assert len(f.replace("<em>", "").replace("</em>", "")) <= 40


def test_cluster_merging():
    # two nearby matches share one fragment; a distant one gets its own
    text = "x" * 10 + " term one term " + "y" * 300 + " term end"
    frags = highlight_fragments(text, ["term"], n_frags=5, frag_len=60)
    assert len(frags) == 2
    assert frags[0].count("<em>term</em>") == 2
    assert frags[1].count("<em>term</em>") == 1


def test_longest_term_wins_and_case_preserved():
    text = "The Database has data"
    frags = highlight_fragments(text, ["data", "database"], frag_len=120)
    assert frags == ["The <em>Database</em> has <em>data</em>"]


def test_no_match_fallback_and_edges():
    assert highlight_fragments("plain text here", ["zz"], frag_len=10) == [
        "plain text"
    ]
    assert highlight_fragments("", ["x"]) == []
    with pytest.raises(ValueError):
        highlight_fragments("x", ["x"], n_frags=0)


def test_partial_occurrence_at_window_edge_not_split():
    # an occurrence extending past the window end is left untagged
    text = "aaaa matchword"
    frags = highlight_fragments(text, ["matchword"], frag_len=9)
    # window = [p-lead, +9) = "a matchwo"; the occurrence extends past
    # the window end, so no broken <em> tag appears
    assert frags == ["a matchwo"]


@pytest.mark.spark
class TestHighlightServing:
    def test_serving_and_http(self, spark, index_small, oracle_small):
        import json
        import threading
        import urllib.request

        from uci_searchengine_spark.http_api import make_server
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, index_small, query_cache=0)
        got = s.highlight("arbak", 0, n_frags=2, frag_len=80)
        assert got["found"]
        assert got["fragments"] == highlight_fragments(
            oracle_small.texts[0], ["arbak"], 2, 80
        )
        assert s.highlight("arbak", 10**9)["found"] is False

        srv = make_server(spark, index_small, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            with urllib.request.urlopen(
                base + "/api/highlight?query=arbak&doc_id=0&fragments=2"
                "&fragment_size=80"
            ) as r:
                env = json.loads(r.read())
            assert env["fragments"] == got["fragments"]
        finally:
            srv.shutdown()
