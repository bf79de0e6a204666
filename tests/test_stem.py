"""Optional Porter stemmer (north-star "tokenize/stem").

The stemmer is OFF for every correctness fixture (FIXTURES.md §5 — the
reference tokenizer has no stemming); these tests cover the opt-in path:
the pure function against pinned outputs of the published Porter (1980)
algorithm, the vectorized batch form, and the end-to-end contract that a
``stem=True`` index matches inflected queries symmetrically with
rank-identity between both scorers.
"""

import shutil

import pandas as pd
import pytest

# (surface, stem) pairs from the Porter paper's own worked examples plus
# the published voc/output vocabulary
PINNED = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file", "happy": "happi",
    "sky": "sky", "relational": "relat", "conditional": "condit",
    "rational": "ration", "digitizer": "digit", "hesitancy": "hesit",
    "generalization": "gener", "oscillators": "oscil",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formality": "formal",
    "sensitivity": "sensit", "sensibility": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electricity": "electr", "electrical": "electr", "goodness": "good",
    "probate": "probat", "rate": "rate", "cease": "ceas", "roll": "roll",
    "running": "run", "runs": "run",
}


class TestPorterFunction:
    def test_pinned_pairs(self):
        from uci_searchengine_spark.functions.stem import porter_stem

        got = {w: porter_stem(w) for w in PINNED}
        assert got == PINNED

    def test_short_and_nonalpha_pass_through(self):
        from uci_searchengine_spark.functions.stem import porter_stem

        for w in ["a", "is", "x1", "42", "héllo", ""]:
            assert porter_stem(w) == w

    def test_idempotent_on_fixture_vocab(self):
        # stem(stem(w)) == stem(w) for the pinned vocabulary — queries are
        # stemmed once, the index once; double application must be safe
        from uci_searchengine_spark.functions.stem import porter_stem

        for s in set(PINNED.values()):
            assert porter_stem(s) == s or porter_stem(porter_stem(s)) == porter_stem(s)

    def test_series_matches_per_token(self):
        from uci_searchengine_spark.functions.stem import (
            porter_stem,
            stem_token_series,
        )

        toks = [
            ["running", "jumps", "easily", "running"],
            [],
            ["flies", "the", "relational", "databases"],
        ]
        s = pd.Series(toks, dtype=object)
        got = list(stem_token_series(s))
        want = [[porter_stem(t) for t in row] for row in toks]
        assert got == want


@pytest.fixture(scope="module")
def stem_pages(spark):
    rows = [
        ("https://ex.com/a", "<html><title>a</title><body>running runner runs daily</body></html>"),
        ("https://ex.com/b", "<html><title>b</title><body>the cat ran and runs fast</body></html>"),
        ("https://ex.com/c", "<html><title>c</title><body>relational databases scale</body></html>"),
        ("https://ex.com/d", "<html><title>d</title><body>nothing about jogging here</body></html>"),
    ]
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, ts, h.encode()) for u, h in rows],
        "url string, warc_ts timestamp, html binary",
    )


class TestStemmedIndex:
    def test_stemmed_index_matches_inflections(self, spark, tmp_path, stem_pages):
        from uci_searchengine_spark.operators.bm25 import score_naive
        from uci_searchengine_spark.operators.index_build import (
            IndexMeta,
            build_index,
        )
        from uci_searchengine_spark.operators.wand import score_wand

        d = str(tmp_path / "stemidx")
        shutil.rmtree(d, ignore_errors=True)
        meta = build_index(
            spark, stem_pages, d, num_shards=4, n_buckets=2,
            input_snapshot="stemtest", stem=True,
        )
        assert meta.stem is True
        assert IndexMeta.load(d).stem is True

        # query an inflection never present verbatim: "runnings" → stem
        # "run"; docs a ("running","runner"→run? runner→runner... "runs"→run)
        # and b ("runs"→run) both contain stem "run"
        for scorer in (score_naive, score_wand):
            got = {r["doc_id"] for r in scorer(spark, d, "runnings", k=10).collect()}
            assert len(got) == 2, scorer.__name__

        # rank identity between scorers on a multi-term stemmed query
        a = [(r["doc_id"], round(r["score"], 9)) for r in score_naive(spark, d, "running databases", 10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in score_wand(spark, d, "running databases", 10).collect()]
        assert a == b and a

    def test_unstemmed_default_unchanged(self, spark, tmp_path, stem_pages):
        from uci_searchengine_spark.operators.bm25 import score_naive
        from uci_searchengine_spark.operators.index_build import build_index

        d = str(tmp_path / "nostem")
        meta = build_index(
            spark, stem_pages, d, num_shards=4, n_buckets=2,
            input_snapshot="stemtest",
        )
        assert meta.stem is False
        # inflection not present verbatim matches nothing without stemming
        assert score_naive(spark, d, "runnings", k=10).count() == 0
        # verbatim form still matches only its own doc
        got = [r["doc_id"] for r in score_naive(spark, d, "runner", k=10).collect()]
        assert len(got) == 1


class TestStemmedRound3Surfaces:
    def test_wildcard_on_stemmed_index(self, spark, tmp_path, stem_pages):
        """Wildcards skip analysis: `runn*` matches against the STORED
        (stemmed) vocabulary — 'running' stems to 'run', so 'runn*'
        finds nothing while 'run*' expands to the stem."""
        from uci_searchengine_spark.operators.index_build import build_index
        from uci_searchengine_spark.operators.prefix import (
            expand_prefix,
            prefix_search,
        )
        from uci_searchengine_spark.operators.serving import Searcher

        d = str(tmp_path / "stemidx_wc")
        build_index(
            spark, stem_pages, d, num_shards=4, n_buckets=2,
            input_snapshot="stemtest-wc", stem=True,
        )
        exp = expand_prefix(spark, d, "run")
        assert "run" in exp and "running" not in exp  # vocab is stemmed
        hits = {
            r["doc_id"] for r in prefix_search(spark, d, "run*", k=10).collect()
        }
        assert len(hits) == 2  # both docs holding the stem
        # the envelope path agrees
        env = Searcher(spark, d).search("run*")
        assert env["total_results"] == 2
