"""Lucene numeric range queries (`field:[a TO b]`) as filter context:
parser cases, envelope restriction vs the Python oracle, local ≡ spark
plan equality, composition with site:, unknown-field loudness."""

import math

import pytest

from uci_searchengine_spark.operators.filtered import parse_range_filters


class TestParseRanges:
    def test_inclusive(self):
        rest, r = parse_range_filters("stop0 rank:[0.2 TO 0.6]")
        assert rest == "stop0"
        assert r == [("rank", 0.2, 0.6, True, True)]

    def test_exclusive_and_mixed(self):
        _, r = parse_range_filters("x rank:{1 TO 5} len:[2 TO 4}")
        assert r == [
            ("rank", 1.0, 5.0, False, False),
            ("len", 2.0, 4.0, True, False),
        ]

    def test_open_ends_and_negative(self):
        _, r = parse_range_filters("q a:[* TO -1.5] b:[10 TO *]")
        assert r == [
            ("a", None, -1.5, True, True),
            ("b", 10.0, None, True, True),
        ]

    def test_site_and_plain_colons_untouched(self):
        rest, r = parse_range_filters("stop0 site:a.com rank:[0 TO 1]")
        assert rest == "stop0 site:a.com"
        assert len(r) == 1

    def test_lowercase_to_is_not_a_range(self):
        rest, r = parse_range_filters("rank:[1 to 2]")
        assert r == [] and rest == "rank:[1 to 2]"


@pytest.fixture(scope="module")
def range_index(spark, index_small, tmp_path_factory):
    """index_small cloned with the same deterministic 'rank' plane the
    docvalues tests pin: value(doc) = ((doc_id * 37) % 101) / 101."""
    import shutil

    from uci_searchengine_spark.operators.docvalues import attach_doc_values
    from uci_searchengine_spark.operators.index_build import IndexMeta

    d = str(tmp_path_factory.mktemp("range_idx") / "idx")
    shutil.copytree(index_small, d)
    n = IndexMeta.load(d).n_docs
    vals = spark.range(n).selectExpr(
        "id AS doc_id", "((id * 37) % 101) / cast(101 AS DOUBLE) AS value"
    )
    attach_doc_values(spark, d, vals, "rank")
    return d


def _dv(doc_id):
    return ((doc_id * 37) % 101) / 101.0


@pytest.mark.spark
class TestSearcherRange:
    def _expect(self, oracle, q, pred, k=10):
        scores = oracle.score(q)
        elig = {d: sc for d, sc in scores.items() if pred(_dv(d))}
        want = sorted(elig.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return elig, want

    def test_envelope_vs_oracle_and_plan_equality(
        self, spark, range_index, oracle_small
    ):
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, range_index)
        q = "stop0"
        elig, want = self._expect(
            oracle_small, q, lambda v: 0.2 <= v <= 0.6
        )
        env = s.search(f"{q} rank:[0.2 TO 0.6]")
        assert s.last_plan == "local"
        env_spark = s.search(f"{q} rank:[0.2 TO 0.6]", plan="spark")
        assert s.last_plan == "spark"
        assert env_spark == env
        assert env["total_results"] == len(elig)
        assert [r["url"] for r in env["results"]] == [
            oracle_small.urls[d] for d, _ in want
        ]
        for r, (_d, sc) in zip(env["results"], want):
            assert math.isclose(r["score"], sc, rel_tol=1e-12)

    def test_exclusive_and_open_bounds(
        self, spark, range_index, oracle_small
    ):
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, range_index)
        q = "stop0"
        elig_ex, _ = self._expect(oracle_small, q, lambda v: 0.2 < v < 0.6)
        assert (
            s.search(f"{q} rank:{{0.2 TO 0.6}}")["total_results"]
            == len(elig_ex)
        )
        elig_open, _ = self._expect(oracle_small, q, lambda v: v >= 0.5)
        assert (
            s.search(f"{q} rank:[0.5 TO *]")["total_results"]
            == len(elig_open)
        )

    def test_composes_with_site_and_multiple_ranges(
        self, spark, range_index, oracle_small
    ):
        from collections import Counter
        from urllib.parse import urlparse

        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, range_index)
        q = "stop0"
        scores = oracle_small.score(q)
        host_of = {d: urlparse(oracle_small.urls[d]).netloc for d in scores}
        host = Counter(host_of.values()).most_common(1)[0][0]
        elig = {
            d
            for d in scores
            if host_of[d] == host and 0.1 <= _dv(d) <= 0.8 and _dv(d) < 0.7
        }
        rq = f"{q} site:{host} " + "rank:[0.1 TO 0.8] rank:[* TO 0.7}"
        env = s.search(rq)
        assert env["total_results"] == len(elig)
        env_spark = s.search(rq, plan="spark")
        assert env_spark == env

    def test_unknown_field_raises_both_plans(self, spark, range_index):
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, range_index)
        for plan in ("auto", "spark"):
            with pytest.raises(ValueError, match="no doc-values plane"):
                s.search("stop0 nosuch:[1 TO 2]", plan=plan)

    def test_empty_range_zero_hits_envelope(self, spark, range_index):
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, range_index)
        env = s.search("stop0 rank:[2 TO 3]")  # plane values are < 1
        assert env["total_results"] == 0 and env["results"] == []
