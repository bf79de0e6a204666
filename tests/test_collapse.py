"""Field collapsing (operators/collapse.py): host-crowding top-k pinned
against a brute-force python oracle over the same corpus; the relational
gate twin (entry_queries.q_collapsed_search) is oracle-checked by the
driver/replica."""

from urllib.parse import urlparse

import pytest

from uci_searchengine_spark.operators.collapse import collapsed_topk


def _collapse_oracle(oracle, query, k=10, per_group=1):
    scores = oracle.score(query)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    seen: dict[str, int] = {}
    out = []
    for d, s in ranked:
        host = urlparse(oracle.urls[d]).netloc.lower()
        c = seen.get(host, 0)
        if c < per_group:
            seen[host] = c + 1
            out.append((d, round(s, 9), host))
        if len(out) == k:
            break
    return out


@pytest.mark.spark
class TestCollapse:
    @pytest.mark.parametrize("query", ["stop0 arbak", "arband arbast stop1"])
    @pytest.mark.parametrize("per_group", [1, 2])
    def test_matches_bruteforce_oracle(
        self, spark, index_small, oracle_small, query, per_group
    ):
        got = [
            (r["doc_id"], round(r["score"], 9), r["group"])
            for r in collapsed_topk(
                spark, index_small, query, k=10, per_group=per_group
            ).collect()
        ]
        want = _collapse_oracle(oracle_small, query, 10, per_group)
        assert got == want

    def test_per_group_one_gives_unique_hosts(
        self, spark, index_small
    ):
        rows = collapsed_topk(spark, index_small, "stop0", k=10).collect()
        hosts = [r["group"] for r in rows]
        assert len(hosts) == len(set(hosts)) and rows

    def test_large_per_group_equals_plain_topk(
        self, spark, index_small, oracle_small
    ):
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in collapsed_topk(
                spark, index_small, "stop0 arbak", k=10, per_group=10**6
            ).collect()
        ]
        want = [
            (d, round(s, 9))
            for d, s in oracle_small.top_k("stop0 arbak", 10)
        ]
        assert got == want

    def test_validation(self, spark, index_small):
        with pytest.raises(ValueError, match="per_group"):
            collapsed_topk(spark, index_small, "stop0", per_group=0)


@pytest.mark.spark
class TestSearchAfter:
    def test_cursor_pages_tile_the_ranking(
        self, spark, index_small, oracle_small
    ):
        """Walking pages of 7 via the (score, doc_id) cursor reproduces
        the oracle's global ranking exactly — no gaps, no repeats —
        and page 1 (after=None) equals plain top-k."""
        from uci_searchengine_spark.operators.bm25 import search_after

        q = "stop0 arbak"
        want = [
            (d, round(s, 9)) for d, s in oracle_small.top_k(q, k=28)
        ]
        got = []
        cursor = None
        for _ in range(4):
            rows = search_after(
                spark, index_small, q, after=cursor, k=7
            ).collect()
            assert len(rows) == 7
            got += [(r["doc_id"], round(r["score"], 9)) for r in rows]
            cursor = (rows[-1]["score"], rows[-1]["doc_id"])
        assert got == want
        assert len({d for d, _ in got}) == len(got)  # no repeats

    def test_exhausted_cursor_returns_empty(self, spark, index_small):
        from uci_searchengine_spark.operators.bm25 import search_after

        rows = search_after(
            spark, index_small, "stop0", after=(-1.0, 10**9), k=5
        ).collect()
        assert rows == []
