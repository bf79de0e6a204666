"""minimum_should_match: spec resolution (ES int/percentage rules),
boundary routing (m=1 ≡ OR, m=n ≡ AND), and the intermediate
full-decode path vs the single-node oracle."""

import math

import pytest

from uci_searchengine_spark.operators.wand import resolve_msm


def test_resolve_msm_es_rules():
    assert resolve_msm(2, 3) == 2
    assert resolve_msm(0, 3) == 1  # <=0 resolves to plain OR
    assert resolve_msm(-1, 3) == 2  # all but one
    assert resolve_msm(-5, 3) == 1  # clamped
    assert resolve_msm("75%", 4) == 3
    assert resolve_msm("75%", 3) == 2  # trunc toward zero
    assert resolve_msm("100%", 3) == 3
    assert resolve_msm("-25%", 4) == 4 + (-1)
    assert resolve_msm(9, 3) == 9  # unsatisfiable stays > n
    with pytest.raises(ValueError):
        resolve_msm("75", 3)


QUERY = "stop0 arbak arband"  # head, mid, rarer — mixed dfs


@pytest.mark.spark
class TestMsm:
    @pytest.mark.parametrize("m", [2, "67%", -1])
    def test_intermediate_matches_oracle(
        self, spark, index_small, oracle_small, m
    ):
        from uci_searchengine_spark.operators.wand import score_msm

        expected = oracle_small.top_k_msm(QUERY, 10, resolve_msm(m, 3))
        got = [
            (r["doc_id"], r["score"])
            for r in score_msm(
                spark, index_small, QUERY, 10, min_should_match=m
            ).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in expected], m
        for (_, gs), (_, es) in zip(got, expected):
            assert math.isclose(gs, es, rel_tol=1e-9)

    def test_boundaries_route_to_or_and(self, spark, index_small):
        from uci_searchengine_spark.operators.wand import (
            score_msm,
            score_wand,
        )

        def rows(df):
            return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]

        assert rows(score_msm(spark, index_small, QUERY, 10, 1)) == rows(
            score_wand(spark, index_small, QUERY, 10, mode="or")
        )
        assert rows(score_msm(spark, index_small, QUERY, 10, 3)) == rows(
            score_wand(spark, index_small, QUERY, 10, mode="and")
        )
        # the intermediate set sits between the two
        or_ids = {d for d, _ in rows(score_wand(spark, index_small, QUERY, 1000, mode="or"))}
        and_ids = {d for d, _ in rows(score_wand(spark, index_small, QUERY, 1000, mode="and"))}
        m2_ids = {d for d, _ in rows(score_msm(spark, index_small, QUERY, 1000, 2))}
        assert and_ids <= m2_ids <= or_ids
        assert m2_ids != or_ids  # non-degenerate on this corpus

    def test_unsatisfiable_is_empty(self, spark, index_small):
        from uci_searchengine_spark.operators.wand import score_msm

        assert (
            score_msm(spark, index_small, QUERY, 10, 4).count() == 0
        )

    def test_msm_with_tombstones(self, spark, index_small, oracle_small):
        """The intermediate path honors the exclusion set like every
        other scorer: deleting the top msm=2 doc promotes the next."""
        import shutil

        from uci_searchengine_spark.operators.tombstones import delete_docs
        from uci_searchengine_spark.operators.wand import score_msm

        expected = oracle_small.top_k_msm(QUERY, 11, 2)
        d = index_small + "_msmtomb"
        shutil.rmtree(d, ignore_errors=True)
        shutil.copytree(index_small, d)
        top = expected[0][0]
        delete_docs(d, [top])
        got = [
            (r["doc_id"], r["score"])
            for r in score_msm(spark, d, QUERY, 10, 2).collect()
        ]
        rest = [(doc, s) for doc, s in expected if doc != top][:10]
        assert [doc for doc, _ in got] == [doc for doc, _ in rest]
        shutil.rmtree(d, ignore_errors=True)
