"""function_score decay ranking (operators/docvalues.py decay_topk):
curve math, brute-force ranking parity, pruning admissibility under a
decay that reorders the match set, and parameter validation."""

import math

import numpy as np
import pytest

from uci_searchengine_spark.operators.docvalues import _decay_multiplier


class TestCurves:
    def test_decay_at_scale_is_decay(self):
        for kind in ("gauss", "exp", "linear"):
            m = _decay_multiplier(
                np.array([10.0]), kind, origin=0.0, scale=10.0,
                offset=0.0, decay=0.37,
            )
            assert m[0] == pytest.approx(0.37, rel=1e-12), kind

    def test_offset_is_free_zone(self):
        for kind in ("gauss", "exp", "linear"):
            m = _decay_multiplier(
                np.array([0.0, 3.0, -3.0]), kind, origin=0.0, scale=5.0,
                offset=3.0, decay=0.5,
            )
            assert np.allclose(m, 1.0), kind

    def test_linear_floors_at_zero(self):
        m = _decay_multiplier(
            np.array([100.0]), "linear", 0.0, 1.0, 0.0, 0.5
        )
        assert m[0] == 0.0

    def test_validation(self):
        z = np.zeros(1)
        with pytest.raises(ValueError):
            _decay_multiplier(z, "gauss", 0, 1, 0, 1.5)
        with pytest.raises(ValueError):
            _decay_multiplier(z, "gauss", 0, -1, 0, 0.5)
        with pytest.raises(ValueError):
            _decay_multiplier(z, "cosine", 0, 1, 0, 0.5)


@pytest.mark.spark
class TestDecayTopk:
    @pytest.fixture(scope="class")
    def planed_index(self, spark, index_small, oracle_small, tmp_path_factory):
        """A CLONE of index_small (the session fixture stays pristine)
        with a 'rank' doc-values plane = doc_id — a value guaranteed
        anti-correlated with BM25 order, so a decay centered low
        genuinely reorders the match set."""
        import shutil

        from pyspark.sql import functions as F

        from uci_searchengine_spark.operators.docvalues import (
            attach_doc_values,
        )

        d = str(tmp_path_factory.mktemp("decay_idx") / "idx")
        shutil.copytree(index_small, d)
        index_small = d
        vals = spark.range(oracle_small.n_docs).select(
            F.col("id").alias("doc_id"),
            F.col("id").cast("double").alias("value"),
        )
        attach_doc_values(spark, index_small, vals, "rank")
        return index_small

    def _brute(self, oracle, query, kind, origin, scale, offset, decay):
        scores = oracle.score(query)
        out = []
        for d, s in scores.items():
            m = _decay_multiplier(
                np.array([float(d)]), kind, origin, scale, offset, decay
            )[0]
            out.append((d, s * m))
        return sorted(out, key=lambda kv: (-round(kv[1], 9), kv[0]))

    @pytest.mark.parametrize("kind", ["gauss", "exp", "linear"])
    def test_matches_brute_force(self, spark, planed_index, oracle_small, kind):
        from uci_searchengine_spark.operators.docvalues import decay_topk

        got = decay_topk(
            spark, planed_index, "stop0 arbak", "rank", kind=kind,
            origin=20.0, scale=60.0, offset=5.0, decay=0.4, k=15,
        ).collect()
        want = self._brute(
            oracle_small, "stop0 arbak", kind, 20.0, 60.0, 5.0, 0.4
        )[:15]
        assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
            (d, round(s, 9)) for d, s in want
        ]

    def test_decay_actually_reorders(self, spark, planed_index, oracle_small):
        """The winner set differs from a post-hoc decay of the plain
        top-k — i.e. the scorer reranks the WHOLE match set (what a
        naive rescore-top-k would get wrong)."""
        from uci_searchengine_spark.operators.docvalues import decay_topk

        k = 5
        got = [
            r["doc_id"]
            for r in decay_topk(
                spark, planed_index, "stop0 arbak", "rank", kind="gauss",
                origin=150.0, scale=30.0, decay=0.1, k=k,
            ).collect()
        ]
        plain = [d for d, _ in oracle_small.top_k("stop0 arbak", k)]
        post_hoc = sorted(
            (
                (
                    d,
                    s
                    * _decay_multiplier(
                        np.array([float(d)]), "gauss", 150.0, 30.0, 0.0, 0.1
                    )[0],
                )
                for d, s in oracle_small.top_k("stop0 arbak", k)
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )
        assert got != [d for d, _ in post_hoc]
        assert set(got) != set(plain)

    def test_missing_plane_uses_zero_default(self, spark, index_small, oracle_small):
        """No plane written under this name → every doc carries value
        0.0 and decays by |0 − origin| uniformly: ranking equals plain
        BM25, scores scaled by one constant."""
        from uci_searchengine_spark.operators.docvalues import decay_topk

        got = decay_topk(
            spark, index_small, "stop0 arbak", "no_such_plane",
            kind="exp", origin=100.0, scale=50.0, decay=0.5, k=10,
        ).collect()
        c = _decay_multiplier(
            np.zeros(1), "exp", 100.0, 50.0, 0.0, 0.5
        )[0]
        want = oracle_small.top_k("stop0 arbak", 10)
        assert [r["doc_id"] for r in got] == [d for d, _ in want]
        for r, (_, s) in zip(got, want):
            assert r["score"] == pytest.approx(s * c, rel=1e-9)
