"""ColBERT MaxSim late interaction: Spark score ≡ numpy reference on
random bags, the single-vector→bag slicing adapter, candidate-pruned
rerank ≡ full scan, partition invariance, and the zero-shuffle
zero-Python plan shape."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.lateinteraction import (
    maxsim_expr,
    maxsim_topk,
    slice_tokens,
    tokens_from_vec,
)

NTOK, DIM = 4, 6


def _quant(v):
    return [int(math.floor(x * 1000.0)) for x in v]


def _bags(rng, n, ntok=NTOK, dim=DIM):
    return [
        (
            i,
            [
                _quant([rng.uniform(-1, 1) for _ in range(dim)])
                for _ in range(ntok)
            ],
        )
        for i in range(n)
    ]


def _maxsim_ref(doc_toks, q_toks):
    d = np.array(doc_toks, dtype=np.int64)
    total = 0
    for q in q_toks:
        total += int((d @ np.array(q, dtype=np.int64)).max())
    return total


@pytest.mark.spark
class TestMaxSim:
    def test_score_equals_numpy_reference(self, spark):
        rng = random.Random(11)
        rows = _bags(rng, 50)
        q_toks = rows[0][1]
        df = spark.createDataFrame(
            rows, "vec_id long, toks array<array<long>>"
        )
        got = {
            r["vec_id"]: r["score"]
            for r in df.select(
                "vec_id", maxsim_expr(F.col("toks"), q_toks).alias("score")
            ).collect()
        }
        for vid, toks in rows:
            assert got[vid] == _maxsim_ref(toks, q_toks), vid

    def test_slice_adapter_matches_python(self, spark):
        rng = random.Random(3)
        flat = [rng.uniform(-1, 1) for _ in range(NTOK * DIM)]
        df = spark.createDataFrame([(0, flat)], "vec_id long, embedding array<float>")
        row = tokens_from_vec(df, "embedding", "vec_id", NTOK, DIM).collect()[0]
        # quantization happens on the FLOAT-valued column: mirror it
        fvals = [
            r["embedding"] for r in df.select("embedding").collect()
        ][0]
        want = [
            _quant(fvals[j * DIM : (j + 1) * DIM]) for j in range(NTOK)
        ]
        assert [list(t) for t in row["toks"]] == want

    def test_topk_full_scan_ranking(self, spark):
        rng = random.Random(5)
        rows = _bags(rng, 80)
        q_toks = rows[7][1]
        df = spark.createDataFrame(rows, "vec_id long, toks array<array<long>>")
        got = [
            (r["vec_id"], r["score"])
            for r in maxsim_topk(df, q_toks, k=10).collect()
        ]
        ref = sorted(
            ((vid, _maxsim_ref(t, q_toks)) for vid, t in rows),
            key=lambda kv: (-kv[1], kv[0]),
        )[:10]
        assert got == ref
        assert got[0][0] == 7  # self-match wins

    def test_candidate_rerank_equals_full_when_covering(self, spark):
        rng = random.Random(9)
        rows = _bags(rng, 80)
        q_toks = rows[2][1]
        df = spark.createDataFrame(rows, "vec_id long, toks array<array<long>>")
        full = maxsim_topk(df, q_toks, k=10).collect()
        top20 = [r["vec_id"] for r in maxsim_topk(df, q_toks, k=20).collect()]
        cand = spark.createDataFrame([(i,) for i in top20], "cid long")
        pruned = maxsim_topk(df, q_toks, k=10, candidates=cand).collect()
        assert [tuple(r) for r in pruned] == [tuple(r) for r in full]

    def test_empty_query_raises(self, spark):
        df = spark.createDataFrame(
            [(0, [[1, 2]])], "vec_id long, toks array<array<long>>"
        )
        with pytest.raises(ValueError):
            maxsim_topk(df, [], k=1)

    def test_partition_invariance(self, spark):
        rng = random.Random(13)
        rows = _bags(rng, 60)
        q_toks = rows[1][1]
        df = spark.createDataFrame(rows, "vec_id long, toks array<array<long>>")
        a = [tuple(r) for r in maxsim_topk(df, q_toks, k=10).collect()]
        b = [
            tuple(r)
            for r in maxsim_topk(df.repartition(7), q_toks, k=10).collect()
        ]
        assert a == b

    def test_plan_zero_shuffle_zero_python(self, spark):
        rng = random.Random(1)
        rows = _bags(rng, 20)
        df = spark.createDataFrame(rows, "vec_id long, toks array<array<long>>")
        top = maxsim_topk(df, rows[0][1], k=5)
        plan = top._sc._jvm.PythonSQLUtils.explainString(
            top._jdf.queryExecution(), "formatted"
        )
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
