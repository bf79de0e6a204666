"""Retrieval metrics vs hand-computed trec_eval-style values."""

import math

import pytest


def _dfs(spark):
    # topic 1: ranked [d1, d2, d3]; rels d1=3, d3=1, d9=2 (unretrieved)
    # topic 2: ranked [d4, d5]; rel d5=1 only
    # topic 3: ranked [d6]; no relevant qrels -> excluded from output
    runs = spark.createDataFrame(
        [
            (1, "d1", 1),
            (1, "d2", 2),
            (1, "d3", 3),
            (2, "d4", 1),
            (2, "d5", 2),
            (3, "d6", 1),
        ],
        "qid int, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [
            (1, "d1", 3),
            (1, "d3", 1),
            (1, "d9", 2),
            (2, "d5", 1),
            (2, "d7", 0),  # judged non-relevant
            (3, "d6", 0),
        ],
        "qid int, doc_id string, rel int",
    )
    return runs, qrels


@pytest.mark.spark
class TestRetrievalMetrics:
    def test_hand_computed_topics(self, spark):
        from uci_searchengine_spark.operators.eval_metrics import (
            retrieval_metrics,
        )

        runs, qrels = _dfs(spark)
        rows = {
            r["qid"]: r
            for r in retrieval_metrics(runs, qrels, k=10).collect()
        }
        assert set(rows) == {1, 2}  # topic 3 has no relevant qrels

        t1 = rows[1]
        dcg = (2**3 - 1) / math.log2(2) + 0 + (2**1 - 1) / math.log2(4)
        idcg = (
            (2**3 - 1) / math.log2(2)
            + (2**2 - 1) / math.log2(3)
            + (2**1 - 1) / math.log2(4)
        )
        assert t1["n_ret"] == 3 and t1["n_rel"] == 3
        assert t1["recall_10"] == pytest.approx(2 / 3, abs=1e-6)
        assert t1["prec_10"] == pytest.approx(0.2, abs=1e-6)
        assert t1["mrr_10"] == pytest.approx(1.0, abs=1e-6)
        assert t1["ndcg_10"] == pytest.approx(dcg / idcg, abs=1e-6)

        t2 = rows[2]
        assert t2["n_rel"] == 1
        assert t2["recall_10"] == pytest.approx(1.0, abs=1e-6)
        assert t2["mrr_10"] == pytest.approx(0.5, abs=1e-6)
        # single relevant at rank 2: dcg = 1/log2(3), idcg = 1/log2(2)
        assert t2["ndcg_10"] == pytest.approx(
            math.log2(2) / math.log2(3), abs=1e-6
        )

    def test_k_truncation(self, spark):
        from uci_searchengine_spark.operators.eval_metrics import (
            retrieval_metrics,
        )

        runs, qrels = _dfs(spark)
        t1 = {
            r["qid"]: r for r in retrieval_metrics(runs, qrels, k=2).collect()
        }[1]
        # rank-3 hit (d3) falls outside k=2; idcg truncates to top-2 rels
        assert t1["recall_2"] == pytest.approx(1 / 3, abs=1e-6)
        idcg2 = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3)
        assert t1["ndcg_2"] == pytest.approx(7.0 / idcg2, abs=1e-6)

    def test_macro_means(self, spark):
        from uci_searchengine_spark.operators.eval_metrics import (
            macro_metrics,
            retrieval_metrics,
        )

        runs, qrels = _dfs(spark)
        per = retrieval_metrics(runs, qrels, k=10)
        m = macro_metrics(per, k=10).collect()[0]
        vals = {r["qid"]: r for r in per.collect()}
        assert m["n_topics"] == 2
        assert m["mean_mrr_10"] == pytest.approx(
            (vals[1]["mrr_10"] + vals[2]["mrr_10"]) / 2, abs=1e-6
        )

    def test_duckdb_mirror(self, spark):
        import duckdb

        from uci_searchengine_spark.operators.eval_metrics import (
            retrieval_metrics,
            retrieval_metrics_sql,
        )

        runs, qrels = _dfs(spark)
        got = sorted(
            map(tuple, retrieval_metrics(runs, qrels, k=10).collect())
        )
        con = duckdb.connect()
        con.register("runs_t", runs.toPandas())
        con.register("qrels_t", qrels.toPandas())
        sql = retrieval_metrics_sql(
            "SELECT * FROM runs_t", "SELECT * FROM qrels_t", k=10
        )
        exp = sorted(map(tuple, con.execute(sql).fetchall()))
        assert got == exp


@pytest.mark.spark
class TestCompareRuns:
    def test_paired_t_vs_scipy_free_reference(self, spark):
        """t statistic and win/loss bookkeeping vs a hand-computed
        paired reference (reversal helps one topic, hurts the other)."""
        import math

        from uci_searchengine_spark.operators.eval_metrics import (
            compare_runs,
            retrieval_metrics,
        )

        runs_a, qrels = _dfs(spark)
        # run B: reverse each topic's ranking
        maxr = {1: 3, 2: 2, 3: 1}
        rows_b = [
            (r["qid"], r["doc_id"], maxr[r["qid"]] + 1 - r["rank"])
            for r in runs_a.collect()
        ]
        runs_b = spark.createDataFrame(
            rows_b, "qid int, doc_id string, rank int"
        )
        pa = retrieval_metrics(runs_a, qrels, k=10)
        pb = retrieval_metrics(runs_b, qrels, k=10)
        got = compare_runs(pa, pb, "ndcg_10").collect()[0]

        va = {r["qid"]: r["ndcg_10"] for r in pa.collect()}
        vb = {r["qid"]: r["ndcg_10"] for r in pb.collect()}
        diffs = [va[q] - vb[q] for q in sorted(va)]
        n = len(diffs)
        mean = sum(diffs) / n
        sd = math.sqrt(sum((d - mean) ** 2 for d in diffs) / (n - 1))
        assert got["n_topics"] == n == 2
        assert got["mean_diff"] == pytest.approx(mean, abs=1e-6)
        assert got["t_stat"] == pytest.approx(
            mean / (sd / math.sqrt(n)), abs=1e-5
        )
        exp_w = sum(d > 0 for d in diffs)
        exp_l = sum(d < 0 for d in diffs)
        assert (got["wins"], got["losses"], got["ties"]) == (
            exp_w,
            exp_l,
            n - exp_w - exp_l,
        )

    def test_identical_runs_all_ties(self, spark):
        from uci_searchengine_spark.operators.eval_metrics import (
            compare_runs,
            retrieval_metrics,
        )

        runs, qrels = _dfs(spark)
        p = retrieval_metrics(runs, qrels, k=10)
        got = compare_runs(p, p, "mrr_10").collect()[0]
        assert got["t_stat"] is None  # zero-variance: undefined, not inf
        assert got["mean_diff"] == 0.0
        assert got["wins"] == got["losses"] == 0
        assert got["ties"] == got["n_topics"]
