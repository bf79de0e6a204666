"""Binary (sign) quantization: packing == numpy reference, Hamming ==
popcount, two-phase rerank recall vs exact cosine on the real
embeddings table, partition invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _pack_np(v):
    bits = (np.asarray(v) > 0).astype(np.int64)
    return [
        int((bits[w * 32 : (w + 1) * 32] << np.arange(32)).sum())
        for w in range(2)
    ]


@pytest.mark.spark
class TestBinaryQuant:
    def test_pack_matches_numpy(self, spark, emb):
        from uci_searchengine_spark.operators.similarity import (
            binary_quantize,
        )

        got = {
            r["vec_id"]: list(r["w"])
            for r in emb.select(
                "vec_id", binary_quantize(F.col("embedding"), DIM).alias("w")
            ).collect()
        }
        for r in emb.select("vec_id", "embedding").collect():
            assert got[r["vec_id"]] == _pack_np(r["embedding"]), r["vec_id"]

    def test_hamming_matches_popcount(self, spark, emb):
        from uci_searchengine_spark.operators.similarity import (
            binary_quantize,
            hamming_expr,
        )

        coded = emb.select(
            "vec_id", binary_quantize(F.col("embedding"), DIM).alias("w")
        )
        a = coded.filter(F.col("vec_id") < 20).alias("a")
        b = coded.filter(F.col("vec_id") < 20).alias("b")
        got = {
            (r["ia"], r["ib"]): r["h"]
            for r in a.crossJoin(b)
            .select(
                F.col("a.vec_id").alias("ia"),
                F.col("b.vec_id").alias("ib"),
                hamming_expr(F.col("a.w"), F.col("b.w")).alias("h"),
            )
            .collect()
        }
        rows = {
            r["vec_id"]: np.asarray(r["embedding"]) > 0
            for r in emb.filter(F.col("vec_id") < 20).collect()
        }
        for (ia, ib), h in got.items():
            assert h == int((rows[ia] != rows[ib]).sum()), (ia, ib)

    def test_rerank_recall_vs_exact(self, spark, emb):
        from uci_searchengine_spark.operators.similarity import (
            ann_bruteforce,
            hamming_rerank,
        )

        query = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
        got = [
            r["vec_id"]
            for r in hamming_rerank(
                emb, query, n_candidates=60, k=10
            ).collect()
        ]
        queries = emb.filter(F.col("vec_id") == 0).select(
            F.lit(0).alias("q_id"), F.col("embedding").alias("q_vec")
        )
        exact = [
            r["vec_id"]
            for r in ann_bruteforce(emb, queries, k=10).collect()
        ]
        # sign bits keep angular locality: wide-candidate rerank should
        # recover most of the exact top-10 (labelled clusters in the
        # synthetic table make this stable)
        overlap = len(set(got) & set(exact))
        assert overlap >= 6, (overlap, got, exact)

    def test_partition_invariance(self, spark, emb):
        from uci_searchengine_spark.operators.similarity import (
            hamming_rerank,
        )

        query = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
        one = [
            tuple(r)
            for r in hamming_rerank(emb.coalesce(1), query).collect()
        ]
        many = [
            tuple(r)
            for r in hamming_rerank(emb.repartition(13), query).collect()
        ]
        assert one == many
