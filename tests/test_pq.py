"""Product quantization: encode ≡ numpy reference, ADC scoring ≡ table
lookups, exactness when vectors sit on codewords, recall vs exact dot
ranking on the real embeddings table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.mark.spark
class TestPQ:
    def test_encode_matches_numpy(self, spark, emb):
        from uci_searchengine_spark.operators.similarity import (
            pq_codebooks,
            pq_encode,
        )

        books = pq_codebooks(emb, m=4, k=16)
        got = {
            r["vec_id"]: list(r["codes"])
            for r in pq_encode(emb, books).select("vec_id", "codes").collect()
        }
        rows = emb.select("vec_id", "embedding").collect()
        m, k, dsub = books.shape
        for r in rows:
            v = np.asarray(r["embedding"], dtype=np.float64)
            exp = [
                int(
                    (((v[j * dsub : (j + 1) * dsub] - books[j]) ** 2).sum(1))
                    .argmin()
                )
                for j in range(m)
            ]
            assert got[r["vec_id"]] == exp, r["vec_id"]

    def test_adc_scores_and_exact_on_codewords(self, spark):
        from uci_searchengine_spark.operators.similarity import (
            pq_encode,
            pq_search,
        )

        # codebook with known codewords; vectors placed EXACTLY on them
        rng = np.random.RandomState(3)
        m, k, dsub = 2, 4, 3
        books = rng.randn(m, k, dsub)
        vecs = []
        for i in range(8):
            v = np.concatenate([books[j, (i + j) % k] for j in range(m)])
            vecs.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        codes = pq_encode(df, books)
        got_codes = {
            r["vec_id"]: list(r["codes"]) for r in codes.collect()
        }
        for i in range(8):
            assert got_codes[i] == [(i + j) % k for j in range(m)]
        q = spark.createDataFrame(
            [(0, vecs[5][1])], "q_id long, q_vec array<double>"
        )
        res = pq_search(codes, books, q, k=8).collect()
        # ADC == true dot product when vectors sit on codewords
        by_id = {r["vec_id"]: r["adc"] for r in res}
        qv = np.asarray(vecs[5][1])
        for i, v in vecs:
            if i in by_id:
                assert by_id[i] == pytest.approx(
                    float(qv @ np.asarray(v)), rel=1e-9
                )
        # ADC ranking == exact dot ranking (vectors ARE codewords)
        exact_order = sorted(
            (i for i, _v in vecs),
            key=lambda i: (-float(qv @ np.asarray(vecs[i][1])), i),
        )
        assert [r["vec_id"] for r in res] == exact_order

    def test_recall_vs_exact_dot(self, spark, emb):
        from uci_searchengine_spark.operators.similarity import (
            pq_codebooks,
            pq_encode,
            pq_search,
        )

        books = pq_codebooks(emb, m=16, k=64)
        codes = pq_encode(emb, books).cache()
        qs = emb.filter("vec_id < 3").select(
            F.col("vec_id").alias("q_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "q_vec"
            ),
        )
        got = pq_search(codes, books, qs, k=10).collect()
        rows = emb.select("vec_id", "embedding").collect()
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        ids = np.array([r["vec_id"] for r in rows])
        qrows = {r["q_id"]: np.asarray(r["q_vec"]) for r in qs.collect()}
        recalls = []
        for qid, qv in qrows.items():
            exact = set(ids[np.argsort(-(mat @ qv))[:10]])
            approx = {r["vec_id"] for r in got if r["q_id"] == qid}
            recalls.append(len(exact & approx) / 10)
        assert np.mean(recalls) >= 0.5, recalls

    def test_deterministic_across_partitionings(self, spark, emb):
        from uci_searchengine_spark.operators.similarity import pq_codebooks

        b1 = pq_codebooks(emb, m=4, k=16)
        b2 = pq_codebooks(emb.repartition(13), m=4, k=16)
        assert np.array_equal(b1, b2)
