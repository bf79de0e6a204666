"""HyperLogLog sketch: estimate accuracy vs exact distinct, register
merge property (union = element-wise max, rolling sub-sketches up ==
sketching the whole), grouped sketches, partition invariance, and the
DuckDB oracle mirror producing identical registers + estimate."""

import duckdb
import pytest
from pyspark.sql import functions as F


def _docs(spark, n, dup_every=3):
    # n rows, ~n/dup_every distinct keys, two groups
    rows = [
        (i, f"key-{i // dup_every}", "a" if i % 2 == 0 else "b")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "i long, k string, g string")


@pytest.mark.spark
class TestHLL:
    def test_accuracy_vs_exact(self, spark):
        from uci_searchengine_spark.operators.sketches import hll_distinct

        for n, p in [(3000, 8), (3000, 10), (20000, 10)]:
            df = _docs(spark, n)
            exact = df.select("k").distinct().count()
            est = hll_distinct(df, F.col("k"), p=p).collect()[0]["n_est"]
            m = 1 << p
            sigma = 1.04 / (m ** 0.5)
            assert abs(est - exact) / exact < 5 * sigma, (n, p, est, exact)

    def test_merge_is_max_and_lossless(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        df = _docs(spark, 4000)
        half_a = df.filter(F.col("i") < 2000)
        half_b = df.filter(F.col("i") >= 2000)
        merged = (
            hll_registers(half_a, F.col("k"), p=8)
            .union(hll_registers(half_b, F.col("k"), p=8))
            .groupBy("bucket")
            .agg(F.max("rho").alias("rho"))
        )
        whole = hll_registers(df, F.col("k"), p=8)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )
        est_m = hll_estimate(merged, p=8).collect()[0]["n_est"]
        est_w = hll_estimate(whole, p=8).collect()[0]["n_est"]
        assert est_m == est_w

    def test_grouped_rollup(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            hll_distinct,
            hll_estimate,
            hll_registers,
        )

        df = _docs(spark, 3000)
        per_g = {
            r["g"]: r["n_est"]
            for r in hll_distinct(
                df, F.col("k"), p=8, group_cols=["g"]
            ).collect()
        }
        assert set(per_g) == {"a", "b"}
        # rolling the per-group sketches up == sketching ungrouped
        rolled = (
            hll_registers(df, F.col("k"), p=8, group_cols=["g"])
            .groupBy("bucket")
            .agg(F.max("rho").alias("rho"))
        )
        est_rolled = hll_estimate(rolled, p=8).collect()[0]["n_est"]
        est_whole = hll_distinct(df, F.col("k"), p=8).collect()[0]["n_est"]
        assert est_rolled == est_whole

    def test_partition_invariance(self, spark):
        from uci_searchengine_spark.operators.sketches import hll_distinct

        df = _docs(spark, 2000)
        a = hll_distinct(df.repartition(1), F.col("k"), p=7).collect()[0]
        b = hll_distinct(df.repartition(13), F.col("k"), p=7).collect()[0]
        assert tuple(a) == tuple(b)

    def test_duckdb_mirror(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            hll_distinct,
            hll_sql,
        )

        df = _docs(spark, 1500)
        pdf = df.toPandas()
        con = duckdb.connect()
        con.register("t", pdf)
        got_sql = con.execute(hll_sql("k", "t", p=7)).fetchall()[0]
        got_spark = tuple(hll_distinct(df, F.col("k"), p=7).collect()[0])
        assert got_spark == got_sql
        # grouped mirror too
        sql_g = hll_sql("k", "t", p=7, group_cols=["g"])
        got_sql_g = sorted(con.execute(sql_g).fetchall())
        got_spark_g = sorted(
            map(
                tuple,
                hll_distinct(
                    df, F.col("k"), p=7, group_cols=["g"]
                ).collect(),
            )
        )
        assert got_spark_g == got_sql_g

    def test_cms_overestimates_and_is_tight_when_wide(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            cms_estimate,
            cms_table,
        )

        counts = spark.createDataFrame(
            [(f"t{i}", (i % 7) + 1) for i in range(300)],
            "term string, cnt long",
        )
        exact = {r["term"]: r["cnt"] for r in counts.collect()}
        sk = cms_table(counts, width=1 << 13, depth=4)
        est = {
            r["term"]: r["n_cms"]
            for r in cms_estimate(
                sk, counts.select("term"), width=1 << 13, depth=4
            ).collect()
        }
        assert set(est) == set(exact)
        assert all(est[t] >= exact[t] for t in exact)
        # 300 keys in 4x8192 cells: min-over-rows should be exact
        assert est == exact

    def test_cms_merge_by_cell_sum(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            cms_estimate,
            cms_table,
        )

        a = spark.createDataFrame(
            [("x", 5), ("y", 2)], "term string, cnt long"
        )
        b = spark.createDataFrame(
            [("x", 3), ("z", 7)], "term string, cnt long"
        )
        merged = (
            cms_table(a, width=256, depth=3)
            .union(cms_table(b, width=256, depth=3))
            .groupBy("r", "bucket")
            .agg(F.sum("c").alias("c"))
        )
        whole = cms_table(
            a.union(b).groupBy("term").agg(F.sum("cnt").alias("cnt")),
            width=256,
            depth=3,
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )
        q = spark.createDataFrame([("x",), ("z",)], "term string")
        est = {
            r["term"]: r["n_cms"]
            for r in cms_estimate(merged, q, width=256, depth=3).collect()
        }
        assert est["x"] >= 8 and est["z"] >= 7

    def test_cms_duckdb_mirror(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            cms_estimate,
            cms_sql,
            cms_table,
        )

        counts = spark.createDataFrame(
            [(f"k{i}", i + 1) for i in range(50)], "term string, cnt long"
        )
        con = duckdb.connect()
        con.register("kc0", counts.toPandas())
        sql = cms_sql(
            "SELECT term, cnt FROM kc0",
            "SELECT term FROM kc0 WHERE cnt > 40",
            width=128,
            depth=4,
        )
        got_sql = sorted(con.execute(sql).fetchall())
        sk = cms_table(counts, width=128, depth=4)
        got_spark = sorted(
            map(
                tuple,
                cms_estimate(
                    sk,
                    counts.filter(F.col("cnt") > 40).select("term"),
                    width=128,
                    depth=4,
                ).collect(),
            )
        )
        assert got_spark == got_sql

    def test_small_range_linear_counting(self, spark):
        from uci_searchengine_spark.operators.sketches import hll_distinct

        # 20 distinct keys, p=10: most registers empty -> ln branch
        df = _docs(spark, 60, dup_every=3)
        est = hll_distinct(df, F.col("k"), p=10).collect()[0]["n_est"]
        assert abs(est - 20) <= 3


@pytest.mark.spark
class TestQuantileSketch:
    def _vals(self, spark, n=4000):
        # skewed values so quantiles are non-trivial; two groups
        rows = [(i, "a" if i % 2 == 0 else "b", float((i * i) % 977)) for i in range(n)]
        return spark.createDataFrame(rows, "id long, g string, x double")

    def test_accuracy_vs_exact(self, spark):
        from uci_searchengine_spark.operators.sketches import sampled_quantiles

        df = self._vals(spark)
        got = sampled_quantiles(df, "x", "id", theta=0.5).collect()[0]
        # rank error ~ 1/sqrt(theta*n) ≈ 0.022: the p50 estimate must
        # land inside the true [p45, p55] value band
        band = df.agg(
            F.percentile("x", F.lit(0.45)).alias("lo"),
            F.percentile("x", F.lit(0.55)).alias("hi"),
        ).collect()[0]
        assert band["lo"] <= got["p50"] <= band["hi"], got["p50"]
        assert got["n_sample"] == pytest.approx(2000, rel=0.1)

    def test_union_merge_and_down_merge(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            quantile_estimate,
            quantile_sample,
        )

        df = self._vals(spark)
        a, b = df.filter("id < 2000"), df.filter("id >= 2000")
        whole = quantile_sample(df, "x", "id", theta=0.5)
        parts = quantile_sample(a, "x", "id", theta=0.5).unionByName(
            quantile_sample(b, "x", "id", theta=0.5)
        )
        # union of part-sketches == sketch of the union, row-exact
        assert sorted(map(tuple, whole.collect())) == sorted(
            map(tuple, parts.collect())
        )
        # down-merge: tightening theta is a filter on the sketch itself
        tight = quantile_sample(df, "x", "id", theta=0.25)
        assert sorted(map(tuple, whole.filter("u < 0.25").collect())) == sorted(
            map(tuple, tight.collect())
        )
        est = quantile_estimate(whole.filter("u < 0.25")).collect()
        est2 = quantile_estimate(tight).collect()
        assert sorted(map(tuple, est)) == sorted(map(tuple, est2))

    def test_grouped_and_duckdb_mirror(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            sampled_quantiles,
            sampled_quantiles_sql,
        )

        df = self._vals(spark)
        got = sorted(
            map(
                tuple,
                sampled_quantiles(
                    df, "x", "id", theta=0.5, group_cols=["g"]
                ).collect(),
            )
        )
        con = duckdb.connect()
        con.register("tbl", df.toPandas())
        sql = sampled_quantiles_sql(
            "SELECT * FROM tbl", "x", "id", theta=0.5, group_cols=["g"]
        )
        exp = sorted(map(tuple, con.execute(sql).fetchall()))
        assert got == exp


@pytest.mark.spark
class TestBloom:
    M, K = 1 << 10, 3

    def _words(self, spark, keys):
        from uci_searchengine_spark.operators.sketches import bloom_words

        df = spark.createDataFrame([(k,) for k in keys], "k string")
        return bloom_words(df, "k", self.M, self.K)

    def _hits(self, spark, words, probes):
        from uci_searchengine_spark.operators.sketches import bloom_hit

        df = spark.createDataFrame([(p,) for p in probes], "k string")
        out = bloom_hit(df, "k", words, self.M, self.K)
        return {r["k"]: r["bloom_hit"] for r in out.collect()}

    def test_no_false_negatives(self, spark):
        keys = [f"url-{i}" for i in range(400)]
        hits = self._hits(spark, self._words(spark, keys), keys)
        assert all(hits[k] for k in keys)

    def test_false_positive_rate_bounded(self, spark):
        keys = [f"url-{i}" for i in range(200)]
        words = self._words(spark, keys)
        others = [f"other-{i}" for i in range(500)]
        hits = self._hits(spark, words, others)
        fp = sum(hits.values())
        # n=200, m=1024, k=3 -> theoretical fp ~ (1-e^-0.586)^3 ~ 0.087;
        # allow generous slack, but it must prune the bulk
        assert fp / len(others) < 0.25, fp

    def test_merge_is_bit_or(self, spark):
        # bloom(A) OR bloom(B) == bloom(A u B): partial filters from
        # different partitions/batches union losslessly
        a = [f"k-{i}" for i in range(150)]
        b = [f"k-{i}" for i in range(100, 300)]
        merged = (
            self._words(spark, a)
            .union(self._words(spark, b))
            .groupBy("wi")
            .agg(F.expr("bit_or(wv)").alias("wv"))
        )
        whole = self._words(spark, a + b)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, whole.collect())
        )

    def test_word_table_bounded(self, spark):
        # however many keys, the sketch is at most m/64 words
        keys = [f"k-{i}" for i in range(5000)]
        assert self._words(spark, keys).count() <= self.M // 64

    def test_duckdb_mirror_identical(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            bloom_hit,
            bloom_sql,
            bloom_words,
        )

        keys = spark.createDataFrame(
            [(f"d-{i}",) for i in range(0, 300, 2)], "bk string"
        )
        probe = spark.createDataFrame(
            [(f"d-{i}",) for i in range(300)], "pk string"
        )
        words = bloom_words(keys, "bk", self.M, self.K)
        sp = {
            r["pk"]: r["bloom_hit"]
            for r in bloom_hit(probe, "pk", words, self.M, self.K).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE bk AS SELECT 'd-' || (2*i)::VARCHAR AS bk "
            "FROM range(150) t(i)"
        )
        con.execute(
            "CREATE TABLE pk AS SELECT 'd-' || i::VARCHAR AS pk "
            "FROM range(300) t(i)"
        )
        sql = bloom_sql(
            "SELECT bk FROM bk",
            "SELECT pk FROM pk",
            "bk",
            "pk",
            self.M,
            self.K,
        )
        dk = {r[0]: r[1] for r in con.sql(sql).fetchall()}
        assert sp == dk


@pytest.mark.spark
class TestKMV:
    def test_estimate_accuracy(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            kmv_estimate,
            kmv_sketch,
        )

        n = 5000
        df = _docs(spark, n, dup_every=1)  # 5000 distinct keys
        est = kmv_estimate(
            kmv_sketch(df, F.col("k"), k=256), k=256
        ).collect()[0]
        assert est["n_kept"] == 256
        # k=256 → relative std error 1/sqrt(k-2) ≈ 6.3%; allow 4σ
        assert abs(est["n_est"] - n) / n < 0.25

    def test_exact_when_under_k(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            kmv_estimate,
            kmv_sketch,
        )

        df = _docs(spark, 300, dup_every=5)  # 60 distinct
        est = kmv_estimate(
            kmv_sketch(df, F.col("k"), k=256), k=256
        ).collect()[0]
        assert est["n_est"] == 60 and est["n_kept"] == 60

    def test_merge_equals_sketch_of_union(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            kmv_merge_col,
            kmv_sketch,
        )

        k = 64
        df = _docs(spark, 2000, dup_every=2)
        a = df.filter(F.col("g") == "a")
        b = df.filter(F.col("g") == "b")
        merged = (
            kmv_sketch(a, F.col("k"), k=k)
            .select(F.col("kmins").alias("ka"))
            .crossJoin(
                kmv_sketch(b, F.col("k"), k=k).select(
                    F.col("kmins").alias("kb")
                )
            )
            .select(kmv_merge_col(F.col("ka"), F.col("kb"), k).alias("m"))
            .collect()[0]["m"]
        )
        whole = kmv_sketch(df, F.col("k"), k=k).collect()[0]["kmins"]
        assert merged == whole  # lossless associative merge, exactly

    def test_partition_invariance(self, spark):
        from uci_searchengine_spark.operators.sketches import kmv_sketch

        df = _docs(spark, 1500, dup_every=3)
        one = kmv_sketch(df.repartition(1), F.col("k"), k=128).collect()[0][
            "kmins"
        ]
        many = kmv_sketch(df.repartition(16), F.col("k"), k=128).collect()[
            0
        ]["kmins"]
        assert one == many

    def test_theta_prefilter_is_transparent(self, spark):
        from uci_searchengine_spark.operators.sketches import kmv_sketch

        # with >= k survivors below theta the scan-side prune cannot
        # change the bottom k: theta=0.5 keeps ~1000 of ~2000 hashes
        df = _docs(spark, 2000, dup_every=1)
        full = kmv_sketch(df, F.col("k"), k=128).collect()[0]["kmins"]
        pruned = kmv_sketch(df, F.col("k"), k=128, theta=0.5).collect()[0][
            "kmins"
        ]
        assert pruned == full

    def test_jaccard_estimate_accuracy(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            kmv_jaccard_cols,
            kmv_sketch,
        )

        # A = keys 0..2999, B = keys 1500..4499 → J = 1500/4500 = 1/3
        rows_a = [(f"key-{i}",) for i in range(3000)]
        rows_b = [(f"key-{i}",) for i in range(1500, 4500)]
        a = spark.createDataFrame(rows_a, "k string")
        b = spark.createDataFrame(rows_b, "k string")
        k = 256
        res = (
            kmv_sketch(a, F.col("k"), k=k)
            .select(F.col("kmins").alias("ka"))
            .crossJoin(
                kmv_sketch(b, F.col("k"), k=k).select(
                    F.col("kmins").alias("kb")
                )
            )
        )
        cols = kmv_jaccard_cols(F.col("ka"), F.col("kb"), k)
        out = res.select(
            cols["union_est"].alias("u"),
            cols["inter_est"].alias("i"),
            cols["jaccard_est"].alias("j"),
        ).collect()[0]
        assert abs(out["u"] - 4500) / 4500 < 0.25
        assert abs(out["j"] - 1 / 3) < 0.12  # binomial(k, J) 4σ
        assert abs(out["i"] - 1500) / 1500 < 0.35

    def test_duckdb_mirror(self, spark):
        from uci_searchengine_spark.operators.sketches import (
            kmv_estimate,
            kmv_sketch,
            kmv_sql,
        )

        df = _docs(spark, 4000, dup_every=2)
        got = {
            (r["g"], r["n_est"], r["n_kept"])
            for r in kmv_estimate(
                kmv_sketch(df, F.col("k"), k=64, group_cols=["g"]),
                k=64,
                group_cols=["g"],
            ).collect()
        }
        con = duckdb.connect()
        con.register("t", df.toPandas())
        want = {
            tuple(r)
            for r in con.execute(
                kmv_sql("k", "t", k=64, group_cols=["g"])
            ).fetchall()
        }
        assert got == want
