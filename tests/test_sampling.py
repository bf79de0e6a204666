"""Hash-based samplers: partition-invariant determinism — the property
df.sample() lacks — plus stratum fraction plausibility."""

import pytest


@pytest.mark.spark
class TestSampling:
    def _docs(self, spark, parts):
        from pyspark.sql import functions as F

        return (
            spark.range(0, 5000)
            .repartition(parts)
            .select(
                F.col("id").alias("doc_id"),
                F.element_at(
                    F.array(F.lit("en"), F.lit("de"), F.lit("zh")),
                    (F.col("id") % 3 + 1).cast("int"),
                ).alias("lang"),
            )
        )

    def test_partition_invariance(self, spark):
        from uci_searchengine_spark.operators.sampling import (
            stratified_sample,
            train_test_split,
        )

        fr = {"en": 0.2, "de": 0.6, "zh": 1.0}
        a = set(
            r["doc_id"]
            for r in stratified_sample(
                self._docs(spark, 1), "lang", fr, "doc_id"
            ).collect()
        )
        b = set(
            r["doc_id"]
            for r in stratified_sample(
                self._docs(spark, 13), "lang", fr, "doc_id"
            ).collect()
        )
        assert a == b and len(a) > 0

        sa = {
            r["doc_id"]: r["split"]
            for r in train_test_split(self._docs(spark, 1), "doc_id", 0.25).collect()
        }
        sb = {
            r["doc_id"]: r["split"]
            for r in train_test_split(self._docs(spark, 7), "doc_id", 0.25).collect()
        }
        assert sa == sb

    def test_fractions_plausible(self, spark):
        from pyspark.sql import functions as F

        from uci_searchengine_spark.operators.sampling import stratified_sample

        fr = {"en": 0.2, "de": 0.6, "zh": 1.0}
        got = {
            r["lang"]: r["n"]
            for r in stratified_sample(self._docs(spark, 4), "lang", fr, "doc_id")
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        # each stratum has ~1667 rows; md5-uniform keep-rate within ±25%
        for lang, frac in fr.items():
            exp = 5000 / 3 * frac
            assert abs(got.get(lang, 0) - exp) / exp < 0.25, (lang, got)
        # default fraction 0.0: unknown stratum fully dropped
        dropped = stratified_sample(
            self._docs(spark, 4).withColumn("lang", F.lit("xx")),
            "lang",
            fr,
            "doc_id",
        )
        assert dropped.count() == 0
