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


@pytest.mark.spark
class TestMixture:
    def _docs(self, spark, parts=5):
        from pyspark.sql import functions as F

        # skewed token mass: domain d0 has ~8x the tokens of d3
        return (
            spark.range(0, 4000)
            .repartition(parts)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("d"), (F.col("id") % 4).cast("string")).alias(
                    "source"
                ),
                ((F.col("id") % 4) * -25 + 100 + F.col("id") % 7).alias("tok"),
            )
        )

    def test_weights_shape_and_binding_domain(self, spark):
        from uci_searchengine_spark.operators.sampling import mixture_weights

        w = {r["domain"]: r for r in
             mixture_weights(self._docs(spark), "source", "tok").collect()}
        assert set(w) == {"d0", "d1", "d2", "d3"}
        fracs = {d: r["sample_frac"] for d, r in w.items()}
        assert all(0.0 < f <= 1.0 for f in fracs.values())
        # the token-poorest domain is binding (kept whole) under a
        # uniform target; the richest is cut the most
        assert fracs["d3"] == pytest.approx(1.0)
        assert fracs["d0"] == min(fracs.values())

    def test_applied_mix_matches_target(self, spark):
        from uci_searchengine_spark.operators.sampling import (
            apply_mixture,
            mixture_weights,
        )
        from pyspark.sql import functions as F

        docs = self._docs(spark)
        w = mixture_weights(docs, "source", "tok")
        kept = apply_mixture(docs, "source", "doc_id", w)
        toks = {
            r["source"]: r["t"]
            for r in kept.groupBy("source").agg(F.sum("tok").alias("t")).collect()
        }
        total = sum(toks.values())
        for share in (toks[d] / total for d in toks):
            assert share == pytest.approx(0.25, abs=0.03)

    def test_partition_invariance_and_explicit_target(self, spark):
        from uci_searchengine_spark.operators.sampling import (
            apply_mixture,
            mixture_weights,
        )

        tgt = {"d0": 0.5, "d1": 0.25, "d2": 0.25}  # d3 excluded -> frac 0
        a = mixture_weights(self._docs(spark, 1), "source", "tok", tgt)
        b = mixture_weights(self._docs(spark, 17), "source", "tok", tgt)
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb
        fr = {d: f for d, _t, f in ra}
        assert fr["d3"] == 0.0
        kept = apply_mixture(self._docs(spark), "source", "doc_id", a)
        assert kept.filter("source = 'd3'").count() == 0


@pytest.mark.spark
class TestTemperatureMixture:
    def _docs(self, spark, parts=8):
        from pyspark.sql import functions as F

        return (
            spark.range(0, 4000)
            .repartition(parts)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("d"), (F.col("id") % 4).cast("string")).alias(
                    "source"
                ),
                ((F.col("id") % 4) * -25 + 100 + F.col("id") % 7).alias("tok"),
            )
        )

    def test_matches_python_reference(self, spark):
        from uci_searchengine_spark.operators.sampling import (
            temperature_weights,
        )

        docs = self._docs(spark)
        totals = {
            r["source"]: r["t"]
            for r in docs.groupBy("source").sum("tok")
            .withColumnRenamed("sum(tok)", "t").collect()
        }
        for tau in (1.0, 2.0, 100.0):
            got = {
                r["domain"]: r["sample_frac"]
                for r in temperature_weights(docs, "source", "tok", tau)
                .collect()
            }
            st = sum(v ** (1.0 / tau) for v in totals.values())
            sn = sum(totals.values())
            ratios = {
                d: (v ** (1.0 / tau) / st) / (v / sn)
                for d, v in totals.items()
            }
            mx = max(ratios.values())
            for d in totals:
                assert got[d] == pytest.approx(ratios[d] / mx, rel=1e-9), (
                    d,
                    tau,
                )

    def test_temperature_limits(self, spark):
        """tau=1 keeps the natural mix (all fracs 1); large tau
        approaches the uniform-target mixture; fracs monotone in domain
        size (bigger domains cut harder)."""
        from uci_searchengine_spark.operators.sampling import (
            mixture_weights,
            temperature_weights,
        )

        docs = self._docs(spark)
        f1 = {
            r["domain"]: r["sample_frac"]
            for r in temperature_weights(docs, "source", "tok", 1.0).collect()
        }
        assert all(v == pytest.approx(1.0) for v in f1.values())
        fbig = {
            r["domain"]: r["sample_frac"]
            for r in temperature_weights(docs, "source", "tok", 1e6).collect()
        }
        funi = {
            r["domain"]: r["sample_frac"]
            for r in mixture_weights(docs, "source", "tok").collect()
        }
        for d in fbig:
            assert fbig[d] == pytest.approx(funi[d], rel=1e-3), d
        f2 = {
            r["domain"]: r["sample_frac"]
            for r in temperature_weights(docs, "source", "tok", 2.0).collect()
        }
        # d0 has the most tokens, d3 the fewest
        assert f2["d0"] < f2["d1"] < f2["d2"] < f2["d3"] == pytest.approx(1.0)

    def test_bad_tau_raises(self, spark):
        from uci_searchengine_spark.operators.sampling import (
            temperature_weights,
        )

        with pytest.raises(ValueError):
            temperature_weights(self._docs(spark), "source", "tok", 0.0)


def test_stratified_sample_exact(spark):
    """Exact quotas per stratum, value-determined winners (≡ python
    reference ranking by (hash, key)), under-quota passthrough,
    partition invariance, slack-retry path, and guards."""
    import hashlib

    from uci_searchengine_spark.operators.sampling import (
        stratified_sample_exact,
    )

    rows = [(i, "big" if i < 300 else ("mid" if i < 340 else "tiny"))
            for i in range(345)]
    df = spark.createDataFrame(rows, "k long, s string")

    def u(k):
        return int(
            hashlib.md5(f"{k}:strat".encode()).hexdigest()[:8], 16
        ) / 2**32

    def ref(n):
        out = []
        for s in ("big", "mid", "tiny"):
            ks = [k for k, g in rows if g == s]
            ks.sort(key=lambda k: (u(k), k))
            out += [(k, s) for k in ks[:n]]
        return sorted(out)

    for n in (10, 40):
        got = sorted(
            (r["k"], r["s"])
            for r in stratified_sample_exact(
                df, "s", n=n, key_col="k"
            ).collect()
        )
        assert got == ref(n), n
        from collections import Counter

        c = Counter(s for _, s in got)
        assert c["big"] == n and c["mid"] == min(n, 40)
        assert c["tiny"] == min(n, 5)
    # tight slack forces the widen loop; same value-determined answer
    got_tight = sorted(
        (r["k"], r["s"])
        for r in stratified_sample_exact(
            df, "s", n=40, key_col="k", slack=1.01
        ).collect()
    )
    assert got_tight == ref(40)
    # partition invariance
    got_p = sorted(
        (r["k"], r["s"])
        for r in stratified_sample_exact(
            df.repartition(7), "s", n=10, key_col="k"
        ).collect()
    )
    assert got_p == ref(10)
    import pytest as _pt

    with _pt.raises(ValueError):
        stratified_sample_exact(df, "s", n=0, key_col="k")
    with _pt.raises(ValueError):
        stratified_sample_exact(df, "s", n=5, key_col="k", slack=1.0)


def test_unimax_allocation(spark):
    """UNIMAX waterfilling vs a python iterative reference: exact
    budget conservation, cap respect, uniformity among unsaturated
    domains, the budget-exhaustion edge, and guards."""
    from uci_searchengine_spark.operators.sampling import (
        unimax_allocation,
    )

    rows = []
    sizes = {"a": 100, "b": 400, "c": 1000, "d": 5000, "e": 70}
    for dom, tot in sizes.items():
        rows.append((dom + "_doc", dom, tot))
    df = spark.createDataFrame(rows, "k string, dom string, toks long")

    def ref(budget, cap_mult):
        caps = {d: s * cap_mult for d, s in sizes.items()}
        alloc = {}
        remaining = dict(caps)
        b = budget
        while remaining and b > 1e-9:
            share = b / len(remaining)
            sat = {d: c for d, c in remaining.items() if c <= share}
            if not sat:
                for d in remaining:
                    alloc[d] = share
                b = 0
                break
            for d, c in sat.items():
                alloc[d] = c
                b -= c
                del remaining[d]
        for d in remaining:
            alloc.setdefault(d, remaining[d] if b <= 1e-9 else remaining[d])
        # domains never reached (b exhausted exactly): 0? cannot happen
        # with positive budget; exhaustion case: all get caps
        return {d: alloc.get(d, caps[d]) for d in sizes}

    import pytest as _pt

    for budget, capm in ((3000.0, 2.0), (800.0, 1.0), (100000.0, 3.0)):
        got = {
            r["domain"]: (r["alloc_tokens"], r["epochs"])
            for r in unimax_allocation(
                df, "dom", "toks", budget=budget, epoch_cap=capm
            ).collect()
        }
        want = ref(budget, capm)
        total_cap = sum(s * capm for s in sizes.values())
        for d in sizes:
            assert got[d][0] == _pt.approx(want[d], rel=1e-9), (
                budget, capm, d, got, want)
            assert got[d][0] <= sizes[d] * capm + 1e-6  # cap respected
            assert got[d][1] == _pt.approx(
                round(got[d][0] / sizes[d], 6), abs=1e-6
            )
        assert sum(v for v, _ in got.values()) == _pt.approx(
            min(budget, total_cap), rel=1e-9
        )
    with _pt.raises(ValueError):
        unimax_allocation(df, "dom", "toks", budget=0)
    with _pt.raises(ValueError):
        unimax_allocation(df, "dom", "toks", budget=10, epoch_cap=0)
