"""Exact duplicated-span detection: the span-union identity vs a
brute-force set union, corpus semantics (within-doc repeats count,
short docs excluded), and determinism under repartitioning."""

import pytest


def brute_union(starts, n):
    s = set()
    for p in starts:
        s.update(range(p, p + n))
    return len(s)


@pytest.mark.spark
class TestSpanDedup:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_vs_brute_force(self, spark):
        from uci_searchengine_spark.operators.dedup import (
            duplicate_span_stats,
        )

        boiler = "one two three four five"
        rows = [
            (0, f"{boiler} alpha beta gamma"),          # dup span head
            (1, f"x y {boiler} z"),                     # dup span middle
            (2, f"{boiler} q {boiler}"),                # within-doc repeat
            (3, "totally unique words here only once"),
            (4, "tiny doc"),                            # < n tokens
        ]
        n = 5
        got = {
            r["id"]: (r["total_tokens"], r["dup_tokens"], r["dup_frac"])
            for r in duplicate_span_stats(
                self._docs(spark, rows), n=n
            ).collect()
        }
        # brute force: positional n-grams over all docs
        grams: dict[str, int] = {}
        doc_toks = {d: t.lower().split() for d, t in rows}
        doc_pos: dict[int, list[int]] = {}
        for d, toks in doc_toks.items():
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                grams[g] = grams.get(g, 0) + 1
        for d, toks in doc_toks.items():
            starts = [
                i
                for i in range(len(toks) - n + 1)
                if grams[" ".join(toks[i : i + n])] >= 2
            ]
            if starts:
                doc_pos[d] = starts
        assert set(got) == set(doc_pos)
        for d, starts in doc_pos.items():
            toks = doc_toks[d]
            assert got[d][0] == len(toks)
            assert got[d][1] == brute_union(starts, n), (d, starts)
            assert got[d][2] == round(got[d][1] / len(toks), 6)

    def test_within_doc_repeat_counts(self, spark):
        from uci_searchengine_spark.operators.dedup import (
            duplicate_span_stats,
        )

        # the repeated span exists in ONE doc only — still duplicated
        rows = [(0, "a b c d e zz a b c d e"), (1, "other words")]
        got = duplicate_span_stats(
            self._docs(spark, rows), n=5
        ).collect()
        assert [r["id"] for r in got] == [0]
        assert got[0]["dup_tokens"] == 10  # two disjoint 5-windows

    def test_partition_invariance(self, spark):
        from uci_searchengine_spark.operators.dedup import (
            duplicate_span_stats,
        )

        base = "w" + " common phrase of many tokens" * 3
        rows = [(i, f"{base} tail{i % 3}") for i in range(40)]
        a = sorted(
            (r["id"], r["dup_tokens"])
            for r in duplicate_span_stats(
                self._docs(spark, rows).repartition(1), n=6
            ).collect()
        )
        b = sorted(
            (r["id"], r["dup_tokens"])
            for r in duplicate_span_stats(
                self._docs(spark, rows).repartition(13), n=6
            ).collect()
        )
        assert a == b and len(a) == 40
