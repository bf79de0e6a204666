"""CCNet paragraph-level dedup: first corpus-wide occurrence of a
paragraph wins (min (doc_id, pos)), later repeats are dropped even
within the same doc, docs rebuilt in original paragraph order, and the
deterministic token-chunk paragraph rule (incl. the sequence(0,-1)
empty-doc edge)."""

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
class TestParagraphDedup:
    def _run(self, spark, rows):
        from uci_searchengine_spark.operators.dedup import paragraph_dedup

        docs = spark.createDataFrame(
            rows, "doc_id long, paras array<string>"
        )
        return {
            r["doc_id"]: (r["n_kept"], r["text_dedup"])
            for r in paragraph_dedup(docs, F.col("paras")).collect()
        }

    def test_first_occurrence_wins(self, spark):
        got = self._run(
            spark,
            [
                (0, ["alpha beta", "boiler plate", "gamma"]),
                (1, ["boiler plate", "delta"]),  # repeat dropped
                (2, ["boiler plate"]),  # fully dropped -> absent
            ],
        )
        assert got == {
            0: (3, "alpha beta boiler plate gamma"),
            1: (1, "delta"),
        }

    def test_within_doc_repeat_dropped(self, spark):
        got = self._run(spark, [(0, ["x y", "z", "x y"])])
        assert got == {0: (2, "x y z")}

    def test_order_preserved_and_empty_ignored(self, spark):
        got = self._run(spark, [(0, ["c c", "", "a a", "b b"])])
        assert got == {0: (3, "c c a a b b")}

    def test_partition_invariance(self, spark):
        from uci_searchengine_spark.operators.dedup import paragraph_dedup

        rows = [
            (i, [f"unique {i}", "shared boiler", f"tail {i % 5}"])
            for i in range(60)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, paras array<string>"
        )
        a = sorted(
            (r["doc_id"], r["n_kept"], r["text_dedup"])
            for r in paragraph_dedup(
                docs.repartition(1), F.col("paras")
            ).collect()
        )
        b = sorted(
            (r["doc_id"], r["n_kept"], r["text_dedup"])
            for r in paragraph_dedup(
                docs.repartition(17), F.col("paras")
            ).collect()
        )
        assert a == b and len(a) == 60
        # doc 0 keeps all three paras; every other doc loses the boiler
        by_id = dict((d, n) for d, n, _ in a)
        assert by_id[0] == 3
        assert all(by_id[i] <= 3 for i in range(1, 60))
        assert sum(1 for i in range(60) if "shared boiler" in a[i][2]) == 1

    def test_token_chunks_col(self, spark):
        from uci_searchengine_spark.operators.dedup import token_chunks_col

        df = spark.createDataFrame(
            [(0, "a b c d e"), (1, "a b c"), (2, ""), (3, "x")],
            "doc_id long, text string",
        )
        toks = F.split(F.trim(F.col("text")), r"\s+")
        toks = F.filter(toks, lambda t: t != "")
        got = {
            r["doc_id"]: r["chunks"]
            for r in df.select(
                "doc_id", token_chunks_col(toks, 3).alias("chunks")
            ).collect()
        }
        assert got[0] == ["a b c", "d e"]
        assert got[1] == ["a b c"]
        assert got[2] == []  # empty doc must not emit a bogus chunk
        assert got[3] == ["x"]


def _py_cdc(tokens, mask=16):
    import hashlib

    out, cur = [], []
    for t in tokens:
        cur.append(t)
        if int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % mask == 0:
            out.append(" ".join(cur))
            cur = []
    if cur:
        out.append(" ".join(cur))
    return out


@pytest.mark.spark
class TestCDCChunks:
    def test_matches_python_reference(self, spark):
        from uci_searchengine_spark.operators.dedup import cdc_chunks_col

        rng = __import__("random").Random(5)
        rows = [
            (i, [f"w{rng.randrange(200)}" for _ in range(rng.randrange(1, 60))])
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "id long, t array<string>")
        got = {
            r["id"]: list(r["c"])
            for r in df.select(
                "id", cdc_chunks_col(F.col("t"), 16).alias("c")
            ).collect()
        }
        for i, toks in rows:
            assert got[i] == _py_cdc(toks, 16), i

    def test_resynchronizes_after_edit(self, spark):
        """The CDC property: prepending one token changes ONLY the
        first chunk's content — every later chunk hash survives
        (fixed-width frames would shift them all)."""
        from uci_searchengine_spark.operators.dedup import cdc_chunks_col

        rng = __import__("random").Random(9)
        base = [f"w{rng.randrange(500)}" for _ in range(400)]
        edited = ["inserted"] + base
        df = spark.createDataFrame(
            [(0, base), (1, edited)], "id long, t array<string>"
        )
        got = {
            r["id"]: list(r["c"])
            for r in df.select(
                "id", cdc_chunks_col(F.col("t"), 8).alias("c")
            ).collect()
        }
        a, b = got[0], got[1]
        # only the head chunk absorbs the edit: every chunk after the
        # first re-synchronizes EXACTLY (whether or not "inserted" is
        # itself a boundary token, the trailing chunks are identical)
        n = len(a) - 1
        assert a[-n:] == b[-n:]
        assert a != b
