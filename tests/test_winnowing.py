"""Winnowing fingerprinting (Schleimer/Wilkerson/Aiken 2003) and the
ES combined_fields weighted-field collapse: selection rule, density,
and the detection guarantee pinned against a pure-Python reference."""

import hashlib

import pytest


def _hash32(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16)


def winnow_py(tokens: list[str], k: int, w: int):
    """Reference: (n_grams, selected_positions, fingerprint_set) with
    the rightmost-min rule and the short-doc single-window fallback."""
    if len(tokens) == 0:
        return 0, set(), set()
    if len(tokens) < k:
        grams = [" ".join(tokens)]
    else:
        grams = [
            " ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)
        ]
    h = [_hash32(g) for g in grams]
    we = min(w, len(h))
    sel = set()
    for s in range(len(h) - we + 1):
        win = h[s : s + we]
        mn = min(win)
        # rightmost occurrence of the min
        pos = max(j for j in range(s, s + we) if h[j] == mn)
        sel.add(pos)
    return len(h), sel, {h[p] for p in sel}


@pytest.mark.spark
class TestWinnowing:
    def _run(self, spark, texts, k=5, w=4):
        import pandas as pd

        from uci_searchengine_spark.operators.dedup import winnow_fingerprints

        df = spark.createDataFrame(
            pd.DataFrame({"id": range(len(texts)), "text": texts})
        )
        return {
            r["id"]: r
            for r in winnow_fingerprints(df, "id", "text", k=k, w=w).collect()
        }

    def test_matches_python_reference(self, spark):
        texts = [
            "data spark join sort merge scan filter group key table row",
            "a b c d e",          # exactly k tokens -> 1 gram
            "a b c",              # < k tokens -> whole-doc gram
            "x x x x x x x x x",  # all-equal hashes: rightmost-min ties
            "spark data spark data spark data spark data spark data",
        ]
        got = self._run(spark, texts)
        for i, t in enumerate(texts):
            n_grams, sel, fps = winnow_py(t.split(), 5, 4)
            assert got[i]["n_grams"] == n_grams, t
            assert got[i]["n_fp"] == len(sel), t
            assert set(got[i]["fps"]) == fps, t

    def test_density_bound(self, spark):
        """Expected selected-position density is 2/(w+1); on a long
        pseudo-random stream the observed density must sit near it
        (loose band — this is the paper's headline property)."""
        import random

        rng = random.Random(7)
        vocab = [f"w{j}" for j in range(200)]
        toks = [rng.choice(vocab) for _ in range(4000)]
        got = self._run(spark, [" ".join(toks)], k=5, w=4)[0]
        density = got["n_fp"] / got["n_grams"]
        assert 0.25 < density < 0.55  # 2/(w+1) = 0.4

    def test_detection_guarantee(self, spark):
        """Any shared run of >= w+k-1 tokens yields a shared selected
        fingerprint — the property that makes winnowing a valid
        candidate generator for span dedup."""
        import random

        rng = random.Random(13)
        vocab = [f"w{j}" for j in range(500)]
        shared = [rng.choice(vocab) for _ in range(8)]  # w+k-1 = 8
        a = [rng.choice(vocab) for _ in range(60)] + shared + [
            rng.choice(vocab) for _ in range(60)
        ]
        b = [rng.choice(vocab) for _ in range(40)] + shared + [
            rng.choice(vocab) for _ in range(80)
        ]
        got = self._run(spark, [" ".join(a), " ".join(b)])
        assert set(got[0]["fps"]) & set(got[1]["fps"])

    def test_pairs_and_fp_cap(self, spark):
        """winnowing_pairs keeps only pairs sharing >= min_shared
        fingerprints, and the fp_cap guard drops boilerplate
        fingerprints BEFORE pairing (a fingerprint in every doc would
        otherwise emit O(n^2) rows)."""
        import pandas as pd

        from uci_searchengine_spark.operators.dedup import winnowing_pairs

        import random

        rng = random.Random(99)
        vocab = [f"w{j}" for j in range(500)]
        shared = [rng.choice(vocab) for _ in range(30)]
        boiler = [rng.choice(vocab) for _ in range(30)]
        texts = []
        # docs 0,1 true near-dups; every doc carries the boilerplate run
        for i in range(6):
            body = [rng.choice(vocab) for _ in range(40)]
            t = boiler + (shared if i < 2 else body) + [
                rng.choice(vocab) for _ in range(20)
            ]
            texts.append(" ".join(t))
        df = spark.createDataFrame(
            pd.DataFrame({"id": range(len(texts)), "text": texts})
        )
        # cap below 6 kills the boilerplate fingerprints -> only the
        # planted pair survives
        rows = winnowing_pairs(
            df, "id", "text", min_shared=2, fp_cap=5
        ).collect()
        assert {(r["a"], r["b"]) for r in rows} == {(0, 1)}
        # without the cap the boilerplate links every doc pair
        rows2 = winnowing_pairs(
            df, "id", "text", min_shared=2, fp_cap=10**9
        ).collect()
        assert len(rows2) == 15  # all C(6,2) pairs share the boiler run


@pytest.mark.spark
def test_combined_fields_weighted_stats(spark, tmp_path):
    """combined_fields merges weighted tf and weighted length into ONE
    pseudo-field with a single df: a title hit (weight 2) counts as
    tf=2 in the combined field, and a doc matching in both fields
    counts ONCE in df."""
    import math

    import pandas as pd

    from uci_searchengine_spark import entry_queries as eq

    # title = first 8 tokens. d0: 'data' in title only; d1: 'data' in
    # body only; d2: no match.
    pad = "big big big big big big big"  # 7 fillers
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                f"data {pad}",            # 8 tokens, all title
                f"table {pad} data",      # 9 tokens: title 8, body: data
                f"table {pad}",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [1] * 3,
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).coalesce(1).write.parquet(
        f"{sf}/documents.parquet"
    )
    out = {
        r["doc_id"]: r["score"]
        for r in eq.QUERIES["combined_fields"][0](spark, sf).collect()
    }
    assert set(out) == {0, 1}
    # hand-check d0: dlen0 = 2*8 = 16, dlen1 = 2*8+1 = 17, dlen2 = 16;
    # avgdl = 49/3; df('data') = 2 (one per doc, not per field), n=3
    n_docs, avgdl, dfv = 3.0, 49.0 / 3.0, 2.0
    idf = math.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)

    def bm25(tf, dlen):
        return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dlen / avgdl))

    assert abs(out[0] - round(bm25(2.0, 16.0), 6)) < 1e-9  # title hit tf=2
    assert abs(out[1] - round(bm25(1.0, 17.0), 6)) < 1e-9  # body hit tf=1
    assert out[0] > out[1]  # the weight does its job
