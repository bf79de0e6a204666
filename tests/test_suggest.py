"""Fuzzy suggestion vs a plain-Python oracle over the fixture vocab."""

import pytest


def _oracle_suggest(oracle, word, k=5, max_dist=2):
    import numpy as np

    def lev(a, b):
        m, n = len(a), len(b)
        dp = np.arange(n + 1)
        for i in range(1, m + 1):
            prev = dp.copy()
            dp[0] = i
            for j in range(1, n + 1):
                dp[j] = min(
                    prev[j] + 1,
                    dp[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
        return int(dp[n])

    w = word.lower()
    grams = {w[i : i + 3] for i in range(max(len(w) - 2, 1))}
    out = []
    for t, plist in oracle.postings.items():
        if not (len(w) - max_dist <= len(t) <= len(w) + max_dist):
            continue
        if len(w) >= 4:
            tg = {t[i : i + 3] for i in range(max(len(t) - 2, 1))}
            if not (tg & grams):
                continue
        d = lev(t, w)
        if d <= max_dist:
            out.append((t, len(plist), d))
    out.sort(key=lambda r: (r[2], -r[1], r[0]))
    return out[:k]


@pytest.mark.spark
class TestSuggest:
    @pytest.mark.parametrize("word", ["arbakk", "stap0", "arbnd", "xq"])
    def test_matches_oracle(self, spark, index_small, oracle_small, word):
        from uci_searchengine_spark.operators.suggest import suggest

        exp = _oracle_suggest(oracle_small, word)
        got = [
            (r["term"], r["df"], r["dist"])
            for r in suggest(spark, index_small, word).collect()
        ]
        assert got == exp, (word, got, exp)

    def test_finds_the_obvious_fix(self, spark, index_small):
        from uci_searchengine_spark.operators.suggest import suggest

        got = suggest(spark, index_small, "arbakk").collect()
        assert got and got[0]["term"] == "arbak" and got[0]["dist"] == 1


@pytest.mark.spark
class TestDidYouMean:
    def test_suggest_query_fixes_typos(self, spark, index_small):
        from uci_searchengine_spark.operators.suggest import suggest_query

        assert suggest_query(spark, index_small, "arbakk stop1") == "arbak stop1"
        assert suggest_query(spark, index_small, "stop0 arbak") is None  # all known
        assert suggest_query(spark, index_small, "qqqqqqqqqqqq") is None  # hopeless

    def test_envelope_did_you_mean(self, spark, index_small):
        from uci_searchengine_spark.operators.bm25 import search

        env = search(spark, index_small, "arbakk")
        assert env["total_results"] == 0
        assert env["did_you_mean"] == "arbak"
        ok = search(spark, index_small, env["did_you_mean"])
        assert ok["total_results"] > 0 and ok["did_you_mean"] is None


def _oracle_phrase_suggest(docs, w1, w2, k=3, alpha=0.1, max_dist=1):
    """Pure-Python mirror of phrase_suggest_pairs' add-α bigram LM."""
    import math
    from collections import Counter

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, dp[0] = dp[:], i
            for j in range(1, len(b) + 1):
                dp[j] = min(
                    prev[j] + 1,
                    dp[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
        return dp[-1]

    uni = Counter(t for d in docs for t in d)
    bi = Counter((d[i], d[i + 1]) for d in docs for i in range(len(d) - 1))
    n1, v = float(sum(uni.values())), float(len(uni))

    def cands(w):
        return [
            t
            for t in uni
            if t[0] == w[0]
            and abs(len(t) - len(w)) <= max_dist
            and lev(t, w) <= max_dist
        ]

    out = []
    for s1 in cands(w1):
        for s2 in cands(w2):
            sc = math.log((uni[s1] + alpha) / (n1 + alpha * v)) + math.log(
                (bi.get((s1, s2), 0) + alpha) / (uni[s1] + alpha * v)
            )
            out.append((f"{s1} {s2}", round(sc, 3)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


@pytest.mark.spark
class TestPhraseSuggest:
    DOCS = [
        ["data", "spark", "engine"],
        ["data", "spark"],
        ["data", "spark", "rocks"],
        ["data", "lake"],
        ["dart", "spork"],
    ] + [["date"]] * 10  # "date" individually dwarfs "data"

    def _toks(self, spark):
        return spark.createDataFrame(
            [(i, d) for i, d in enumerate(self.DOCS)], "id long, t array<string>"
        )

    @pytest.mark.parametrize("q", [("dta", "sprk"), ("date", "spork")])
    def test_matches_python_oracle(self, spark, q):
        from uci_searchengine_spark.operators.suggest import phrase_suggest_pairs

        exp = _oracle_phrase_suggest(self.DOCS, *q)
        got = [
            (r["suggestion"], round(r["score"], 3))
            for r in phrase_suggest_pairs(self._toks(spark), *q).collect()
        ]
        assert got == exp, (q, got, exp)

    def test_cooccurrence_beats_unigram_frequency(self, spark):
        # "date" is 3x more frequent than "data" but never precedes
        # "spark" — the whole-phrase LM must still put "data spark" first.
        from uci_searchengine_spark.operators.suggest import phrase_suggest_pairs

        # "dat" expands to both data and date (and dart)
        got = phrase_suggest_pairs(self._toks(spark), "dat", "sprk").collect()
        assert got and got[0]["suggestion"] == "data spark"


def test_noisy_channel_correct(spark):
    """Channel+context scoring vs a python reference, and the property
    the op exists for: a context-frequent candidate at equal edit
    distance outranks a context-rare one, while plain distance-df
    ranking cannot distinguish context."""
    import math
    from collections import Counter

    from uci_searchengine_spark.operators.lm_quality import (
        train_kn_bigram,
    )
    from uci_searchengine_spark.operators.suggest import (
        noisy_channel_correct,
    )

    ref_texts = [
        "the cat sat on the mat",
        "the cat ran to the cart",
        "the cat and the cat again",
    ]
    # typo 'cas': dist 1 to both 'cat' (frequent after 'the') and
    # 'cart'?  lev(cart,cas)=2; use vocab with a planted competitor
    vocab_words = ["cat", "car", "mat", "ran", "on", "the", "sat"]
    ref = spark.createDataFrame([(s,) for s in ref_texts], ["text"])
    vocab_df = spark.createDataFrame([(w,) for w in vocab_words], ["term"])
    hist, big, cont, nt, v = train_kn_bigram(ref)
    got = [
        (r["term"], r["dist"], r["lp"], r["score"])
        for r in noisy_channel_correct(
            vocab_df, hist, big, cont, nt, v, prev_word="the", typo="cas"
        ).collect()
    ]
    # python reference
    uni, bigc = Counter(), Counter()
    for s in ref_texts:
        t = s.split()
        uni.update(t)
        bigc.update(zip(t, t[1:]))
    cv = Counter(); n1h = Counter(); n1c = Counter()
    for (a, b), c in bigc.items():
        cv[a] += c; n1h[a] += 1; n1c[b] += 1
    nt_r, v_r = len(bigc), len(uni)
    denom = nt_r + v_r + 1
    assert (nt, v) == (nt_r, v_r)

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    def p(aw, bw):
        pc = (n1c.get(bw, 0) + 1.0) / denom
        if cv.get(aw, 0) > 0:
            return (
                max(bigc.get((aw, bw), 0) - 0.75, 0.0) / cv[aw]
                + 0.75 * n1h[aw] / cv[aw] * pc
            )
        return pc

    want = []
    for w in vocab_words:
        d = lev(w, "cas")
        if abs(len(w) - 3) <= 2 and d <= 2:
            lp = round(math.log(p("the", w)), 6)
            want.append((w, d, lp, round(lp - d, 6)))
    want.sort(key=lambda x: (-x[3], x[0]))
    assert got == want[:5]
    # context property: 'cat' (frequent after 'the') outranks 'car'
    # (same distance 1, unseen after 'the')
    ranks = {t: i for i, (t, *_rest) in enumerate(got)}
    assert ranks["cat"] < ranks["car"]
    with pytest.raises(ValueError):
        noisy_channel_correct(
            vocab_df, hist, big, cont, nt, v, "the", "cas", max_dist=0
        )


def test_symspell_plane_and_lookup(spark):
    """The deletion-plane path: in-row delete generation ≡ python,
    SymSpell's no-false-negative guarantee on random word pairs, plane
    size bound, and lookup ≡ the full levenshtein scan ranking —
    including an adversarial case the trigram heuristic drops."""
    import random as _r

    from uci_searchengine_spark.operators.suggest import (
        _delete_variants_py,
        _deletes_col,
        suggest_symspell,
        symspell_plane,
    )

    rng = _r.Random(37)
    words = list(
        {"".join(rng.choice("abcdx") for _ in range(rng.randrange(1, 9)))
         for _ in range(60)}
    )
    vocab_df = spark.createDataFrame(
        [(w, i + 1) for i, w in enumerate(sorted(words))], "term string, df long"
    )
    # in-row deletes == python
    got = {
        r["term"]: sorted(r["d"])
        for r in vocab_df.select(
            "term", _deletes_col("term", 2).alias("d")
        ).collect()
    }
    for w in words:
        assert got[w] == sorted(_delete_variants_py(w, 2)), w
        L = len(w)
        assert len(got[w]) <= 1 + L + L * (L - 1) // 2
    plane = symspell_plane(vocab_df, max_dist=2).cache()

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    # lookup == full-scan ranking for random typos + the adversarial
    # 4-char distance-2 edit ('abcd'→'axcy') the trigram filter drops
    typos = ["axcy", "abcd", "dxa", "abcdx"] + [
        "".join(rng.choice("abcdxy") for _ in range(rng.randrange(2, 8)))
        for _ in range(10)
    ]
    for typo in typos:
        want = sorted(
            (
                (lev(w, typo), -(i + 1), w)
                for i, w in enumerate(sorted(words))
                if lev(w, typo) <= 2
            ),
        )[:5]
        want = [(w, -negdf, d) for d, negdf, w in want]
        got_rows = [
            (r["term"], r["df"], r["dist"])
            for r in suggest_symspell(plane, typo, k=5).collect()
        ]
        assert got_rows == want, typo
    plane.unpersist()
    with pytest.raises(ValueError):
        symspell_plane(vocab_df, max_dist=3)
