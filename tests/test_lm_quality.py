"""Reference-LM perplexity (operators/lm_quality.py) vs a brute-force
python bigram LM, plus the semantic property the filter exists for:
reference-like text scores lower perplexity than gibberish."""

import math
from collections import Counter

import pytest

from uci_searchengine_spark.functions.tokenize import tokenize_py
from uci_searchengine_spark.operators import lm_quality as lmq

ALPHA = 0.1

REF = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog sat together",
    "the cat and the dog ran home",
]
SCORED = [
    (0, "the cat sat on the rug"),        # reference-like
    (1, "rug the on sat dog"),            # shuffled — broken bigrams
    (2, "zyx qwv jjk plm"),               # full OOV gibberish
    (3, "word"),                          # single token: no bigrams
]


def _brute():
    uni: Counter = Counter()
    big: Counter = Counter()
    for s in REF:
        t = tokenize_py(s)
        uni.update(t)
        big.update(zip(t, t[1:]))
    v = len(uni)
    out = {}
    for i, s in SCORED:
        t = tokenize_py(s)
        if len(t) < 2:
            continue
        lps = [
            math.log((big.get((a, b), 0) + ALPHA) / (uni.get(a, 0) + ALPHA * v))
            for a, b in zip(t, t[1:])
        ]
        out[i] = (len(lps), round(math.exp(-sum(lps) / len(lps)), 6))
    return out


def test_perplexity_vs_brute_force(spark):
    ref = spark.createDataFrame([(s,) for s in REF], "text string")
    docs = spark.createDataFrame(SCORED, "doc_id long, text string")
    uni, big, v = lmq.train_bigram_lm(ref)
    got = {
        r["id"]: (r["n_bigrams"], r["ppl"])
        for r in lmq.perplexity(docs, uni, big, v, alpha=ALPHA).collect()
    }
    want = _brute()
    assert set(got) == set(want) == {0, 1, 2}  # doc 3 excluded (<2 tokens)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-9)
    # the property the filter exists for: reference-like text scores
    # far lower ppl than broken-order or OOV text. (Note: full-OOV
    # gibberish is BOUNDED at ppl = V under add-α — every step is the
    # uniform 1/V — while in-vocab shuffled text is penalized harder
    # because its seen histories have large c1 denominators. CCNet's
    # top-V/<unk> mapping exists exactly to fix that bound; pinned here
    # as the documented behaviour of the uncapped model.)
    assert got[0][1] < got[1][1] and got[0][1] < got[2][1]


def test_hash_join_path_matches_broadcast(spark):
    ref = spark.createDataFrame([(s,) for s in REF], "text string")
    docs = spark.createDataFrame(SCORED, "doc_id long, text string")
    uni, big, v = lmq.train_bigram_lm(ref)
    a = sorted(
        (r["id"], r["n_bigrams"], r["ppl"])
        for r in lmq.perplexity(docs, uni, big, v, alpha=ALPHA).collect()
    )
    b = sorted(
        (r["id"], r["n_bigrams"], r["ppl"])
        for r in lmq.perplexity(
            docs, uni, big, v, alpha=ALPHA, broadcast_model=False
        ).collect()
    )
    assert a == b


def test_vocab_cap_unk_model(spark):
    """The CCNet <unk> knob: cap the vocabulary at top-V, verify against
    a brute-force capped python LM, and confirm the cap removes the
    uncapped model's OOV ppl=V bound (gibberish now scores WORSE than
    reference-like text)."""
    cap = 5
    ref = spark.createDataFrame([(s,) for s in REF], "text string")
    docs = spark.createDataFrame(SCORED, "doc_id long, text string")
    uni, big, v = lmq.train_bigram_lm(ref, vocab_cap=cap)
    assert v <= cap + 1  # kept vocab + <unk>
    got = {
        r["id"]: (r["n_bigrams"], r["ppl"])
        for r in lmq.perplexity(
            docs, uni, big, v, alpha=ALPHA, vocab=lmq.vocab_from_uni(uni)
        ).collect()
    }

    # brute force: same top-V (count desc, term asc) + <unk> fold
    uni_c, big_c = Counter(), Counter()
    toks = [tokenize_py(s) for s in REF]
    for t in toks:
        uni_c.update(t)
    kept = set(
        w for w, _ in sorted(uni_c.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
    )
    m = lambda w: w if w in kept else "<unk>"  # noqa: E731
    uni_m, big_m = Counter(), Counter()
    for t in toks:
        mt = [m(w) for w in t]
        uni_m.update(mt)
        big_m.update(zip(mt, mt[1:]))
    vv = len(uni_m)
    assert vv == v
    import math as _math

    for i, s in SCORED:
        t = [m(w) for w in tokenize_py(s)]
        if len(t) < 2:
            assert i not in got
            continue
        lps = [
            _math.log(
                (big_m.get((a, b), 0) + ALPHA) / (uni_m.get(a, 0) + ALPHA * vv)
            )
            for a, b in zip(t, t[1:])
        ]
        want = round(_math.exp(-sum(lps) / len(lps)), 6)
        assert got[i][1] == pytest.approx(want, rel=1e-9), i
    # gibberish maps to <unk>-runs whose bigram counts are REAL (rare),
    # so it no longer enjoys the uniform 1/V escape
    assert got[0][1] < got[2][1]


def test_ppl_buckets_terciles(spark):
    """head/middle/tail assignment matches a numpy linear-interpolation
    tercile split (Spark percentile ≡ np.percentile linear), per group
    and globally."""
    import numpy as np

    rows = [(i, "g1" if i < 9 else "g2", float(10 + i)) for i in range(15)]
    scored = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
    got = {
        r["doc_id"]: r["bucket"]
        for r in lmq.ppl_buckets(scored, group_col="lang").collect()
    }
    for grp in ("g1", "g2"):
        vals = np.array([p for _, g, p in rows if g == grp])
        lo = round(float(np.percentile(vals, 100 / 3)), 6)
        hi = round(float(np.percentile(vals, 200 / 3)), 6)
        for i, g, p in rows:
            if g != grp:
                continue
            want = "head" if p <= lo else ("middle" if p <= hi else "tail")
            assert got[i] == want, (i, p, lo, hi)
    # global path (no group column)
    got_g = {
        r["doc_id"]: r["bucket"] for r in lmq.ppl_buckets(scored).collect()
    }
    vals = np.array([p for _, _, p in rows])
    lo = round(float(np.percentile(vals, 100 / 3)), 6)
    hi = round(float(np.percentile(vals, 200 / 3)), 6)
    for i, _, p in rows:
        want = "head" if p <= lo else ("middle" if p <= hi else "tail")
        assert got_g[i] == want


D = 0.75


def _brute_kn(discount=D, vocab_cap=None):
    """Pure-python interpolated KN with the pinned add-1 continuation
    smoothing, mirroring train_kn_bigram/kn_perplexity exactly."""
    uni: Counter = Counter()
    big: Counter = Counter()
    for s in REF:
        t = tokenize_py(s)
        uni.update(t)
        big.update(zip(t, t[1:]))
    if vocab_cap is not None:
        kept = {
            w
            for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[
                :vocab_cap
            ]
        }
        m = lambda w: w if w in kept else lmq.UNK
        big = Counter()
        for s in REF:
            t = [m(x) for x in tokenize_py(s)]
            big.update(zip(t, t[1:]))
        v = len({m(w) for w in uni})
    else:
        m = lambda w: w
        v = len(uni)
    cv = Counter()
    n1h = Counter()
    n1c = Counter()
    for (a, b), c in big.items():
        cv[a] += c
        n1h[a] += 1
        n1c[b] += 1
    nt = len(big)
    denom = nt + v + 1

    def pcont(w):
        return (n1c.get(w, 0) + 1.0) / denom

    def p(a, b):
        if cv.get(a, 0) > 0:
            return (
                max(big.get((a, b), 0) - discount, 0.0) / cv[a]
                + discount * n1h[a] / cv[a] * pcont(b)
            )
        return pcont(b)

    out = {}
    for i, s in SCORED:
        t = [m(x) for x in tokenize_py(s)]
        if len(t) < 2:
            continue
        lps = [math.log(p(a, b)) for a, b in zip(t, t[1:])]
        out[i] = (len(lps), round(math.exp(-sum(lps) / len(lps)), 6))
    return out


def test_kn_perplexity_vs_brute_force(spark):
    ref = spark.createDataFrame([(s,) for s in REF], ["text"])
    docs = spark.createDataFrame(SCORED, ["doc_id", "text"])
    hist, big, cont, nt, v = lmq.train_kn_bigram(ref)
    got = {
        r["id"]: (r["n_bigrams"], r["ppl"])
        for r in lmq.kn_perplexity(docs, hist, big, cont, nt, v).collect()
    }
    assert got == _brute_kn()
    # semantic property: reference-like < shuffled < OOV gibberish
    assert got[0][1] < got[1][1] < got[2][1]
    assert 3 not in got  # single-token doc excluded
    # hash-join path identical
    got_h = {
        r["id"]: (r["n_bigrams"], r["ppl"])
        for r in lmq.kn_perplexity(
            docs, hist, big, cont, nt, v, broadcast_model=False
        ).collect()
    }
    assert got_h == got


def test_kn_discount_zero_is_mle_on_seen(spark):
    """D=0 kills both the discount and the backoff weight: every seen
    bigram scores exactly c2/cv (pure MLE)."""
    ref = spark.createDataFrame([(s,) for s in REF], ["text"])
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat")], ["doc_id", "text"]
    )
    hist, big, cont, nt, v = lmq.train_kn_bigram(ref)
    got = lmq.kn_perplexity(
        docs, hist, big, cont, nt, v, discount=0.0
    ).collect()[0]
    uni, bigc = Counter(), Counter()
    for s in REF:
        t = tokenize_py(s)
        uni.update(t)
        bigc.update(zip(t, t[1:]))
    cv = Counter()
    for (a, _b), c in bigc.items():
        cv[a] += c
    t = tokenize_py("the cat sat on the mat")
    lps = [math.log(bigc[(a, b)] / cv[a]) for a, b in zip(t, t[1:])]
    assert got["ppl"] == round(math.exp(-sum(lps) / len(lps)), 6)


def test_kn_vocab_cap_matches_brute(spark):
    cap = 6
    ref = spark.createDataFrame([(s,) for s in REF], ["text"])
    docs = spark.createDataFrame(SCORED, ["doc_id", "text"])
    hist, big, cont, nt, v = lmq.train_kn_bigram(ref, vocab_cap=cap)
    # the scoring-side mapping set: top-cap unigrams of the reference
    uni = Counter()
    for s in REF:
        uni.update(tokenize_py(s))
    kept = [
        w
        for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:cap]
    ]
    vocab = spark.createDataFrame([(w,) for w in kept], ["v"])
    got = {
        r["id"]: (r["n_bigrams"], r["ppl"])
        for r in lmq.kn_perplexity(
            docs, hist, big, cont, nt, v, vocab=vocab
        ).collect()
    }
    assert got == _brute_kn(vocab_cap=cap)
