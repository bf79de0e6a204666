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
