"""DSIR importance resampling (operators/dsir.py) vs a brute-force
python reference: same md5 bucket hash, same add-λ bag models, same
deterministic Gumbel draw."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from uci_searchengine_spark.operators import dsir

B = 64
LAM = 1.0

RAW = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark joins shuffle data across the cluster"),
    (2, "la rapida volpe marrone salta sopra il cane"),
    (3, "the spark data cluster joins the quick data"),
    (4, "el perro rapido salta sobre la caja marrone"),
    (5, "quick data joins make the cluster shuffle data"),
    (6, "zzz qqq xxx vvv kkk jjj www yyy"),
    (7, "the dog and the fox share the quick data"),
]
TARGET_IDS = {0, 1, 3, 5, 7}  # the "english-reference-like" slice


def tokenize_py(s: str) -> list[str]:
    import re

    return re.findall(r"\w+", s.lower())


def grams_py(s: str) -> list[str]:
    t = tokenize_py(s)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def bucket_py(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def uniform_py(key: str, salt: str) -> float:
    h = hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8]
    return int(h, 16) / 4294967296.0


def brute_force(digits: int = 6):
    feats = {i: Counter(bucket_py(g) for g in grams_py(s)) for i, s in RAW}
    q = Counter()
    for c in feats.values():
        q.update(c)
    p = Counter()
    for i, s in RAW:
        if i in TARGET_IDS:
            p.update(bucket_py(g) for g in grams_py(s))
    tq, tp = sum(q.values()), sum(p.values())
    ratio = {
        b: math.log((p.get(b, 0) + LAM) / (tp + LAM * B))
        - math.log((cq + LAM) / (tq + LAM * B))
        for b, cq in q.items()
    }
    out = {}
    for i, c in feats.items():
        logw = round(sum(n * ratio[b] for b, n in c.items()), digits)
        g = -math.log(-math.log(uniform_py(str(i), "dsir")))
        out[i] = (logw, round(logw + g, digits))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = raw.filter(raw.doc_id.isin(*TARGET_IDS))
    return raw, target


def test_weights_match_brute_force(spark, frames):
    raw, target = frames
    want = brute_force()
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir.importance_weights(raw, target, n_buckets=B, lam=LAM).collect()
    }
    assert set(got) == set(want)
    for i, (logw, _key) in want.items():
        assert got[i] == pytest.approx(logw, abs=1e-6), i


def test_select_matches_brute_force_order(spark, frames):
    raw, target = frames
    want = brute_force()
    order = sorted(want, key=lambda i: (-want[i][1], i))
    got = dsir.dsir_select(raw, target, k=4, n_buckets=B, lam=LAM).collect()
    assert [r["doc_id"] for r in got] == order[:4]
    for r in got:
        assert r["key"] == pytest.approx(want[r["doc_id"]][1], abs=1e-6)


def test_target_like_beats_gibberish(spark, frames):
    """The point of DSIR: docs resembling the target distribution carry
    higher importance weights than out-of-distribution text."""
    raw, target = frames
    w = {
        r["doc_id"]: r["logw"]
        for r in dsir.importance_weights(raw, target, n_buckets=B, lam=LAM).collect()
    }
    assert w[3] > w[6]  # in-target-vocab doc beats gibberish
    assert w[5] > w[2]  # ... and beats the wrong-language doc


def test_partition_invariance(spark, frames):
    """The draw is content-hashed: the same k docs are selected no
    matter how the raw corpus is partitioned."""
    raw, target = frames
    a = dsir.dsir_select(raw, target, k=4, n_buckets=B).collect()
    b = dsir.dsir_select(raw.repartition(7), target, k=4, n_buckets=B).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]


def test_empty_and_single_token_docs(spark):
    """Docs with no grams (empty text) are excluded; single-token docs
    still carry their unigram feature."""
    raw = spark.createDataFrame(
        [(0, ""), (1, "solo"), (2, "two tokens here")],
        "doc_id long, text string",
    )
    w = {
        r["doc_id"]: r["logw"]
        for r in dsir.importance_weights(raw, raw, n_buckets=B).collect()
    }
    assert 0 not in w and 1 in w and 2 in w
