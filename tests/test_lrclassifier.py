"""Trained quality classifier (operators/lrclassifier.py) vs a pure
numpy full-batch GD reference — identical trajectory (the per-iteration
weight rounding pins it), planted-class separation, and the exact
first-gradient slice."""

import hashlib
import math
import random

import numpy as np
import pytest

from uci_searchengine_spark.operators.lrclassifier import (
    ROUND_DIGITS,
    feature_id,  # noqa: F401  (API surface)
    gradient,
    hashed_counts,
    score_docs,
    train_lr,
)

GOOD = ["alpha", "beta", "gamma", "delta"]
BAD = ["zork", "quux", "blarg", "wibble"]


def _fid(tok, dim, salt="lrfeat"):
    return int(hashlib.md5(f"{tok}:{salt}".encode()).hexdigest()[:8], 16) % dim


def _docs(rng, n=60):
    out = []
    for i in range(n):
        y = i % 2
        pool = GOOD if y else BAD
        toks = [rng.choice(pool) for _ in range(rng.randrange(3, 12))]
        out.append((i, toks, y))
    return out


def _np_train(docs, dim, iters, lr):
    X = np.zeros((len(docs), dim))
    Y = np.zeros(len(docs))
    for r, (_i, toks, y) in enumerate(docs):
        for t in toks:
            X[r, _fid(t, dim)] += 1
        Y[r] = y
    w, b = np.zeros(dim), 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        gw = X.T @ (p - Y) / len(docs)
        gb = float(np.sum(p - Y)) / len(docs)
        w = np.round(w - lr * gw, ROUND_DIGITS)
        b = round(b - lr * gb, ROUND_DIGITS)
    return w, b


def test_hashed_counts_and_first_gradient_exact(spark):
    from pyspark.sql import functions as F

    rng = random.Random(3)
    docs = _docs(rng, n=40)
    dim = 8
    df = spark.createDataFrame(
        [(i, t, y) for i, t, y in docs], "doc_id long, t array<string>, y int"
    )
    got = {
        r["doc_id"]: r["hc"]
        for r in df.select(
            "doc_id", hashed_counts(F.col("t"), dim).alias("hc")
        ).collect()
    }
    for i, toks, _y in docs:
        want = [0] * dim
        for t in toks:
            want[_fid(t, dim)] += 1
        assert got[i] == want
    # first gradient from zero start: exact dyadic arithmetic
    gw, gb, n = gradient(df, "y", [0.0] * dim, 0.0)
    X = np.zeros((len(docs), dim))
    Y = np.zeros(len(docs))
    for r, (_i, toks, y) in enumerate(docs):
        for t in toks:
            X[r, _fid(t, dim)] += 1
        Y[r] = y
    want_gw = X.T @ (0.5 - Y) / len(docs)
    assert n == len(docs)
    assert gw == pytest.approx(list(want_gw), abs=0)  # exact
    assert gb == pytest.approx(float(np.sum(0.5 - Y)) / len(docs), abs=0)


def test_train_matches_numpy_trajectory_and_separates(spark):
    rng = random.Random(5)
    docs = _docs(rng, n=60)
    # dim 32: the GOOD and BAD vocab hash to disjoint buckets (verified
    # in-test below), so a few GD steps must separate the classes; at
    # dim 8 deliberate collisions exist and separation is NOT expected
    dim = 32
    good_f = {_fid(w, dim) for w in GOOD}
    bad_f = {_fid(w, dim) for w in BAD}
    assert not (good_f & bad_f)
    df = spark.createDataFrame(
        [(i, t, y) for i, t, y in docs], "doc_id long, t array<string>, y int"
    )
    w, b = train_lr(df, "y", dim=dim, iters=4, lr=0.5)
    wr, br = _np_train(docs, dim, iters=4, lr=0.5)
    assert w == pytest.approx(list(wr), abs=1e-9)
    assert b == pytest.approx(br, abs=1e-9)
    # the trained model separates the planted classes
    scores = {
        r["id"]: r["score"]
        for r in score_docs(df, w, b, dim=dim).collect()
    }
    pos = [scores[i] for i, _t, y in docs if y == 1]
    neg = [scores[i] for i, _t, y in docs if y == 0]
    assert min(pos) > max(neg)


def test_partition_invariance(spark):
    rng = random.Random(7)
    docs = _docs(rng, n=50)
    dim = 8
    df1 = spark.createDataFrame(
        [(i, t, y) for i, t, y in docs], "doc_id long, t array<string>, y int"
    ).repartition(1)
    df7 = spark.createDataFrame(
        [(i, t, y) for i, t, y in docs], "doc_id long, t array<string>, y int"
    ).repartition(7)
    assert train_lr(df1, "y", dim=dim, iters=3) == train_lr(
        df7, "y", dim=dim, iters=3
    )


def test_score_docs_guard(spark):
    df = spark.createDataFrame([(0, ["a"])], "doc_id long, t array<string>")
    with pytest.raises(ValueError):
        score_docs(df, [0.1, 0.2], 0.0, dim=5)
