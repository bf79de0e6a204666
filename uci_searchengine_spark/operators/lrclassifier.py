"""Trained quality classifier — the missing canonical stage of the
modern pretraining pipeline (GPT-3 Appendix A, LLaMA: a linear
classifier over bag-of-words features separating a trusted reference
slice from raw crawl; docs are kept by score, often with the
``np.random.pareto`` acceptance trick). The heuristics
(`functions/textstats`) and the reference-LM perplexity
(`operators/lm_quality`) are the UNSUPERVISED quality signals; this is
the supervised one.

Logistic regression over HASHED token counts (the fastText /
hashing-trick shape — the feature space is fixed at ``dim`` so the
model is a dim-length weight vector, never vocab-sized):

* features: x_f = count of tokens hashing to f (salted md5 % dim) —
  an in-row fold, exact integers, engine-portable;
* scoring: p = σ(w·x + b) — one in-row dot product per doc against a
  LITERAL weight vector (the model rides in the plan, not a join);
* training: full-batch gradient descent — each iteration is ONE
  map-combined aggregate producing the dim-length gradient
  Σ (p_i − y_i)·x_i / n (+ L2), the driver updates w and ROUNDS it
  (pinned) so a resumed job and a cross-engine mirror walk the same
  trajectory. ⌈iters⌉ passes over the corpus, the same driver-loop
  contract as ``clustering.kmeans_fit`` and ``bpe.bpe_train``.

Scale shape: the gradient is a dim-length array summed map-side
(``F.aggregate`` partials combine associatively under
``array zip_with +``) — one tiny exchange per iteration regardless of
corpus size; scoring is a scan projection. At 100 TB train on a
sampled slice (the published pipelines use ~10^5–10^7 docs) and score
everything.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 64
FEAT_SALT = "lrfeat"
ROUND_DIGITS = 9  # weights rounded per iteration: pinned trajectory


def feature_id(tok: Column, dim: int, salt: str = FEAT_SALT) -> Column:
    """Salted md5-based hash bucket of a token — first 8 hex chars as
    u32 mod dim (portable: DuckDB mirrors it with the same md5)."""
    h = F.conv(
        F.substring(F.md5(F.concat(tok, F.lit(":" + salt))), 1, 8), 16, 10
    ).cast("long")
    return (h % F.lit(dim)).cast("int")


def feature_id_sql(tok_expr: str, dim: int, salt: str = FEAT_SALT) -> str:
    """DuckDB mirror of :func:`feature_id`."""
    return (
        f"(CAST(('0x' || substr(md5({tok_expr} || ':{salt}'), 1, 8)) "
        f"AS UBIGINT) % {dim})"
    )


def hashed_counts(toks: Column, dim: int, salt: str = FEAT_SALT) -> Column:
    """array<long> of length ``dim``: hashed token counts for one doc —
    one in-row fold, no explode."""
    zero = F.array_repeat(F.lit(0).cast("long"), dim)
    return F.aggregate(
        toks,
        zero,
        lambda acc, t: F.transform(
            acc,
            lambda v, i: F.when(
                i == feature_id(t, dim, salt), v + F.lit(1)
            ).otherwise(v),
        ),
    )


def lr_score(x: Column, weights: "list[float]", bias: float) -> Column:
    """σ(w·x + b) for one doc's feature array — in-row literal dot."""
    w = F.array(*[F.lit(float(v)) for v in weights])
    z = (
        F.aggregate(
            F.zip_with(x, w, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        + F.lit(float(bias))
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_docs(
    toks: DataFrame,
    weights: "list[float]",
    bias: float,
    id_col: str = "doc_id",
    toks_col: str = "t",
    dim: "int | None" = None,
    digits: int = 6,
) -> DataFrame:
    """(id, score) for every doc under a fixed model — scan projection,
    score rounded to ``digits`` (σ is transcendental; the last ulps are
    libm noise, same convention as the perplexity gates)."""
    d = dim or len(weights)
    if d != len(weights):
        raise ValueError("dim must equal len(weights)")
    x = hashed_counts(F.col(toks_col), d)
    return toks.select(
        F.col(id_col).alias("id"),
        F.round(lr_score(x, weights, bias), digits).alias("score"),
    )


def gradient(
    toks: DataFrame,
    label_col: str,
    weights: "list[float]",
    bias: float,
    toks_col: str = "t",
    l2: float = 0.0,
) -> "tuple[list[float], float, int]":
    """One full-batch gradient: (grad_w[dim], grad_b, n) where
    grad = Σ (σ(w·x+b) − y)·x / n + l2·w. ONE map-combined aggregate —
    the shuffled row is a dim-length array, corpus-size-independent."""
    dim = len(weights)
    x = hashed_counts(F.col(toks_col), dim)
    y = F.col(label_col).cast("double")
    p = lr_score(x, weights, bias)
    row = toks.select(x.alias("g"), (p - y).alias("e"))
    # per-component sums: ordinary map-combined aggregates (partial
    # sums merge in the combiner), one pass, no collect_list buffer
    agg = row.agg(
        *[
            F.sum(
                F.element_at(F.col("g"), i + 1).cast("double") * F.col("e")
            ).alias(f"g{i}")
            for i in range(dim)
        ],
        F.sum("e").alias("gb"),
        F.count("*").alias("n"),
    ).collect()[0]
    n = agg["n"] or 1
    gw = [agg[f"g{i}"] / n + l2 * weights[i] for i in range(dim)]
    return gw, agg["gb"] / n, agg["n"]


def train_lr(
    toks: DataFrame,
    label_col: str,
    dim: int = DEFAULT_DIM,
    iters: int = 5,
    lr: float = 0.5,
    l2: float = 0.0,
    toks_col: str = "t",
) -> "tuple[list[float], float]":
    """Full-batch GD from w=0, b=0 — with the zero start the first
    iteration's σ is exactly 0.5, so the first gradient is pure
    integer arithmetic (the cross-engine-exact slice the gate pins).
    Weights are rounded to ``ROUND_DIGITS`` after every update, so the
    trajectory is deterministic under any partitioning or engine."""
    w, b = [0.0] * dim, 0.0
    for _ in range(iters):
        gw, gb, _n = gradient(toks, label_col, w, b, toks_col, l2)
        w = [round(wi - lr * gi, ROUND_DIGITS) for wi, gi in zip(w, gw)]
        b = round(b - lr * gb, ROUND_DIGITS)
    return w, b
