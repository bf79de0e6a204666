"""Late-interaction (multi-vector) retrieval: ColBERT MaxSim scoring.

Khattab & Zaharia 2020 (ColBERT): a document is a BAG of token
vectors, not one pooled vector; the query is a small bag too, and
relevance is ``Σ_{q ∈ query} max_{d ∈ doc} q·d`` — each query token
finds its best-matching document token and the per-token maxima sum.
This is the published quality ceiling between single-vector ANN and
full cross-encoders, and it is exactly expressible as in-row JVM
higher-order functions: for each (literal) query token, a
``transform`` computes its dot against every doc token and an
``array_max`` keeps the best; the per-query-token maxima add up in the
same projection. One full-corpus scan, zero shuffle, zero Python, a
bounded TakeOrdered — the same plan family as the BM25 relational
scorer.

Exactness: token vectors are int64-quantized (``floor(x*1000)``, the
clustering-module convention), so every dot and max is exact integer
math and bit-identical across engines — the gate hashes raw scores.

Scale path (the ColBERTv2/PLAID design): nobody MaxSims the full
corpus at 10^12 docs — candidates come from a cheap first phase
(per-token ANN in the paper; here any candidate relation such as
``similarity.hamming_rerank``'s phase 1 or ``ivf_search``), and MaxSim
reranks only the survivors. ``maxsim_topk(candidates=...)`` left-semi
joins the corpus down to the candidate ids before scoring, same
contract as ``similarity.reciprocal_knn(candidates=)``; the full-scan
default is the oracle path, kept because it is the exact reference.

Fixture note: the testdata embeddings are single 64-float vectors;
``slice_tokens`` derives an (n_tokens × dim) bag by slicing — a
deterministic adapter so the operator's input contract
(id, tokens: array<array<bigint>>) is exercised end-to-end. Real
multi-vector data (one row per doc with its token-vector bag) plugs
into the same functions unchanged.

Reference: UCI-SearchEngine has no vector retrieval at all; breadth
extension alongside operators/similarity.py, with published-paper
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.clustering import int_dot, quantize_vec


def slice_tokens(vec: Column, n_tokens: int, dim: int) -> Column:
    """array<long>[n_tokens*dim] → array<array<long>>[n_tokens][dim]
    — the deterministic single-vector→bag adapter (pure JVM slice)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_tokens - 1)),
        lambda j: F.slice(vec, j * F.lit(dim) + F.lit(1), F.lit(dim)),
    )


def maxsim_expr(doc_toks: Column, q_toks: list[list[int]]) -> Column:
    """MaxSim score Σ_q max_d (q·d) as one in-row integer expression.
    ``q_toks`` is the literal query bag (queries are tiny — same
    literal-fold convention as the WAND query terms); ``doc_toks`` is
    the document's token-vector bag column."""
    if not q_toks:
        raise ValueError("empty query token bag")
    total: Column | None = None
    for q in q_toks:
        qlit = F.array(*[F.lit(int(x)).cast("long") for x in q])
        best = F.array_max(F.transform(doc_toks, lambda d: int_dot(d, qlit)))
        total = best if total is None else total + best
    return total


def maxsim_topk(
    emb: DataFrame,
    q_toks: list[list[int]],
    k: int = 10,
    id_col: str = "vec_id",
    toks_col: str = "toks",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Top-k (id, score) by MaxSim. ``emb`` carries the quantized
    token-vector bag in ``toks_col``. With ``candidates`` (a one-column
    id relation from a cheap ANN phase), the corpus is left-semi
    pruned before any scoring — the PLAID rerank shape; without it the
    scan is the exact full-corpus reference."""
    src = emb
    if candidates is not None:
        cand = candidates.select(F.col(candidates.columns[0]).alias(id_col))
        src = emb.join(F.broadcast(cand.distinct()), id_col, "left_semi")
    return (
        src.select(
            id_col, maxsim_expr(F.col(toks_col), q_toks).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def tokens_from_vec(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_tokens: int = 8,
    dim: int = 8,
) -> DataFrame:
    """(id, toks) fixture adapter: quantize then slice the flat vector
    into the token bag. Scan-side projection, zero shuffle."""
    return emb.select(
        id_col,
        slice_tokens(quantize_vec(F.col(vec_col)), n_tokens, dim).alias(
            "toks"
        ),
    )
