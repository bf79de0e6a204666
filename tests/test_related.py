"""Batch related-documents precompute pinned against a brute-force
python oracle on the small synth corpus."""

import math
from collections import Counter

from uci_searchengine_spark.functions.tokenize import tokenize_py
from uci_searchengine_spark.operators.related import related_docs


def _expected(texts, k=3, max_terms=10, df_cap=100):
    toks = [tokenize_py(t) for t in texts]
    n = len(toks)
    dl = [len(x) for x in toks]
    avgdl = sum(dl) / n
    tf = [Counter(x) for x in toks]
    df = Counter(t for c in tf for t in set(c))
    ok = {t for t, d in df.items() if d <= df_cap}

    def idf(t):
        return math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)

    def contrib(d, t):
        f = tf[d][t]
        return idf(t) * (
            f * 2.2 / (f + 1.2 * (1 - 0.75 + 0.75 * dl[d] / avgdl))
        )

    inv = {}
    for d, c in enumerate(tf):
        for t in c:
            if t in ok:
                inv.setdefault(t, []).append(d)

    out = []
    for src in range(n):
        sel = sorted(
            ((tf[src][t] * idf(t), t) for t in tf[src] if t in ok),
            key=lambda x: (-x[0], x[1]),
        )[:max_terms]
        scores = {}
        for _, t in sel:
            for cand in inv[t]:
                if cand != src:
                    scores[cand] = scores.get(cand, 0.0) + contrib(cand, t)
        ranked = sorted(
            ((c, round(s, 6)) for c, s in scores.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:k]
        out.extend((src, c, s) for c, s in ranked)
    return out


def test_related_docs_vs_oracle(spark, oracle_small):
    texts = oracle_small.texts
    toks = spark.createDataFrame(
        [(i, tokenize_py(t)) for i, t in enumerate(texts)],
        "doc_id long, t array<string>",
    )
    got = sorted(
        (r["src"], r["cand"], r["score"])
        for r in related_docs(toks, k=3, max_terms=10, df_cap=100).collect()
    )
    want = sorted(_expected(texts, k=3, max_terms=10, df_cap=100))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:2] == w[:2], (g, w)
        assert math.isclose(g[2], w[2], rel_tol=1e-9), (g, w)


def test_related_docs_df_cap_drops_head(spark, oracle_small):
    """With a tiny df_cap every head term vanishes: results shrink and
    never rank via head terms (oracle agreement at the same cap)."""
    texts = oracle_small.texts[:80]
    toks = spark.createDataFrame(
        [(i, tokenize_py(t)) for i, t in enumerate(texts)],
        "doc_id long, t array<string>",
    )
    got = sorted(
        (r["src"], r["cand"], r["score"])
        for r in related_docs(toks, k=2, max_terms=5, df_cap=5).collect()
    )
    want = sorted(_expected(texts, k=2, max_terms=5, df_cap=5))
    assert [g[:2] for g in got] == [w[:2] for w in want]
