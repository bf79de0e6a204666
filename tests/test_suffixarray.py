"""Distributed suffix array (operators/suffixarray) — prefix doubling
ranks, sparse-table LCP, and the Lee et al. exact duplicate criterion,
each pinned against a brute-force Python reference; plus the
dense_rank_global primitive it runs on (plans/docids)."""

import random

import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.suffixarray import (
    SEP_CODE,
    corpus_chars,
    duplicate_spans_exact,
    lcp_adjacent,
    suffix_ranks,
)
from uci_searchengine_spark.plans.docids import dense_rank_global

PLANT = "zqxvkjwzqxvkjwzq"  # 16 chars, alphabet disjoint from the rest


def _mk_docs():
    rng = random.Random(41)
    rand = lambda n: "".join(rng.choice("ab ") for _ in range(n))
    return [
        (0, rand(30)),
        (1, rand(8) + PLANT + rand(10)),
        (2, rand(5) + PLANT + rand(12)),
    ]


def _corpus(docs):
    return "".join(t + chr(SEP_CODE) for _, t in docs)


def _ref_order(corpus):
    return sorted(range(len(corpus)), key=lambda p: corpus[p:])


def _ref_lcp(a, b):
    i = 0
    while i < min(len(a), len(b)) and a[i] == b[i]:
        i += 1
    return i


@pytest.fixture(scope="module")
def sa_all(spark):
    """One end-to-end run shared by the rank / lcp / dup-span pins —
    the iterative rounds dominate test wall, so run them once."""
    docs = _mk_docs()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    chars = corpus_chars(df)
    ranks, tables = suffix_ranks(chars, partitions=4, keep_tables=True)
    lcp_rows = lcp_adjacent(ranks, tables).collect()
    rank_rows = ranks.collect()
    return docs, _corpus(docs), rank_rows, lcp_rows


def test_suffix_ranks_match_reference(sa_all):
    _, corpus, rank_rows, _ = sa_all
    order = _ref_order(corpus)
    ref = {p: i for i, p in enumerate(order)}
    got = {r["pos"]: r["rank"] for r in rank_rows}
    assert got == ref


def test_lcp_adjacent_matches_reference(sa_all):
    _, corpus, _, lcp_rows = sa_all
    order = _ref_order(corpus)
    ref = {
        (order[i], order[i + 1]): _ref_lcp(
            corpus[order[i]:], corpus[order[i + 1]:]
        )
        for i in range(len(order) - 1)
    }
    got = {(r["pos_a"], r["pos_b"]): r["lcp"] for r in lcp_rows}
    assert got == ref


def test_duplicate_spans_fence_and_planted_recovery(sa_all):
    """The planted 16-char cross-document duplicate is reported, the
    reported relation equals the brute-force reference exactly, and no
    reported span crosses a document boundary (the separator fence)."""
    _, corpus, _, lcp_rows = sa_all
    min_len = 12
    spans = [
        (r["pos_a"], r["pos_b"], r["lcp"])
        for r in lcp_rows
        if r["lcp"] >= min_len
    ]
    assert spans, "planted duplicate not reported at all"
    # exact-reference equality
    order = _ref_order(corpus)
    ref = [
        (order[i], order[i + 1], L)
        for i in range(len(order) - 1)
        if (L := _ref_lcp(corpus[order[i]:], corpus[order[i + 1]:]))
        >= min_len
    ]
    assert sorted(spans) == sorted(ref)
    # planted recovery: some pair shares >= len(PLANT) chars and both
    # sides spell the plant
    planted = [
        (a, b, L)
        for a, b, L in spans
        if L >= len(PLANT)
        and corpus[a : a + len(PLANT)] == PLANT
        and corpus[b : b + len(PLANT)] == PLANT
    ]
    assert planted, f"planted duplicate missing from {spans}"
    # fence: no reported common prefix contains the separator
    for a, _b, L in spans:
        assert chr(SEP_CODE) not in corpus[a : a + L]


def test_duplicate_spans_min_len_guard(spark):
    df = spark.createDataFrame([(0, "ab")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        duplicate_spans_exact(df, min_len=0)


def test_dense_rank_global_matches_reference(spark):
    """Heavy duplicate keys so range partitions straddle key
    boundaries — the subtraction rule in the driver prefix-sum is
    exercised, across several partition counts."""
    rng = random.Random(7)
    rows = [(rng.randrange(6), rng.randrange(4)) for _ in range(200)]
    keys = sorted(set(rows))
    ref_rank = {k: i for i, k in enumerate(keys)}
    df = spark.createDataFrame(rows, ["a", "b"])
    for parts in (1, 3, 7):
        out = dense_rank_global(df, ["a", "b"], "rk", partitions=parts)
        got = [((r["a"], r["b"]), r["rk"]) for r in out.collect()]
        out.unpersist()
        assert len(got) == len(rows)
        assert all(rk == ref_rank[k] for k, rk in got), f"parts={parts}"


def test_seeded_equals_unseeded_and_reference(spark):
    """The packed-8 seed path must give the exact ranks the width-1
    path gives — including on a corpus whose suffixes are all
    distinguished within 8 chars (the seed converges BEFORE its first
    doubling and must still densify)."""
    cases = [
        [(0, "abcdefghijklm"), (1, "nopqrstuvw")],  # all-distinct chars
        [(0, "abab abba"), (1, "baab abab"), (2, "abba baba")],
    ]
    for docs in cases:
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        chars = corpus_chars(df)
        corpus = _corpus(docs)
        ref = {p: i for i, p in enumerate(_ref_order(corpus))}
        seeded, _ = suffix_ranks(chars, partitions=3, seed_width=8)
        got = {r["pos"]: r["rank"] for r in seeded.collect()}
        assert got == ref, f"seeded path wrong on {docs}"
        plain, _ = suffix_ranks(chars, partitions=3, seed_width=1)
        gotp = {r["pos"]: r["rank"] for r in plain.collect()}
        assert gotp == ref, f"width-1 path wrong on {docs}"


def test_drop_duplicate_spans_policy(spark):
    """The Lee et al. excision policy end-to-end: first corpus
    occurrence survives intact, every later occurrence is excised,
    untouched docs are the identity, and a threshold above the longest
    repeat returns the corpus unchanged."""
    from uci_searchengine_spark.operators.suffixarray import (
        drop_duplicate_spans,
    )

    plant = "qwzxvkjbpmdyfgu"  # 15 chars, non-periodic
    docs = [
        (0, "aaa " + plant + " bbb"),
        (1, "no duplicates here at all"),
        (2, "ccc " + plant + " ddd " + plant + " eee"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["text_clean"]
        for r in drop_duplicate_spans(df, min_len=12, partitions=4).collect()
    }
    assert out[0] == docs[0][1], "first occurrence must survive"
    assert out[1] == docs[1][1], "untouched doc must be identity"
    assert plant not in out[2], "later occurrences must be excised"
    assert "".join(out.values()).count(plant) == 1
    ident = {
        r["doc_id"]: r["text_clean"]
        for r in drop_duplicate_spans(df, min_len=40, partitions=4).collect()
    }
    assert ident == dict(docs), "threshold above longest repeat ⇒ identity"
    with pytest.raises(ValueError):
        drop_duplicate_spans(df, min_len=0)
    with pytest.raises(ValueError):
        drop_duplicate_spans(df, bucket_width=0)
