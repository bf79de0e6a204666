"""Multi-field ranking (operators/multifield.py) vs a brute-force
python oracle: all three pinned combination semantics, the title-plane
vs live-projection equivalence, and the stale-tag fallback."""

import math
import os
from collections import Counter

import numpy as np
import pytest

from uci_searchengine_spark import BM25_B, BM25_K1
from uci_searchengine_spark.functions.tokenize import tokenize_py
from uci_searchengine_spark.operators import multifield as mf

QUERIES = ["page", "page arban", "belsest morrun corrurn", "zzznope"]
W_TITLE, W_TEXT = 2.0, 1.0
TIE_BREAKER = 0.3


def _title_stats(oracle):
    tp: dict[str, dict[int, int]] = {}
    tlen = np.zeros(oracle.n_docs, dtype=np.int64)
    for d, title in enumerate(oracle.titles):
        toks = tokenize_py(title)
        tlen[d] = len(toks)
        for t, tf in Counter(toks).items():
            tp.setdefault(t, {})[d] = tf
    avg_tlen = float(tlen.mean()) if oracle.n_docs else 0.0
    return tp, tlen, avg_tlen or 1.0


def _brute(oracle, query, variant, k=10):
    tp, tlen, avg_tlen = _title_stats(oracle)
    terms = list(dict.fromkeys(tokenize_py(query)))
    n = oracle.n_docs

    def idf(df):
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def bnorm(tf, ln, avg):
        return tf / ((1.0 - BM25_B) + BM25_B * ln / avg)

    scores: dict[int, float] = {}
    if variant == "concat":
        wdl = W_TEXT * oracle.doc_len.astype(float) + W_TITLE * tlen.astype(float)
        avg_wdl = float(wdl.mean())
        for t in terms:
            body, tit = oracle.postings.get(t, {}), tp.get(t, {})
            docs = set(body) | set(tit)
            if not docs:
                continue
            w = idf(len(docs))
            for d in docs:
                ctf = W_TEXT * body.get(d, 0) + W_TITLE * tit.get(d, 0)
                sat = ctf * (BM25_K1 + 1.0) / (
                    ctf + BM25_K1 * (1.0 - BM25_B + BM25_B * wdl[d] / avg_wdl)
                )
                scores[d] = scores.get(d, 0.0) + w * sat
    elif variant == "bm25f":
        for t in terms:
            body, tit = oracle.postings.get(t, {}), tp.get(t, {})
            docs = set(body) | set(tit)
            if not docs:
                continue
            w = idf(len(docs))
            for d in docs:
                ctf = W_TEXT * (
                    bnorm(body[d], oracle.doc_len[d], oracle.avgdl) if d in body else 0.0
                ) + W_TITLE * (bnorm(tit[d], tlen[d], avg_tlen) if d in tit else 0.0)
                scores[d] = scores.get(d, 0.0) + w * ctf * (BM25_K1 + 1.0) / (ctf + BM25_K1)
    else:  # most_fields and dis_max share the per-field independent BM25
        per_field: list[dict[int, float]] = [{}, {}]
        for t in terms:
            for fi, (plist, lens, avg, w_f) in enumerate(
                (
                    (oracle.postings.get(t, {}), oracle.doc_len, oracle.avgdl, W_TEXT),
                    (tp.get(t, {}), tlen, avg_tlen, W_TITLE),
                )
            ):
                if not plist:
                    continue
                w = idf(len(plist))
                for d, tf in plist.items():
                    ntf = bnorm(tf, lens[d], avg)
                    per_field[fi][d] = per_field[fi].get(d, 0.0) + w_f * w * ntf * (
                        BM25_K1 + 1.0
                    ) / (ntf + BM25_K1)
        if variant == "most_fields":
            for fs in per_field:
                for d, s in fs.items():
                    scores[d] = scores.get(d, 0.0) + s
        else:  # dis_max
            for d in set(per_field[0]) | set(per_field[1]):
                sb = per_field[0].get(d, 0.0)
                st = per_field[1].get(d, 0.0)
                mx = max(sb, st)
                scores[d] = mx + TIE_BREAKER * (sb + st - mx)
    ranked = sorted(((d, s) for d, s in scores.items() if s > 0), key=lambda x: (-x[1], x[0]))
    return ranked[:k]


@pytest.mark.parametrize("variant", ["bm25f", "most_fields", "concat", "dis_max"])
@pytest.mark.parametrize("query", QUERIES)
def test_score_fields_vs_oracle(spark, index_small, oracle_small, variant, query):
    got = mf.score_fields(
        spark,
        index_small,
        query,
        w_title=W_TITLE,
        w_text=W_TEXT,
        variant=variant,
        tie_breaker=TIE_BREAKER,
    ).collect()
    want = _brute(oracle_small, query, variant)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_title_plane_equals_live_and_stale_fallback(spark, index_small, oracle_small):
    q = "page arban"
    live = mf.score_fields(spark, index_small, q).collect()
    out = mf.write_title_plane(spark, index_small)
    assert os.path.exists(os.path.join(out, "_uss_tag.json"))
    planed = mf.score_fields(spark, index_small, q).collect()
    assert [(r["doc_id"], r["score"]) for r in live] == [
        (r["doc_id"], r["score"]) for r in planed
    ]
    # plane must actually be selected when fresh
    from uci_searchengine_spark.operators.index_build import IndexMeta

    meta = IndexMeta.load(index_small)
    assert mf._plane_tag(index_small, meta) is not None
    # stale tag (wrong n_docs) → fallback to live, results unchanged
    import json

    tag_path = os.path.join(out, "_uss_tag.json")
    tag = json.load(open(tag_path))
    tag["n_docs"] = tag["n_docs"] + 1
    json.dump(tag, open(tag_path, "w"))
    assert mf._plane_tag(index_small, meta) is None
    stale = mf.score_fields(spark, index_small, q).collect()
    assert [(r["doc_id"], r["score"]) for r in stale] == [
        (r["doc_id"], r["score"]) for r in live
    ]
    os.remove(tag_path)


def test_unknown_variant_raises(spark, index_small):
    with pytest.raises(ValueError):
        mf.score_fields(spark, index_small, "page", variant="nope")


def test_title_plane_refreshed_by_ingest(spark, tmp_path):
    """ingest_round rewrites an existing title plane after the append
    (same derived-plane contract as the vocab plane), so multi-field
    serving keeps its pruned plane through the ingest loop."""
    from pyspark.sql import functions as F

    from uci_searchengine_spark.operators.index_build import IndexMeta
    from uci_searchengine_spark.operators.lifecycle import ingest_round
    from uci_searchengine_spark.registry import IndexRegistry
    from uci_searchengine_spark.sources.synth import synth_pages

    reg = IndexRegistry(str(tmp_path / "reg"))
    pages = synth_pages(spark, 120, 1337, partitions=3)
    urls = sorted(r["url"] for r in pages.select("url").distinct().collect())
    cut = urls[80]
    ingest_round(
        spark, pages.filter(F.col("url") < cut), reg,
        num_shards=4, n_buckets=2, input_snapshot="tp-r0",
    )
    d = reg.path(reg.current())
    mf.write_title_plane(spark, d)
    ingest_round(
        spark, pages.filter(F.col("url") >= cut), reg,
        num_shards=4, n_buckets=2, input_snapshot="tp-r1", max_gens=99,
    )
    d2 = reg.path(reg.current())
    assert d2 == d
    meta2 = IndexMeta.load(d2)
    assert mf._plane_tag(d2, meta2) is not None
    # the refreshed plane serves the appended docs: plane vs live agree
    planed = mf.score_fields(spark, d2, "page").collect()
    os.remove(os.path.join(d2, "titleplane", "_uss_tag.json"))
    live = mf.score_fields(spark, d2, "page").collect()
    assert [(r["doc_id"], r["score"]) for r in planed] == [
        (r["doc_id"], r["score"]) for r in live
    ]


def test_stemmed_index_title_analysis_symmetric(spark, tmp_path):
    """On a stem=True index the TITLE field stems too (same analysis
    chain as the body): a title-only inflected match is retrieved by a
    differently-inflected query, and any two query inflections of the
    same stem score identically."""
    import datetime
    import shutil

    from uci_searchengine_spark.operators.index_build import build_index

    rows = [
        ("https://ex.com/a", "<html><title>Running daily news</title><body>cats sleep indoors</body></html>"),
        ("https://ex.com/b", "<html><title>Quiet page</title><body>dogs bark and runs happen</body></html>"),
        ("https://ex.com/c", "<html><title>Other page</title><body>nothing relevant here</body></html>"),
    ]
    ts = datetime.datetime(2024, 1, 1)
    pages = spark.createDataFrame(
        [(u, ts, h.encode()) for u, h in rows],
        "url string, warc_ts timestamp, html binary",
    )
    d = str(tmp_path / "stemmf")
    shutil.rmtree(d, ignore_errors=True)
    build_index(spark, pages, d, num_shards=2, n_buckets=2,
                input_snapshot="stemmf", stem=True)
    got = mf.score_fields(spark, d, "runnings").collect()
    # doc a matches ONLY in its title ("running" → stem "run"); doc b in body
    assert len(got) == 2
    again = mf.score_fields(spark, d, "run").collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in again
    ]
