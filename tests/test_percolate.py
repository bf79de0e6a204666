"""Percolator (standing queries): batch matches pinned against a python
set-arithmetic oracle and against boolean_search's result set on the
indexed corpus; streaming percolation ≡ batch."""

import pytest

from uci_searchengine_spark.functions.phrase import count_phrase_py
from uci_searchengine_spark.functions.queryparse import parse_query
from uci_searchengine_spark.functions.tokenize import tokenize_py
from uci_searchengine_spark.operators.percolate import percolate

QUERIES = {
    "must": "+stop0 +arbak",
    "group": "(arbak|arband) +stop0",
    "notq": "arbak -stop9",
    "phrase": '"arbak stop1"',
    "pure_or": "arbak arband",
    "contra": "(arbak|arband) -arbak -arband",
    "empty": "!!! ...",
}


def _matches(toks, q):
    bq = parse_query(q, tokenize_py)
    ts = set(toks)
    if not bq.positive_terms:
        return False
    if any(t not in ts for t in bq.must_terms):
        return False
    if any(not (ts & set(g)) for g in bq.groups):
        return False
    if any(count_phrase_py(toks, p) == 0 for p in bq.phrases):
        return False
    if ts & set(bq.not_terms):
        return False
    if bq.or_terms and not (bq.must_terms or bq.groups or bq.phrases):
        if not (ts & set(bq.or_terms)):
            return False
    return True


def _want(texts):
    out = set()
    for d, text in enumerate(texts):
        toks = tokenize_py(text)
        for qid, q in QUERIES.items():
            if _matches(toks, q):
                out.add((qid, d))
    return out


def test_percolate_vs_oracle(spark, oracle_small):
    texts = oracle_small.texts
    docs = spark.createDataFrame(
        [(i, tokenize_py(t)) for i, t in enumerate(texts)],
        "doc_id long, t array<string>",
    )
    got = {
        (r["query_id"], r["doc_id"])
        for r in percolate(docs, QUERIES).collect()
    }
    want = _want(texts)
    assert got == want
    assert not [p for p in got if p[0] in ("contra", "empty")]


def test_percolate_rejects_wildcards():
    """Registered queries with wildcards fail at compile time: there is
    no index vocabulary to expand against, so the analyzer would
    silently reduce 'dat*' to the literal 'dat' and diverge from
    boolean_search's expansion semantics."""
    import pytest as _pytest

    from uci_searchengine_spark.operators.percolate import compile_queries

    with _pytest.raises(ValueError, match="wildcard"):
        compile_queries({"w": "dat* +spark"})
    # wildcard-free registries still compile
    assert "ok" in compile_queries({"ok": "+spark data"})


def test_percolate_matches_boolean_search(spark, index_small, oracle_small):
    """Percolation's match set == boolean_search's result set (score
    dropped) for every non-degenerate registered query."""
    from uci_searchengine_spark.operators.boolean import boolean_search

    texts = oracle_small.texts
    docs = spark.createDataFrame(
        [(i, tokenize_py(t)) for i, t in enumerate(texts)],
        "doc_id long, t array<string>",
    )
    got = {}
    for r in percolate(docs, QUERIES).collect():
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    for qid, q in QUERIES.items():
        bs = {
            r["doc_id"]
            for r in boolean_search(spark, index_small, q, k=10**6).collect()
        }
        assert got.get(qid, set()) == bs, qid


def test_percolate_streaming_equals_batch(spark, oracle_small, tmp_path):
    texts = oracle_small.texts[:120]
    docs = spark.createDataFrame(
        [(i, tokenize_py(t)) for i, t in enumerate(texts)],
        "doc_id long, t array<string>",
    )
    src = str(tmp_path / "percolate_src")
    docs.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, t array<string>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = percolate(stream, QUERIES)
    q = (
        out.writeStream.format("memory")
        .queryName("percolate_hits")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["query_id"], r["doc_id"])
        for r in spark.sql("SELECT * FROM percolate_hits").collect()
    }
    batch = {
        (r["query_id"], r["doc_id"])
        for r in percolate(docs, QUERIES).collect()
    }
    assert streamed == batch and batch


def test_percolate_http_route(spark, index_small, tmp_path):
    """GET /api/percolate?text=... matches one doc against the
    percolator.json registry; 404 without a registry, 422 without text."""
    import json as _json
    import shutil
    import threading
    import urllib.parse
    import urllib.request

    from uci_searchengine_spark.http_api import make_server

    idx = str(tmp_path / "idx")
    shutil.copytree(index_small, idx)
    with open(f"{idx}/percolator.json", "w") as f:
        _json.dump(QUERIES, f)
    srv = make_server(spark, idx, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        text = "arbak stop1 something arbak stop1"
        q = urllib.parse.quote(text)
        with urllib.request.urlopen(f"{base}/api/percolate?text={q}") as r:
            got = _json.loads(r.read())
        toks = tokenize_py(text)
        want = sorted(
            qid for qid, qq in QUERIES.items() if _matches(toks, qq)
        )
        assert got["matches"] == want and "phrase" in want
        assert got["registered"] == len(QUERIES)
        # no text -> 422
        try:
            urllib.request.urlopen(f"{base}/api/percolate")
            raise AssertionError("expected 422")
        except urllib.error.HTTPError as e:
            assert e.code == 422
    finally:
        srv.shutdown()


def test_percolate_no_registry_404(spark, index_small):
    import threading
    import urllib.error
    import urllib.request

    from uci_searchengine_spark.http_api import make_server

    srv = make_server(spark, index_small, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        urllib.request.urlopen(f"{base}/api/percolate?text=x")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        srv.shutdown()


@pytest.mark.spark
class TestPercolateIndexed:
    REGISTRY = {
        "q_must": "+data +spark",
        "q_group": "(data|spark) +join",
        "q_not": "data -join",
        "q_phrase": '"data spark"',
        "q_near": '"data spark"~2',
        "q_or": "data spark scan",
        "q_contra": "(data|spark) -data -spark",
        "q_multi_group": "(data|scan) (spark|join)",
    }

    def _docs(self, spark):
        texts = [
            "data spark join",            # 0
            "data big spark",             # 1: near but not phrase
            "data scan",                  # 2
            "join only here",             # 3
            "spark join scan",            # 4
            "nothing relevant at all",    # 5
            "data gap gap spark",         # 6: too far for slop 2
        ]
        from uci_searchengine_spark.functions.tokenize import tokenize_py

        return spark.createDataFrame(
            [(i, tokenize_py(t)) for i, t in enumerate(texts)],
            "doc_id long, t array<string>",
        )

    def test_indexed_equals_expression_path(self, spark):
        from uci_searchengine_spark.operators.percolate import (
            percolate,
            percolate_indexed,
        )

        docs = self._docs(spark)
        full = sorted(tuple(r) for r in percolate(docs, self.REGISTRY).collect())
        idx = sorted(
            tuple(r)
            for r in percolate_indexed(docs, self.REGISTRY).collect()
        )
        assert idx == full and len(full) > 0

    def test_candidates_prefilter_and_no_false_negatives(self, spark):
        from uci_searchengine_spark.operators.percolate import (
            compile_queries,
            extraction_terms,
            match_tokens,
        )

        docs = self._docs(spark)
        compiled = compile_queries(self.REGISTRY)
        rows = docs.collect()
        n_cand = 0
        for qid, bq in compiled.items():
            ext = set(extraction_terms(bq))
            for r in rows:
                hit = bool(ext & set(r["t"]))
                n_cand += hit
                # extraction guarantee: a match is always a candidate
                if match_tokens(bq, list(r["t"])):
                    assert hit, (qid, r["doc_id"])
        # and the pre-filter genuinely prunes the cross product
        assert n_cand < len(compiled) * len(rows)

    def test_large_registry_plan_is_constant(self, spark):
        # 300 registered queries through the indexed path — the
        # expression path would compile 300 predicates into one
        # projection; the indexed plan stays two joins + one filter.
        from uci_searchengine_spark.operators.percolate import (
            percolate,
            percolate_indexed,
        )

        reg = {f"q{i:03d}": f"+tok{i % 37} +tok{(i * 7) % 37}" for i in range(300)}
        docs = self._docs(spark).unionByName(
            spark.createDataFrame(
                [(100 + i, [f"tok{i}", f"tok{(i * 7) % 37}"]) for i in range(37)],
                "doc_id long, t array<string>",
            )
        )
        full = sorted(tuple(r) for r in percolate(docs, reg).collect())
        idx = sorted(tuple(r) for r in percolate_indexed(docs, reg).collect())
        assert idx == full and len(full) > 0
