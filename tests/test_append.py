"""Incremental append (generations): append ≡ rebuild for disjoint
batches, upsert tombstones superseded versions, and the two scorers
agree on multi-generation indexes."""

import math

import pytest
from pyspark.sql import functions as F

SEED = 1337
N = 300


@pytest.fixture(scope="module")
def appended_index(spark, tmp_path_factory):
    """gen-0 = first half of the corpus (by url order), gen-1 = second
    half, appended."""
    from uci_searchengine_spark.operators.index_append import append_index
    from uci_searchengine_spark.operators.index_build import build_index
    from uci_searchengine_spark.sources.synth import synth_pages

    d = str(tmp_path_factory.mktemp("idx_append"))
    pages = synth_pages(spark, N, SEED, partitions=5)
    urls = sorted(r["url"] for r in pages.select("url").distinct().collect())
    # deliberately UNALIGNED split: 141 gen-0 docs with n_buckets=4 →
    # bucket_size=36, 141 % 36 != 0, so gen-1's first docs share gen-0's
    # last bucket — the boundary-bucket case every multi-gen scorer must
    # handle (same term, one segment row per generation, same bucket)
    cut = urls[141]
    first = pages.filter(F.col("url") < cut)
    second = pages.filter(F.col("url") >= cut)
    build_index(
        spark, first, d, num_shards=8, n_buckets=4,
        input_snapshot="append-test-gen0",
    )
    append_index(spark, second, d, input_snapshot="append-test")
    return d


def _by_url(spark, index_dir, rows):
    from uci_searchengine_spark.operators.index_build import load_docs

    id2url = {
        r["doc_id"]: r["url"]
        for r in load_docs(spark, index_dir).select("doc_id", "url").collect()
    }
    return [(id2url[d], s) for d, s in rows]


@pytest.mark.spark
@pytest.mark.slow
class TestAppend:
    def test_meta_and_generations(self, spark, appended_index, oracle_small):
        from uci_searchengine_spark.operators.index_build import (
            IndexMeta,
            generation_dirs,
            load_docs,
        )

        meta = IndexMeta.load(appended_index)
        assert meta.gens == 2
        assert len(generation_dirs(appended_index)) == 2
        # oracle_small dedups the same corpus — its n_docs is the truth
        assert load_docs(spark, appended_index).count() == oracle_small.n_docs
        assert meta.n_docs == oracle_small.n_docs
        assert math.isclose(meta.avgdl, oracle_small.avgdl, rel_tol=1e-12)

    @pytest.mark.parametrize("q", ["stop0 arbak", "arband arbast", "arbak stop1"])
    def test_append_equals_rebuild(self, spark, appended_index, oracle_small, q):
        """Same (url, score) ranking as the single-build oracle over the
        full corpus — compared as (score, url) sorted lists so exact
        score ties (whose internal doc-id order legitimately differs
        between layouts) don't flake."""
        from uci_searchengine_spark.operators.wand import score_wand

        got = _by_url(
            spark,
            appended_index,
            [
                (r["doc_id"], r["score"])
                for r in score_wand(spark, appended_index, q, 10).collect()
            ],
        )
        exp_ids = oracle_small.top_k(q, 10)
        exp = [(oracle_small.urls[d], s) for d, s in exp_ids]
        key = lambda r: (-round(r[1], 9), r[0])  # noqa: E731
        assert len(got) == len(exp), (q, got, exp)
        for (gu, gs), (eu, es) in zip(sorted(got, key=key), sorted(exp, key=key)):
            assert gu == eu and math.isclose(gs, es, rel_tol=1e-9), (q, got, exp)

    def test_wand_equals_naive_multigen(self, spark, appended_index):
        from uci_searchengine_spark.operators.bm25 import score_naive
        from uci_searchengine_spark.operators.wand import score_wand

        for q in ("stop0", "arbak stop1 stop2"):
            w = [
                (r["doc_id"], round(r["score"], 9))
                for r in score_wand(spark, appended_index, q, 10).collect()
            ]
            n = [
                (r["doc_id"], round(r["score"], 9))
                for r in score_naive(spark, appended_index, q, 10).collect()
            ]
            assert w == n, q

    def test_boundary_bucket_is_shared(self, spark, appended_index):
        """Fixture sanity: at least one bucket holds docs from BOTH
        generations (else the tests below don't cover the merge path)."""
        from uci_searchengine_spark.operators.index_build import (
            IndexMeta,
            load_segments,
        )

        meta = IndexMeta.load(appended_index)
        seg = load_segments(spark, appended_index)
        per_gen = (
            seg.select("bucket", "gen_avgdl").distinct().groupBy("bucket").count()
        )
        assert per_gen.filter("count > 1").count() >= 1

    @pytest.mark.parametrize("q", ["stop0 arbak", "arbak stop1 stop2"])
    def test_and_mode_multigen(self, spark, appended_index, oracle_small, q):
        """Conjunctive mode across generations — the boundary bucket's
        per-generation rows of one term must UNION, not intersect."""
        from uci_searchengine_spark.operators.wand import score_wand

        got = _by_url(
            spark,
            appended_index,
            [
                (r["doc_id"], r["score"])
                for r in score_wand(spark, appended_index, q, 10, mode="and").collect()
            ],
        )
        exp = [
            (oracle_small.urls[d], s) for d, s in oracle_small.top_k_and(q, 10)
        ]
        key = lambda r: (-round(r[1], 9), r[0])  # noqa: E731
        assert len(got) == len(exp), (q, got, exp)
        for (gu, gs), (eu, es) in zip(sorted(got, key=key), sorted(exp, key=key)):
            assert gu == eu and math.isclose(gs, es, rel_tol=1e-9), (q, got, exp)

    @pytest.mark.parametrize("ph", ["arbak stop1", "stop0 stop1"])
    def test_phrase_multigen(self, spark, appended_index, oracle_small, ph):
        from uci_searchengine_spark.operators.index_build import load_docs
        from uci_searchengine_spark.operators.phrase import phrase_search

        id2url = {
            r["doc_id"]: r["url"]
            for r in load_docs(spark, appended_index).select("doc_id", "url").collect()
        }
        got = sorted(
            (id2url[r["doc_id"]], round(r["score"], 9), r["n_occ"])
            for r in phrase_search(spark, appended_index, ph, 10).collect()
        )
        exp = sorted(
            (oracle_small.urls[d], round(s, 9), n)
            for d, s, n in oracle_small.top_k_phrase(ph, 10)
        )
        assert [(u, n) for u, _, n in got] == [(u, n) for u, _, n in exp], ph
        for (gu, gs, _), (eu, es, _) in zip(got, exp):
            assert math.isclose(gs, es, rel_tol=1e-9)

    def test_boolean_multigen(self, spark, appended_index, oracle_small):
        from uci_searchengine_spark.operators.boolean import boolean_search

        q = '+arbak stop1 -stop9'
        got = _by_url(
            spark,
            appended_index,
            [
                (r["doc_id"], r["score"])
                for r in boolean_search(spark, appended_index, q, 10).collect()
            ],
        )
        exp = [
            (oracle_small.urls[d], s) for d, s in oracle_small.boolean_top_k(q, 10)
        ]
        key = lambda r: (-round(r[1], 9), r[0])  # noqa: E731
        assert len(got) == len(exp), (q, got, exp)
        for (gu, gs), (eu, es) in zip(sorted(got, key=key), sorted(exp, key=key)):
            assert gu == eu and math.isclose(gs, es, rel_tol=1e-9)

    @pytest.mark.parametrize("q", ["stop0 arbak", "arband arbast"])
    def test_searcher_equals_rebuild_multigen(
        self, spark, appended_index, oracle_small, q
    ):
        """The resident Searcher must resolve df across generations exactly
        like the cold wand path (regression: Searcher.top_k once re-aggregated
        df only for seg_split>1, scoring appended indexes with per-generation
        fragment-local df)."""
        from uci_searchengine_spark.operators.serving import Searcher

        s = Searcher(spark, appended_index)
        got = _by_url(
            spark,
            appended_index,
            [(r["doc_id"], r["score"]) for r in s.top_k(q, 10).collect()],
        )
        exp = [(oracle_small.urls[d], sc) for d, sc in oracle_small.top_k(q, 10)]
        key = lambda r: (-round(r[1], 9), r[0])  # noqa: E731
        assert len(got) == len(exp), (q, got, exp)
        for (gu, gs), (eu, es) in zip(sorted(got, key=key), sorted(exp, key=key)):
            assert gu == eu and math.isclose(gs, es, rel_tol=1e-9), (q, got, exp)

    def test_upsert_crash_window_self_heals(self, spark, tmp_path):
        """Crash between the meta commit and delete_docs: the persisted
        pending-tombstones file is applied on the next IndexMeta.load, so
        the old version of a re-seen url never serves (and a pending file
        from BEFORE the meta commit is left untouched)."""
        import json
        import os

        from uci_searchengine_spark.operators.bm25 import search
        from uci_searchengine_spark.operators.index_append import append_index
        from uci_searchengine_spark.operators.index_build import IndexMeta, build_index
        from uci_searchengine_spark.operators.tombstones import (
            clear_tombstones,
            load_tombstone_ids,
        )
        from uci_searchengine_spark.sources.synth import synth_pages

        d = str(tmp_path / "idx_crash")
        pages = synth_pages(spark, 60, SEED, partitions=3)
        build_index(spark, pages, d, num_shards=4, n_buckets=2,
                    input_snapshot="crash-gen0")
        target = pages.orderBy("url").limit(1).collect()[0]
        batch = spark.createDataFrame(
            [(target["url"], target["warc_ts"],
              bytearray(b"<html><body>zzznewword only content</body></html>"),
              "zzznewword only content", "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        append_index(spark, batch, d, input_snapshot="crash-append")
        stale = [int(i) for i in load_tombstone_ids(d)]
        assert len(stale) == 1
        # simulate the crash: tombstones gone, pending file back in place
        clear_tombstones(d)
        meta = IndexMeta.load(d)
        with open(os.path.join(d, "pending-tombstones.json"), "w") as f:
            json.dump({"gens": meta.gens, "ids": stale}, f)
        # next load self-heals
        IndexMeta.load(d)
        assert not os.path.exists(os.path.join(d, "pending-tombstones.json"))
        assert [int(i) for i in load_tombstone_ids(d)] == stale
        env = search(spark, d, "zzznewword")
        assert env["total_results"] == 1
        # pre-commit pending (gens ahead of meta) must NOT be applied
        clear_tombstones(d)
        with open(os.path.join(d, "pending-tombstones.json"), "w") as f:
            json.dump({"gens": meta.gens + 1, "ids": stale}, f)
        IndexMeta.load(d)
        assert os.path.exists(os.path.join(d, "pending-tombstones.json"))
        assert load_tombstone_ids(d).size == 0
        os.remove(os.path.join(d, "pending-tombstones.json"))

    def test_upsert_tombstones_old_version(self, spark, tmp_path):
        from uci_searchengine_spark.operators.bm25 import search
        from uci_searchengine_spark.operators.index_append import append_index
        from uci_searchengine_spark.operators.index_build import build_index
        from uci_searchengine_spark.operators.tombstones import load_tombstone_ids
        from uci_searchengine_spark.sources.synth import synth_pages

        d = str(tmp_path / "idx_upsert")
        pages = synth_pages(spark, 60, SEED, partitions=3)
        build_index(spark, pages, d, num_shards=4, n_buckets=2,
                    input_snapshot="upsert-gen0")
        # re-crawl one url with brand-new content
        target = pages.orderBy("url").limit(1).collect()[0]
        new_html = "<html><body>zzznewword only content</body></html>".encode()
        batch = spark.createDataFrame(
            [(target["url"], target["warc_ts"], bytearray(new_html),
              "zzznewword only content", "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        append_index(spark, batch, d, input_snapshot="upsert")
        assert load_tombstone_ids(d).size == 1
        env = search(spark, d, "zzznewword")
        assert env["total_results"] == 1
        assert env["results"][0]["url"] == target["url"]


@pytest.mark.spark
@pytest.mark.slow
class TestCompaction:
    def test_compact_equals_direct_build_on_live_corpus(self, spark, tmp_path):
        """append + upsert + delete, then compact — the compacted index
        must equal a direct build over the surviving latest-version
        pages, query-for-query (title/text reconstruction exact)."""
        from uci_searchengine_spark.operators.bm25 import search
        from uci_searchengine_spark.operators.compact import compact_index
        from uci_searchengine_spark.operators.index_append import append_index
        from uci_searchengine_spark.operators.index_build import (
            IndexMeta,
            build_index,
            load_docs,
        )
        from uci_searchengine_spark.operators.tombstones import delete_docs
        from uci_searchengine_spark.operators.wand import score_wand
        from uci_searchengine_spark.sources.synth import synth_pages

        d = str(tmp_path / "idx_life")
        pages = synth_pages(spark, 80, SEED, partitions=3).cache()
        build_index(spark, pages, d, num_shards=4, n_buckets=2,
                    input_snapshot="life-gen0")
        # upsert one url, then tombstone one other doc by hand
        target = pages.orderBy("url").limit(1).collect()[0]
        new_text = "replacement words arbak stop0 stop0"
        batch = spark.createDataFrame(
            [(target["url"], target["warc_ts"],
              bytearray(f"<html><body>{new_text}</body></html>".encode()),
              new_text, "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        append_index(spark, batch, d, input_snapshot="life-append")
        victim = (
            load_docs(spark, d).orderBy(F.desc("doc_id")).limit(1).collect()[0]
        )
        # pick a gen-0 doc that still lives (not the upserted one)
        live = [
            r for r in load_docs(spark, d).orderBy("doc_id").collect()
            if r["url"] != target["url"]
        ]
        victim = live[3]
        delete_docs(d, [victim["doc_id"]])

        out = str(tmp_path / "idx_compact")
        cmeta = compact_index(spark, d, out)
        assert cmeta.gens == 1

        # expected: direct build over latest-version pages minus victim
        expected_pages = (
            pages.filter(F.col("url") != target["url"])
            .unionByName(batch)
            .filter(F.col("url") != victim["url"])
        )
        ref = str(tmp_path / "idx_ref")
        build_index(spark, expected_pages, ref, num_shards=4, n_buckets=2,
                    input_snapshot="life-ref")

        for q in ("stop0 arbak", "arband arbast"):
            got = {
                (r["doc_id"], round(r["score"], 9))
                for r in score_wand(spark, out, q, 10).collect()
            }
            exp = {
                (r["doc_id"], round(r["score"], 9))
                for r in score_wand(spark, ref, q, 10).collect()
            }
            assert got == exp, q
        # titles survive compaction (doc store, not just tokens)
        t_out = {r["url"]: r["title"] for r in load_docs(spark, out).collect()}
        t_ref = {r["url"]: r["title"] for r in load_docs(spark, ref).collect()}
        assert t_out == t_ref
        # envelope smoke on the compacted index
        env = search(spark, out, "replacement")
        assert env["total_results"] == 1 and env["results"][0]["url"] == target["url"]
