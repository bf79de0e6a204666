"""Federated search: one query over N independent indexes under exact
union-corpus statistics must be rank- AND score-identical (by url) to
the same query over one index built on the whole corpus — including
with tombstones on one member — and must reject analysis mismatches."""

import math

import pytest
from pyspark.sql import functions as F

SEED = 4242
N = 240


def _by_url_single(spark, index_dir, rows):
    from uci_searchengine_spark.operators.index_build import load_docs

    id2url = {
        r["doc_id"]: r["url"]
        for r in load_docs(spark, index_dir).select("doc_id", "url").collect()
    }
    return sorted((id2url[d], round(s, 6)) for d, s in rows)


def _by_url_fed(spark, dirs, rows):
    from uci_searchengine_spark.operators.index_build import load_docs

    maps = []
    for d in dirs:
        maps.append(
            {
                r["doc_id"]: r["url"]
                for r in load_docs(spark, d)
                .select("doc_id", "url")
                .collect()
            }
        )
    return sorted((maps[i][d], round(s, 6)) for i, d, s in rows)


@pytest.fixture(scope="module")
def corpus(spark):
    from uci_searchengine_spark.sources.synth import synth_pages

    return synth_pages(spark, N, SEED, partitions=5)


@pytest.fixture(scope="module")
def whole_index(spark, corpus, tmp_path_factory):
    from uci_searchengine_spark.operators.index_build import build_index

    d = str(tmp_path_factory.mktemp("fed_whole"))
    build_index(
        spark, corpus, d, num_shards=4, n_buckets=2,
        input_snapshot="fed-whole",
    )
    return d


@pytest.fixture(scope="module")
def split_dirs(spark, corpus, tmp_path_factory):
    """Three deliberately unequal members (different n_buckets too, so
    bucket schemes differ across the federation)."""
    from uci_searchengine_spark.operators.index_build import build_index

    urls = sorted(r["url"] for r in corpus.select("url").collect())
    cuts = (urls[57], urls[160])
    parts = [
        corpus.filter(F.col("url") < cuts[0]),
        corpus.filter((F.col("url") >= cuts[0]) & (F.col("url") < cuts[1])),
        corpus.filter(F.col("url") >= cuts[1]),
    ]
    dirs = []
    for i, (part, nb) in enumerate(zip(parts, (2, 3, 1))):
        d = str(tmp_path_factory.mktemp(f"fed_part{i}"))
        build_index(
            spark, part, d, num_shards=4, n_buckets=nb,
            input_snapshot=f"fed-part{i}",
        )
        dirs.append(d)
    return dirs


@pytest.mark.spark
@pytest.mark.slow
class TestFederate:
    def test_identical_to_whole_index(self, spark, whole_index, split_dirs):
        from uci_searchengine_spark.operators.federate import federated_topk
        from uci_searchengine_spark.operators.wand import score_wand

        for q in ("stop0", "arbak stop1", "arband arbast stop2"):
            whole = _by_url_single(
                spark,
                whole_index,
                [
                    (r["doc_id"], r["score"])
                    for r in score_wand(spark, whole_index, q, k=15).collect()
                ],
            )
            fed = _by_url_fed(
                spark,
                split_dirs,
                [
                    (r["index_id"], r["doc_id"], r["score"])
                    for r in federated_topk(
                        spark, split_dirs, q, k=15
                    ).collect()
                ],
            )
            assert len(fed) == len(whole) == 15
            for (u1, s1), (u2, s2) in zip(whole, fed):
                assert u1 == u2, (q, whole, fed)
                assert math.isclose(s1, s2, rel_tol=0, abs_tol=1e-6)

    def test_single_member_degenerates_to_score_wand(
        self, spark, whole_index
    ):
        from uci_searchengine_spark.operators.federate import federated_topk
        from uci_searchengine_spark.operators.wand import score_wand

        a = [
            (r["doc_id"], round(r["score"], 6))
            for r in score_wand(spark, whole_index, "stop0 arbak", k=10)
            .collect()
        ]
        b = [
            (r["doc_id"], round(r["score"], 6))
            for r in federated_topk(
                spark, [whole_index], "stop0 arbak", k=10
            ).collect()
        ]
        assert a == b

    def test_tombstones_respected(self, spark, corpus, split_dirs, tmp_path):
        from uci_searchengine_spark.operators.federate import federated_topk
        from uci_searchengine_spark.operators.tombstones import delete_docs

        # kill the federation's current #1 doc (it lives in some member)
        top = federated_topk(spark, split_dirs, "stop0", k=1).collect()[0]
        delete_docs(split_dirs[top["index_id"]], [top["doc_id"]])
        try:
            got = federated_topk(spark, split_dirs, "stop0", k=10).collect()
            assert (top["index_id"], top["doc_id"]) not in {
                (r["index_id"], r["doc_id"]) for r in got
            }
            assert len(got) == 10
        finally:
            # tombstones are additive files; restore by clearing the dir
            import os
            import shutil

            shutil.rmtree(
                os.path.join(split_dirs[top["index_id"]], "tombstones"),
                ignore_errors=True,
            )

    def test_rejects_mismatched_analysis(self, spark, corpus, tmp_path):
        from uci_searchengine_spark.operators.federate import federated_topk
        from uci_searchengine_spark.operators.index_build import build_index

        d1 = str(tmp_path / "plain")
        d2 = str(tmp_path / "stemmed")
        half = corpus.limit(40)
        build_index(
            spark, half, d1, num_shards=2, n_buckets=1,
            input_snapshot="fed-mm1",
        )
        build_index(
            spark, half, d2, num_shards=2, n_buckets=1,
            input_snapshot="fed-mm2", stem=True,
        )
        with pytest.raises(ValueError, match="analysis chain"):
            federated_topk(spark, [d1, d2], "stop0", k=5)

    def test_empty_query_and_no_dirs(self, spark, whole_index):
        from uci_searchengine_spark.operators.federate import federated_topk

        assert federated_topk(spark, [whole_index], "!!!", k=5).count() == 0
        with pytest.raises(ValueError, match="at least one"):
            federated_topk(spark, [], "x")
