"""Map-only stage-1 fast path: url-sorted input tables build with NO
JVM exchange and produce a byte-identical index to the range-exchange
path (docs, meta, query results)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

SEED = 1337
N = 400


@pytest.fixture(scope="module")
def sorted_corpus(spark, tmp_path_factory):
    """The corpus twice: as a DataFrame (exchange path input) and as a
    url-range-sorted parquet table (map-only input), plus a batch of
    duplicate urls so keep-latest dedup is exercised on both paths."""
    from uci_searchengine_spark.sources.synth import synth_pages

    d = str(tmp_path_factory.mktemp("maponly"))
    pages = synth_pages(spark, N, SEED, partitions=5)
    # re-crawl 10 urls with different content → dedup must keep latest
    dups = (
        pages.orderBy("url").limit(10)
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY"))
        .withColumn("html", F.encode(F.lit("<html><body>newer version zzzdup</body></html>"), "utf-8"))
        .withColumn("text", F.lit("newer version zzzdup"))
    )
    full = pages.unionByName(dups)
    tbl = os.path.join(d, "pages_sorted")
    (
        full.repartitionByRange(6, "url")
        .sortWithinPartitions("url", F.desc("warc_ts"))
        .write.mode("overwrite").parquet(tbl)
    )
    return full, tbl, d


@pytest.mark.spark
@pytest.mark.slow
class TestMapOnlyBuild:
    def test_planner_accepts_sorted_rejects_unsorted(self, spark, sorted_corpus, tmp_path):
        from uci_searchengine_spark.operators.index_build import (
            plan_ranged_file_groups,
        )
        from uci_searchengine_spark.sources.synth import synth_pages

        _, tbl, _ = sorted_corpus
        groups = plan_ranged_file_groups(tbl, 4)
        assert groups and sum(g["rows"] for g in groups) > N
        # every url range is disjoint across groups → dedup stays local
        # (boundary-equal files must share a group)
        # unsorted (hash-partitioned) table → planner refuses
        u = str(tmp_path / "unsorted")
        synth_pages(spark, 100, SEED, partitions=4).repartition(4).write.parquet(u)
        assert plan_ranged_file_groups(u, 4) is None

    def test_map_only_equals_exchange(self, spark, sorted_corpus):
        from uci_searchengine_spark.operators.bm25 import search
        from uci_searchengine_spark.operators.index_build import (
            build_index,
            load_docs,
        )
        from uci_searchengine_spark.operators.wand import score_wand

        full, tbl, d = sorted_corpus
        a, b = os.path.join(d, "idx_exch"), os.path.join(d, "idx_map")
        shutil.rmtree(a, ignore_errors=True)
        shutil.rmtree(b, ignore_errors=True)
        m1 = build_index(spark, full, a, num_shards=8, n_buckets=4,
                         input_snapshot="cmp")
        m2 = build_index(spark, None, b, num_shards=8, n_buckets=4,
                         input_snapshot="cmp", pages_path=tbl)
        assert (m1.n_docs, m1.bucket_size) == (m2.n_docs, m2.bucket_size)
        assert abs(m1.avgdl - m2.avgdl) < 1e-12
        d1 = sorted(
            tuple(r) for r in load_docs(spark, a)
            .select("doc_id", "url", "doc_len", "title", "text").collect()
        )
        d2 = sorted(
            tuple(r) for r in load_docs(spark, b)
            .select("doc_id", "url", "doc_len", "title", "text").collect()
        )
        assert d1 == d2
        for q in ("stop0 arbak", "arband arbast", "zzzdup"):
            r1 = [(r["doc_id"], round(r["score"], 9))
                  for r in score_wand(spark, a, q, 10).collect()]
            r2 = [(r["doc_id"], round(r["score"], 9))
                  for r in score_wand(spark, b, q, 10).collect()]
            assert r1 == r2, q
        # dedup kept the re-crawled versions on the map-only path
        env = search(spark, b, "zzzdup")
        assert env["total_results"] == 10

    def test_group_counts_cache(self, spark, sorted_corpus):
        """Counts are table stats: cached beside the table keyed by exact
        file identity; any file change rotates the key (stale-proof)."""
        import json
        import os

        from uci_searchengine_spark.operators.index_build import (
            _cached_group_counts,
            plan_ranged_file_groups,
        )

        from uci_searchengine_spark.plans.partitioning import (
            exact_repartition,
        )

        _, tbl, _ = sorted_corpus
        stats_dir = os.path.join(tbl, "_uss_stats")
        groups = plan_ranged_file_groups(tbl, 4)
        gf = {g["pid"]: g["files"] for g in groups}
        # populate the cache for THIS layout (self-sufficient: don't
        # depend on a sibling test having built it — test selection
        # used to break that ordering)
        dr = exact_repartition(
            spark.createDataFrame([(g["pid"],) for g in groups], "pid int"),
            len(groups), "pid",
        )
        cached = _cached_group_counts(spark, tbl, groups, gf, dr)
        assert os.path.isdir(stats_dir) and os.listdir(stats_dir)
        # cache hit: no Spark job needed (driver_r=None would blow up on miss)
        got = _cached_group_counts(spark, tbl, groups, gf, driver_r=None)
        assert got == cached
        # touching a file rotates the key → recompute (real job) → same values
        a_file = groups[0]["files"][0]
        os.utime(a_file)
        from uci_searchengine_spark.plans.partitioning import exact_repartition

        driver_r = exact_repartition(
            spark.createDataFrame([(g["pid"],) for g in groups], "pid int"),
            len(groups), "pid",
        )
        fresh = _cached_group_counts(spark, tbl, groups, gf, driver_r)
        assert fresh == cached

    def test_map_only_resume(self, spark, sorted_corpus):
        """Second build over the same committed index is a no-op skip."""
        import time

        from uci_searchengine_spark.operators.index_build import build_index

        _, tbl, d = sorted_corpus
        idx = os.path.join(d, "idx_map")  # built by the previous test
        t0 = time.perf_counter()
        build_index(spark, None, idx, num_shards=8, n_buckets=4,
                    input_snapshot="cmp", pages_path=tbl)
        assert time.perf_counter() - t0 < 30  # resume path, no rebuild
