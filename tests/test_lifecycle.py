"""Ingest loop (operators/lifecycle.py): delta rounds → build/append →
policy merge → registry switch, end-state ≡ one-shot build."""

import math

import pytest
from pyspark.sql import functions as F

SEED = 77
N = 320


@pytest.mark.spark
class TestIngestLoop:
    def test_rounds_merge_and_match_full_build(self, spark, tmp_path):
        from uci_searchengine_spark.operators.index_build import (
            IndexMeta,
            build_index,
            load_docs,
        )
        from uci_searchengine_spark.operators.lifecycle import ingest_round
        from uci_searchengine_spark.operators.wand import score_wand
        from uci_searchengine_spark.registry import IndexRegistry
        from uci_searchengine_spark.sources.synth import synth_pages

        pages = synth_pages(spark, N, SEED, partitions=4)
        urls = sorted(
            r["url"] for r in pages.select("url").distinct().collect()
        )
        cuts = [urls[80], urls[160], urls[240]]
        deltas = [
            pages.filter(F.col("url") < cuts[0]),
            pages.filter((F.col("url") >= cuts[0]) & (F.col("url") < cuts[1])),
            # round 3 re-crawls 15 round-1 urls (upserts → tombstones)
            pages.filter(
                (F.col("url") >= cuts[1]) & (F.col("url") < cuts[2])
            ).unionByName(pages.filter(F.col("url").isin(urls[10:25]))),
            pages.filter(F.col("url") >= cuts[2]),
        ]
        reg = IndexRegistry(str(tmp_path / "registry"))
        names = []
        for i, d in enumerate(deltas):
            names.append(
                ingest_round(
                    spark, d, reg, num_shards=4, n_buckets=4,
                    input_snapshot=f"r{i}", max_gens=2,
                )
            )
        # the policy tripped at least once: a merged version is current
        assert any("-m" in n for n in names), names
        cur = reg.current()
        assert "-m" in cur
        meta = IndexMeta.load(reg.path(cur))
        # post-merge appends may exist, but generations were folded
        assert meta.gens <= 2
        # old versions remain listed (retention = registry delete)
        assert "idx" in reg.available()

        # end state ≡ one-shot build over the full corpus (urls dedup to
        # the latest version exactly like the upsert path)
        full = str(tmp_path / "full")
        build_index(
            spark, pages, full, num_shards=4, n_buckets=4,
            input_snapshot="full",
        )
        def by_url(idx_dir, q, mode):
            id2u = {
                r["doc_id"]: r["url"]
                for r in load_docs(spark, idx_dir)
                .select("doc_id", "url")
                .collect()
            }
            return [
                (id2u[r["doc_id"]], round(r["score"], 9))
                for r in score_wand(spark, idx_dir, q, 10, mode=mode).collect()
            ]

        for q, mode in [
            ("arbak arbal", "or"),
            ("stop0 arbak", "and"),
            ("arbat", "or"),
        ]:
            a = by_url(reg.path(cur), q, mode)
            b = by_url(full, q, mode)
            assert [u for u, _ in a] == [u for u, _ in b], (q, mode)
            for (_, sa), (_, sb) in zip(a, b):
                assert math.isclose(sa, sb, rel_tol=1e-9)
