"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Covers the two north-rule metrics at bench scale:
* index-build docs/sec over the synthetic Common-Crawl-style pages corpus
  (input_hint shape, deterministic seed),
* BM25 top-k query latency p50/p95 over the reference query set
  (block-max scorer on the compressed segments),
plus headline relational/training-data queries over $SPARK_GRAFT_SF_DIR.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_DOCS (synthetic corpus size,
default 20000), BENCH_SKIP_BUILD=1 to reuse an existing index.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("BENCH_DOCS", "20000"))
INDEX_DIR = os.environ.get(
    "BENCH_INDEX_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), "_data", f"bench_index_{N_DOCS}")
)

HEADLINE = [
    "bm25_topk",
    "pricing_summary",
    "revenue_topk",
    "term_df_top20",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "ann_cosine_topk",
    "simhash",
    "events_hourly",
    "latest_event_per_user",
]

BENCH_QUERIES = [
    "stop0",
    "arbak stop1",
    "stop0 stop1 stop2 stop3",
    "arband arbast",
    "arbak arbal arbam arban arbar arbas arbat arbav",
]


def main() -> None:
    from uci_searchengine_spark.entry_queries import QUERIES
    from uci_searchengine_spark.operators.index_build import build_index
    from uci_searchengine_spark.operators.wand import score_wand
    from uci_searchengine_spark.session import get_spark
    from uci_searchengine_spark.sources.synth import synth_pages

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out: dict = {"metric": "headline_suite_seconds", "unit": "sec", "sf": sf, "queries": {}}

    # 1) index build throughput (docs/sec) on the pages corpus
    snapshot = f"synth:seed=1337:n={N_DOCS}"
    if not os.environ.get("BENCH_SKIP_BUILD"):
        shutil.rmtree(INDEX_DIR, ignore_errors=True)
        pages_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "_data", f"pages_{N_DOCS}_s1337"
        )
        if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
            synth_pages(spark, N_DOCS, seed=1337).write.mode("overwrite").parquet(
                pages_path
            )
        pages = spark.read.parquet(pages_path)
        t0 = time.perf_counter()
        build_index(
            spark,
            pages,
            INDEX_DIR,
            num_shards=32,
            n_buckets=16,
            input_snapshot=snapshot,
        )
        build_s = time.perf_counter() - t0
        out["queries"]["index_build"] = round(build_s, 3)
        out["build_docs_per_sec"] = round(N_DOCS / build_s, 1)
        out["build_n_docs"] = N_DOCS

    # 2) BM25 query latency p50/p95 (block-max scorer, warm index)
    lat = []
    for q in BENCH_QUERIES:
        t0 = time.perf_counter()
        score_wand(spark, INDEX_DIR, q, k=10).collect()
        lat.append(time.perf_counter() - t0)
    out["queries"]["bm25_wand_suite"] = round(sum(lat), 3)
    out["query_p50_ms"] = round(1000 * statistics.median(lat), 1)
    out["query_p95_ms"] = round(
        1000 * sorted(lat)[max(0, int(len(lat) * 0.95) - 1)], 1
    )

    # 3) headline relational / training-data queries over the sf dir
    for name in HEADLINE:
        fn, _sql = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        dt = time.perf_counter() - t0
        out["queries"][name] = round(dt, 3)

    out["value"] = round(sum(out["queries"].values()), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
