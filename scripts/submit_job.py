"""Driver script for the spark-submit --py-files check (north rule: the
pipeline runs via spark-submit on a multi-executor cluster).

Run by scripts/submit_check.sh; imports the engine ONLY from the
--py-files zip (this file must not assume the repo is on sys.path
beyond what spark-submit provides), builds a small index end-to-end,
runs a WAND query, and prints one JSON line."""

import json
import shutil
import sys

from pyspark.sql import SparkSession


def main() -> int:
    work = sys.argv[1]
    spark = (
        SparkSession.builder.appName("submit-check")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    from uci_searchengine_spark.operators.bm25 import search
    from uci_searchengine_spark.operators.index_build import build_index, build_metrics
    from uci_searchengine_spark.operators.wand import score_wand
    from uci_searchengine_spark.sources.synth import synth_pages

    idx = f"{work}/idx"
    shutil.rmtree(idx, ignore_errors=True)
    pages = synth_pages(spark, 300, seed=1337, partitions=4)
    meta = build_index(spark, pages, idx, num_shards=4, n_buckets=2,
                       input_snapshot="submit-check")
    top = [
        (r["doc_id"], round(r["score"], 6))
        for r in score_wand(spark, idx, "stop0 arbak", k=5).collect()
    ]
    env = search(spark, idx, "stop0", per_page=3, scorer=score_wand)
    print(json.dumps({
        "n_docs": meta.n_docs,
        "top": top,
        "total_results": env["total_results"],
        "metrics": build_metrics(idx),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
