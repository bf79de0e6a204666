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
from pyspark.sql import functions as F


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

    # full lifecycle under spark-submit: append (new gen) → delete →
    # phrase/boolean query on the multi-gen index → compact
    from uci_searchengine_spark.operators.boolean import boolean_search
    from uci_searchengine_spark.operators.compact import compact_index
    from uci_searchengine_spark.operators.index_append import append_index
    from uci_searchengine_spark.operators.phrase import phrase_search
    from uci_searchengine_spark.operators.tombstones import delete_docs

    # append a disjoint slice: the larger corpus's pages not in gen-0
    old_urls = [r["url"] for r in pages.select("url").distinct().collect()]
    extra = synth_pages(spark, 340, seed=1337, partitions=4).filter(
        ~F.col("url").isin(old_urls)
    )
    meta2 = append_index(spark, extra, idx, input_snapshot="submit-append")
    delete_docs(idx, [top[0][0]])
    ph = phrase_search(spark, idx, "stop0 stop1", k=3).count()
    bl = boolean_search(spark, idx, "stop0 -arbak", k=3).count()
    cidx = f"{work}/idx_compacted"
    shutil.rmtree(cidx, ignore_errors=True)
    cmeta = compact_index(spark, idx, cidx)

    print(json.dumps({
        "n_docs": meta.n_docs,
        "top": top,
        "total_results": env["total_results"],
        "metrics": build_metrics(idx),
        "lifecycle": {
            "gens": meta2.gens,
            "appended_docs": meta2.n_docs - meta.n_docs,
            "phrase_hits": ph,
            "boolean_hits": bl,
            "compacted_docs": cmeta.n_docs,
            "compacted_gens": cmeta.gens,
        },
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
