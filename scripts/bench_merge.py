"""Merge-vs-compact wall-time evidence (BENCH/BASELINE.md addendum).

Builds a two-generation index with tombstones at BENCH_MERGE_DOCS
(default 20k) docs, then times:

* ``compact_index`` — the rebuild path (extract + tokenize + pack the
  surviving corpus from the doc store), and
* ``merge_generations`` — decode → concat → repack, no tokenizer,

both producing equivalent single-generation indexes (equality is pinned
by tests/test_merge.py; this script measures cost only). Prints one
JSON line. The ratio is the point: at 100 TB a maintenance pass must be
IO-bound, and the merge path removes the CPU stage entirely.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from uci_searchengine_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(os.environ.get("BENCH_MERGE_DOCS", "20000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_root = os.environ.get("BENCH_MERGE_DIR", "_data/bench_merge")
    spark = get_spark(
        app_name="bench-merge", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    from uci_searchengine_spark.operators.compact import compact_index
    from uci_searchengine_spark.operators.index_append import append_index
    from uci_searchengine_spark.operators.index_build import build_index
    from uci_searchengine_spark.operators.merge import merge_generations
    from uci_searchengine_spark.operators.tombstones import delete_docs
    from uci_searchengine_spark.sources.synth import synth_pages

    import shutil

    shutil.rmtree(out_root, ignore_errors=True)
    src = os.path.join(out_root, "idx")
    pages = synth_pages(spark, n, seed=99, partitions=int(cpus))
    # split on the url md5 so both halves are ~even without a full sort
    h = F.abs(F.xxhash64("url")) % 2
    build_index(
        spark, pages.filter(h == 0), src,
        num_shards=8, input_snapshot="bm-gen0",
    )
    append_index(spark, pages.filter(h == 1), src, input_snapshot="bm-gen1")
    delete_docs(src, list(range(0, n // 20)))  # 5% tombstones

    t0 = time.perf_counter()
    cmeta = compact_index(spark, src, os.path.join(out_root, "compacted"))
    t_compact = time.perf_counter() - t0

    t0 = time.perf_counter()
    mmeta = merge_generations(spark, src, os.path.join(out_root, "merged"))
    t_merge = time.perf_counter() - t0

    assert mmeta.n_docs == cmeta.n_docs
    print(json.dumps({
        "metric": "merge_vs_compact",
        "n_docs_live": mmeta.n_docs,
        "compact_s": round(t_compact, 2),
        "merge_s": round(t_merge, 2),
        "speedup": round(t_compact / t_merge, 2),
        "merge_docs_per_sec": round(mmeta.n_docs / t_merge, 1),
        "compact_docs_per_sec": round(cmeta.n_docs / t_compact, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
