"""Scaling-efficiency evidence for the north rule (N → 4N parallelism).

Runs the IDENTICAL index build (same deterministic input corpus, same
shard/bucket config) at local[8] and local[32] in one process (sequential
SparkSessions), reports docs/sec at both plus
``eff = (T_8 / T_32) / 4`` and writes BENCH/scaling_latest.md. Also
reports query p50/p95 at both parallelism levels.

NOTE: the per-round driver artifact comes from bench.py, whose scaling
section supersedes this script's protocol (pre-warmed persistent
workers, probe-gated rounds, paired host controls — see bench.py's
docstring). This script remains the minimal standalone two-level
evidence runner.

This is the sandbox proxy for two cluster sizes (BASELINE.md): local[N]
threads ≙ N executor cores; the build has no driver-side bottleneck
(docID offsets + manifests are O(partitions)), so thread-level scaling is
the honest signal available without a real cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOCS = int(os.environ.get("SCALE_DOCS", "50000"))
SEED = 1337
QUERIES = [
    "stop0",
    "arbak stop1",
    "stop0 stop1 stop2 stop3",
    "arband arbast",
    "arbak arbal arbam arban arbar arbas arbat arbav",
]
REPO = os.path.dirname(os.path.abspath(__file__))


def pages_path() -> str:
    return os.path.join(REPO, "_data", f"pages_{N_DOCS}_s{SEED}")


def ensure_corpus(spark) -> None:
    """Generate the deterministic corpus parquet once (untimed): the build
    under measurement reads a materialized table, as it would in prod."""
    from uci_searchengine_spark.sources.synth import synth_pages

    p = pages_path()
    if not os.path.exists(os.path.join(p, "_SUCCESS")):
        synth_pages(spark, N_DOCS, SEED, partitions=64).write.mode(
            "overwrite"
        ).parquet(p)


def run_at(cores: int) -> dict:
    from uci_searchengine_spark.operators.index_build import build_index, build_metrics
    from uci_searchengine_spark.operators.wand import score_wand
    from uci_searchengine_spark.session import get_spark

    idx = os.path.join(REPO, "_data", f"scale_index_c{cores}")
    shutil.rmtree(idx, ignore_errors=True)
    spark = get_spark(
        app_name=f"scale-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    ensure_corpus(spark)
    pages = spark.read.parquet(pages_path())

    # warm-up outside the timed window: JIT/codegen warmup + spawn the
    # Python workers (steady-state throughput is what scales with cores;
    # a cold 32-worker import storm is a per-session constant, not work)
    import pandas as _pd

    def _noop(it):
        import numpy as _np
        import uci_searchengine_spark.operators.codec  # noqa: F401

        # pre-fault each worker's arena (first-touch page faults on this
        # box are pathologically slow; see session.get_spark)
        buf = _np.empty(48_000_000, dtype=_np.int64)
        buf[::512] = 1
        del buf
        for pdf in it:
            yield _pd.DataFrame({"n": [len(pdf)]})

    spark.range(cores * 4, numPartitions=cores).mapInPandas(_noop, "n long").collect()

    t0 = time.perf_counter()
    build_index(
        spark,
        pages,
        idx,
        num_shards=32,
        n_buckets=16,
        input_snapshot=f"synth:seed={SEED}:n={N_DOCS}",
        write_partitions=cores,
    )
    build_s = time.perf_counter() - t0

    lat = []
    for q in QUERIES:
        t0 = time.perf_counter()
        rows = score_wand(spark, idx, q, k=10).collect()
        lat.append(time.perf_counter() - t0)
    res = {
        "cores": cores,
        "build_seconds": round(build_s, 2),
        "docs_per_sec": round(N_DOCS / build_s, 1),
        "query_p50_ms": round(1000 * statistics.median(lat), 1),
        "query_p95_ms": round(1000 * sorted(lat)[-1], 1),
        "metrics": build_metrics(idx),
        "top1_check": rows[0]["doc_id"] if rows else None,
    }
    spark.stop()
    return res


def _step_path(cores: int) -> str:
    return os.path.join(REPO, "_data", f"scale_result_c{cores}_{N_DOCS}.json")


def main() -> None:
    """Stepwise CLI: `gen` / `run 8` / `run 32` / `report` (or no args =
    everything in one process)."""
    if len(sys.argv) > 1:
        cmd = sys.argv[1]
        if cmd == "gen":
            from uci_searchengine_spark.session import get_spark

            spark = get_spark(master="local[32]", shuffle_partitions=32)
            ensure_corpus(spark)
            spark.stop()
            print(json.dumps({"corpus": pages_path()}))
            return
        if cmd == "run":
            cores = int(sys.argv[2])
            res = run_at(cores)
            with open(_step_path(cores), "w") as f:
                json.dump(res, f)
            print(json.dumps(res))
            return
        if cmd == "report":
            n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
            n4 = int(sys.argv[3]) if len(sys.argv) > 3 else 32
            report(json.load(open(_step_path(n))), json.load(open(_step_path(n4))))
            return
        raise SystemExit(f"unknown subcommand {cmd}")
    r8 = run_at(8)
    r32 = run_at(32)
    report(r8, r32)


def report(r8: dict, r32: dict) -> None:
    eff = (r8["build_seconds"] / r32["build_seconds"]) / 4.0
    # rank-identity across parallelism is asserted in tests; record the spot check
    identical = r8["top1_check"] == r32["top1_check"]
    out = {"n_docs": N_DOCS, "local8": r8, "local32": r32,
           "scaling_efficiency": round(eff, 3), "rank_spot_check_identical": identical}
    print(json.dumps(out))

    n_c, n4_c = r8["cores"], r32["cores"]
    md = f"""# BENCH — measured baselines (this engine)

Scaling evidence for the north rule (N → 4N parallelism, sandbox proxy:
`local[{n_c}]` vs `local[{n4_c}]`, same machine, same deterministic input).

Corpus: synthetic Common-Crawl-style pages per BASELINE.json input_hint,
seed={SEED}, n={N_DOCS} docs. Identical build config at both sizes
(32 shards, 16 buckets); shuffle partitions and write partitions scale
with cores.

| metric | local[{n_c}] (N) | local[{n4_c}] (4N) |
|---|---|---|
| build wall-clock (s) | {r8['build_seconds']} | {r32['build_seconds']} |
| build docs/sec | {r8['docs_per_sec']} | {r32['docs_per_sec']} |
| query p50 (ms) | {r8['query_p50_ms']} | {r32['query_p50_ms']} |
| query p95 (ms) | {r8['query_p95_ms']} | {r32['query_p95_ms']} |
| postings | {r8['metrics']['postings']} | {r32['metrics']['postings']} |
| segment bytes | {r8['metrics']['bytes']} | {r32['metrics']['bytes']} |

**Scaling efficiency (T_N / T_4N) / 4 = {eff:.3f}** (target ≥ 0.8).

Top-1 doc for the probe query identical across parallelism levels:
{identical} (full rank-identity across partitionings is asserted by
tests/test_determinism_resume.py).

Reference repo publishes no numbers (BASELINE.md): its structural bound is
≤1 page/sec ingest (rate-limited, concurrency 1) and an index builder that
is never invoked; any positive docs/sec here exceeds it. The honest
comparison target is therefore the scaling criterion plus the absolute
numbers above, regenerable with `python bench_scaling.py`.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # scaling_latest.md, NOT BASELINE.md: BENCH/BASELINE.md grew into the
    # curated round-by-round measurement history (protocol rationale,
    # host-weather episodes, per-round records) — a standalone rerun of
    # this script must never clobber it. The curated file links here.
    with open(os.path.join(REPO, "BENCH", "scaling_latest.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
