"""Pre-warmed persistent scaling-visit worker (one per parallelism level).

Why a subprocess that stays alive: the scaling protocol's enemy on this
host is PHASE FLIPS — the microVM's delivered CPU/page-fault capacity
swings 2-10x on a ~30 s timescale (BENCH/bench_detail_latest.json
probe_history), which is SHORTER than a cold visit (JVM spin-up +
python-worker warm-up + timed build + paired controls ≈ 2-4 min). With
cold visits, the local[2] and local[8] timed builds of one "interleaved
round" still land in different phases and the measured N→4N efficiency
grades the hypervisor, not the dataflow (r5 degraded-window run: engine
0.386 while the host's own paired mem control read 0.044-0.25).

This worker pays the spin-up ONCE: it starts its SparkSession, runs an
untimed warm-up build (JIT + codegen + python-worker pool + arena
faults), then blocks on stdin. The orchestrator (bench.py) probes the
host phase and, the moment it reads healthy, fires `build` at the
local[2] worker then the local[8] worker back-to-back — the whole timed
pair fits in ~30-45 s, inside one phase.

Line protocol on stdin/stdout (stdout lines are sentinel-prefixed so
Spark/console noise can never corrupt the channel):
  in : build            -> wipe index dir, settle, timed build
  out: @SCALE@ {"t": seconds}
  in : quit             -> stop session, exit 0
  out on start: @SCALE@ {"ready": cores}

argv: cores corpus_path n_docs index_dir warm_corpus_path
Corpora are pre-materialized by the orchestrator (untimed table
maintenance); workers only read them, so concurrent workers never race
on generation.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SENTINEL = "@SCALE@ "


def _emit(obj: dict) -> None:
    sys.stdout.write(SENTINEL + json.dumps(obj) + "\n")
    sys.stdout.flush()


def _settle() -> None:
    # same between-run settle as bench.py: compact + brief quiesce
    try:
        with open("/proc/sys/vm/compact_memory", "w") as f:
            f.write("1")
    except OSError:
        pass
    time.sleep(3)


def main() -> None:
    cores = int(sys.argv[1])
    corpus = sys.argv[2]
    n_docs = int(sys.argv[3])
    index_dir = sys.argv[4]
    warm_corpus = sys.argv[5]

    from uci_searchengine_spark.operators.index_build import build_index
    from uci_searchengine_spark.session import get_spark

    spark = get_spark(
        app_name=f"scale-worker-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warm-up: spawns + faults the python worker pool, JITs the
    # JVM, compiles the codegen stages — the same map-only path the
    # timed builds take (pages_path => plan_ranged_file_groups stage 1)
    w = index_dir + "_warm"
    shutil.rmtree(w, ignore_errors=True)
    build_index(
        spark, None, w, num_shards=32, n_buckets=16,
        input_snapshot="warm", pages_path=warm_corpus,
    )
    shutil.rmtree(w, ignore_errors=True)
    _emit({"ready": cores})

    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "quit":
            break
        if cmd == "build" or cmd.startswith("build "):
            # `build [wp]` — optional explicit write_partitions (task-grid
            # width); bare `build` keeps build_index's default (= cores)
            wp = None
            parts = cmd.split()
            if len(parts) == 2:
                wp = int(parts[1])
            shutil.rmtree(index_dir, ignore_errors=True)
            _settle()
            t0 = time.perf_counter()
            build_index(
                spark, None, index_dir,
                num_shards=32, n_buckets=16,
                input_snapshot=f"synth:seed=1337:n={n_docs}",
                pages_path=corpus,
                write_partitions=wp,
            )
            _emit({"t": round(time.perf_counter() - t0, 3)})
    shutil.rmtree(index_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
