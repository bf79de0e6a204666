"""Per-query isolation bench (guide §1.4): times individual declared
queries with the SAME session shape as bench.py (local[$SPARK_GRAFT_CPUS],
shuffle_partitions=cpus) and the same fn(spark, SF_DIR) + count()
methodology, plus optional noop-sink timing (full materialization of
every column) and .explain("formatted") capture to plans/r06/.

bench.py itself is FROZEN for driver measurement; this file exists so
optimization work can isolate one query at a time without re-running the
whole suite.

Usage:
  python bench_extra.py q1,q2,... [--tag before|after] [--runs N]
                                  [--noop] [--explain]
  python bench_extra.py --v2      # every HEADLINE_V2 query
  python bench_extra.py --v1      # every HEADLINE (relational) query
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    runs = 2
    for a in list(flags):
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
            flags.discard(a)
            flags.add("--runs")
    tag = "before"
    for a in list(flags):
        if a.startswith("--tag="):
            tag = a.split("=")[1]
            flags.discard(a)

    from bench import HEADLINE, HEADLINE_V2  # frozen lists
    from uci_searchengine_spark.entry_queries import QUERIES
    from uci_searchengine_spark.session import get_spark

    if "--v2" in flags:
        names = HEADLINE_V2
    elif "--v1" in flags:
        names = HEADLINE
    else:
        names = args[0].split(",") if args else []
    if not names:
        print("no queries given", file=sys.stderr)
        sys.exit(2)

    spark = get_spark(
        app_name="bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    sc = spark.sparkContext
    out: dict[str, dict] = {}
    for name in names:
        fn, _sql = QUERIES[name]
        rec: dict = {"count_s": [], "noop_s": []}
        for i in range(runs):
            sc.setJobDescription(f"{name} count pass {i}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.count()
            rec["count_s"].append(round(time.perf_counter() - t0, 3))
        if "--noop" in flags:
            for i in range(runs):
                sc.setJobDescription(f"{name} noop pass {i}")
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                rec["noop_s"].append(round(time.perf_counter() - t0, 3))
        if "--explain" in flags:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            pdir = os.path.join(REPO, "plans", "r06")
            os.makedirs(pdir, exist_ok=True)
            with open(os.path.join(pdir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            rec["explain"] = f"plans/r06/{name}_{tag}.txt"
        sc.setJobDescription(None)
        rec["count_min"] = min(rec["count_s"])
        if rec["noop_s"]:
            rec["noop_min"] = min(rec["noop_s"])
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print("TOTAL", json.dumps({k: v["count_min"] for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
