"""Bisect the knn_candidate_pairs + scoring cost on sf0.1 embeddings.

Variants:
  cand_old   - per-table loop, zip_with/aggregate fold srp (round-5 shape)
  cand_new   - single (t,bucket) join, fold srp
  cand_unroll- single (t,bucket) join, unrolled srp
  score_fold / score_unroll over a fixed candidate set
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from uci_searchengine_spark.session import get_spark
from uci_searchengine_spark.operators.similarity import (
    _srp_planes,
    dot_expr,
    dot_lit_unrolled,
)

SF = "/root/testdata/sf0.1"


def srp_fold(vec, n_planes, dim, seed):
    planes = _srp_planes(dim, n_planes, seed)
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        d = dot_expr(F.transform(vec, lambda x: x.cast("double")), plane)
        bucket = bucket + F.when(d >= 0, F.lit(1 << p)).otherwise(0)
    return bucket.cast("int")


def srp_unroll(vec, n_planes, dim, seed):
    planes = _srp_planes(dim, n_planes, seed)
    bucket = F.lit(0)
    for p in range(n_planes):
        d = dot_lit_unrolled(vec, planes[p], cast_elems=True)
        bucket = bucket + F.when(d >= 0, F.lit(1 << p)).otherwise(0)
    return bucket.cast("int")


MASKS = [0] + [1 << p for p in range(4)] + [
    (1 << p1) | (1 << p2) for p1 in range(4) for p2 in range(p1 + 1, 4)
]


def cand_old(emb, srp):
    out = None
    for t in range(6):
        s = 11 + 97 * t
        base = emb.select(
            F.col("vec_id").alias("ib"),
            srp(F.col("embedding"), 4, 64, s).alias("bucket"),
        )
        probes = (
            emb.select(
                F.col("vec_id").alias("ia"),
                srp(F.col("embedding"), 4, 64, s).alias("_b"),
            )
            .select(
                "ia", "_b",
                F.explode(F.array(*[F.lit(m) for m in MASKS])).alias("_m"),
            )
            .select("ia", F.col("_b").bitwiseXOR(F.col("_m")).alias("bucket"))
        )
        pairs_t = (
            probes.join(base, "bucket")
            .filter(F.col("ia") < F.col("ib"))
            .select("ia", "ib")
        )
        out = pairs_t if out is None else out.unionByName(pairs_t)
    return out.distinct()


def cand_new(emb, srp):
    arr = F.array(
        *[srp(F.col("embedding"), 4, 64, 11 + 97 * t) for t in range(6)]
    )
    flat = emb.select(
        F.col("vec_id").alias("_id"), F.posexplode(arr).alias("t", "bucket")
    )
    base = flat.select(F.col("_id").alias("ib"), "t", "bucket")
    probes = (
        flat.select(
            F.col("_id").alias("ia"), "t", "bucket",
            F.explode(F.array(*[F.lit(m) for m in MASKS])).alias("_m"),
        )
        .select("ia", "t", F.col("bucket").bitwiseXOR(F.col("_m")).alias("bucket"))
    )
    return (
        probes.join(base, ["t", "bucket"])
        .filter(F.col("ia") < F.col("ib"))
        .select("ia", "ib")
        .distinct()
    )


def timeit(label, df):
    t0 = time.perf_counter()
    n = df.count()
    print(f"{label}: {time.perf_counter()-t0:.2f}s rows={n}", flush=True)


def main():
    spark = get_spark(app_name="exp", master="local[32]", shuffle_partitions=32)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").repartition(32)
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "old_fold", "new_fold", "new_unroll"
    ]
    for w in which:
        if w == "old_fold":
            timeit("cand old+fold", cand_old(emb, srp_fold))
        elif w == "old_unroll":
            timeit("cand old+unroll", cand_old(emb, srp_unroll))
        elif w == "new_fold":
            timeit("cand new+fold", cand_new(emb, srp_fold))
        elif w == "new_unroll":
            timeit("cand new+unroll", cand_new(emb, srp_unroll))
        elif w == "score":
            # fixed candidate relation: all pairs (ia < ib) via range ids
            ids = spark.range(2000).select(F.col("id").alias("ia"))
            cand = ids.crossJoin(
                spark.range(2000).select(F.col("id").alias("ib"))
            ).filter(F.col("ia") < F.col("ib"))
            e = emb.select(
                F.col("vec_id").alias("_id"),
                F.transform("embedding", lambda x: x.cast("double")).alias("_v"),
            )
            for mode in ("fold", "unroll"):
                if mode == "fold":
                    nrm = F.sqrt(
                        F.aggregate(
                            F.transform(F.col("_v"), lambda x: x * x),
                            F.lit(0.0), lambda s, x: s + x,
                        )
                    )
                else:
                    acc = F.lit(0.0)
                    for i in range(64):
                        acc = acc + F.col("_v")[i] * F.col("_v")[i]
                    nrm = F.sqrt(acc)
                ee = e.select("_id", "_v", nrm.alias("_n"))
                a = ee.select(
                    F.col("_id").alias("ia"), F.col("_v").alias("va"),
                    F.col("_n").alias("na"),
                )
                b = ee.select(
                    F.col("_id").alias("ib"), F.col("_v").alias("vb"),
                    F.col("_n").alias("nb"),
                )
                j = cand.join(a, "ia").join(b, "ib")
                if mode == "fold":
                    dot = F.aggregate(
                        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
                        F.lit(0.0), lambda acc2, x: acc2 + x,
                    )
                else:
                    dot = F.lit(0.0)
                    for i in range(64):
                        dot = dot + F.col("va")[i] * F.col("vb")[i]
                scored = j.select(
                    "ia", "ib",
                    F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cos"),
                )
                timeit(f"score {mode}", scored.filter(F.col("cos") > 0.5))
    spark.stop()


if __name__ == "__main__":
    main()
