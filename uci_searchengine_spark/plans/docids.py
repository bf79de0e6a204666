"""Deterministic dense docID assignment, stable across cluster sizes.

doc_id = global rank of url in ascending sort order. Required for
rank-identity of BM25 results across parallelism levels (SURVEY.md §4):
`monotonically_increasing_id` is neither dense nor stable, and a global
row_number window funnels everything through one partition at 100 TB.

Scalable two-pass scheme:
1. range-repartition by url + sort within partitions (range partitions are
   globally ordered: every url in partition i < every url in partition i+1),
2. count rows per partition (tiny collect), prefix-sum into offsets,
3. within-partition row_number (parallel window keyed by partition id)
   + broadcast offset.

The DataFrame is cached between the two passes so the sampled range
boundaries cannot shift between them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(df: DataFrame, order_col: str = "url", partitions: int | None = None) -> DataFrame:
    """Add a dense ``doc_id`` = global rank of ``order_col`` (unique values).

    Returns a *cached* DataFrame — caller unpersists when done.
    """
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    counts = {r["_pid"]: r["cnt"] for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    return ranged.withColumn(
        "doc_id",
        (F.row_number().over(w) - 1 + offset_expr[F.col("_pid")]).cast("long"),
    ).drop("_pid")


def dense_rank_global_with_count(
    df: DataFrame,
    key_cols: list[str],
    out_col: str = "rank",
    partitions: int | None = None,
) -> "tuple[DataFrame, int]":
    """:func:`dense_rank_global` plus the TOTAL distinct-key count,
    which the two-pass scheme computes anyway (the driver prefix-sum's
    final accumulator). Callers that would otherwise run a separate
    ``countDistinct`` action per invocation (the suffix-array doubling
    loop's convergence check) get it for free — one fewer job per
    round."""
    return _dense_rank_global_impl(df, key_cols, out_col, partitions)


def dense_rank_global(
    df: DataFrame,
    key_cols: list[str],
    out_col: str = "rank",
    partitions: int | None = None,
) -> DataFrame:
    """Add a global 0-based DENSE rank of the composite key (equal keys
    → equal rank) without the single-partition global window.

    Same two-pass shape as :func:`assign_doc_ids`, extended for dense
    semantics: range-repartition + in-partition sort gives globally
    ordered partitions; one tiny aggregate collects each partition's
    (distinct-key count, first key, last key); the driver prefix-sums
    the distinct counts, subtracting 1 whenever a key STRADDLES a
    partition boundary (partition i's first key == partition i−1's
    last key — that key was already ranked); the second pass is a
    per-partition dense_rank window plus the broadcast base offset.
    Because a straddling key is by construction both the max of the
    left partition and the min of the right, the chain rule composes
    across any number of straddled partitions.

    Returns a *cached* DataFrame — caller unpersists when done."""
    return _dense_rank_global_impl(df, key_cols, out_col, partitions)[0]


def _dense_rank_global_impl(
    df: DataFrame,
    key_cols: list[str],
    out_col: str,
    partitions: int | None,
) -> "tuple[DataFrame, int]":
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    keys = [F.col(c) for c in key_cols]
    ranged = (
        df.repartitionByRange(parts, *keys)
        .sortWithinPartitions(*key_cols)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    stats = {
        r["_pid"]: (r["nd"], r["lo"], r["hi"])
        for r in ranged.groupBy("_pid")
        .agg(
            F.countDistinct(*keys).alias("nd"),
            F.min(F.struct(*keys)).alias("lo"),
            F.max(F.struct(*keys)).alias("hi"),
        )
        .collect()
    }
    if not stats:  # empty input: zero-arg create_map below would fail
        return (
            ranged.withColumn(out_col, F.lit(0).cast("long")).drop("_pid"),
            0,
        )
    bases, acc, prev_hi = {}, 0, None
    for pid in sorted(stats):
        nd, lo, hi = stats[pid]
        if prev_hi is not None and tuple(lo) == tuple(prev_hi):
            acc -= 1
        bases[pid] = acc
        acc += nd
        prev_hi = hi
    base_expr = F.create_map(
        *[x for pid, b in bases.items() for x in (F.lit(pid), F.lit(b))]
    )
    w = Window.partitionBy("_pid").orderBy(*key_cols)
    return (
        ranged.withColumn(
            out_col,
            (F.dense_rank().over(w) - 1 + base_expr[F.col("_pid")]).cast(
                "long"
            ),
        ).drop("_pid"),
        acc,
    )
