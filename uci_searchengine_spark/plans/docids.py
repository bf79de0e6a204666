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
