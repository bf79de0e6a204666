"""Z-order data layout clustering — the Delta/Iceberg ``OPTIMIZE
ZORDER BY`` shape: interleave the bits of several bucketed columns
into one Morton code, cluster the table on it, and multi-column
min/max scan pruning falls out of ordinary per-file statistics.

Why this matters for this engine: the reference stores every crawled
page in one SQLite table and answers every selective question with a
B-tree on exactly ONE key (``backend/app/models/page.py`` unique url
index; the crawler's frontier/visited checks). One clustering order
means one prunable dimension. At 100 TB the corpus is parquet and the
scan planner prunes row groups by min/max footer stats — but a layout
sorted by url alone makes ``crawl_date`` predicates read everything,
and vice versa. Z-ordering by (domain-bucket, date-bucket) bounds the
min/max span of EVERY interleaved dimension inside each file, so a
predicate on any one of them skips most files. This module implements:

* ``pow2_bucket`` — clamp + shift a column into ``[0, 2^bits)`` using
  only subtraction and ``shiftright`` (the bucket range is a power of
  two), so bucket ids are bit-identical in Spark and DuckDB with no
  float or integer-division semantics in play.
* ``zvalue_expr`` — the Morton interleave as a flat sum of shift/mask
  terms (output bit ``i*n+j`` = bit ``i`` of column ``j``). 2 dims ×
  8 bits is 16 codegen-friendly integer terms; no UDF, no shuffle —
  the z-value is a scan-side projection.
* ``zorder_cells`` / ``cell_stats`` — the deterministic layout model:
  fixed-width z-cells (``zval >> cell_shift``) stand in for files, and
  per-cell min/max stats are the parquet footer stats a planner would
  prune on. Deterministic (no partitioner involved) → cross-engine
  hashable, which is what the correctness gate checks.
* ``zorder_layout`` — the physical rewrite: one ``repartitionByRange``
  on the z-value + ``sortWithinPartitions``, i.e. exactly one range
  shuffle to re-cluster the table before writing. At 100 TB this is
  the standard one-pass OPTIMIZE job: range boundaries come from
  Spark's reservoir sampling, every output file covers a contiguous
  z-range, and the job is embarrassingly rewriteable per z-range.
* ``pruning_fraction`` — the measurable win: the fraction of
  cells/files whose [min,max] interval overlaps a predicate range.
  Z-order keeps this small on ALL interleaved dimensions; a
  single-column sort keeps it small on one and ~1.0 on the others
  (pytest pins the comparison on a uniform 2-d grid).

Scale shape: projection (zero exchange) → one range shuffle sized by
``num_partitions`` → sorted write. The stats pass is one grouped
aggregate with map-side combine. Nothing is driver-side, nothing is
quadratic, no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def pow2_bucket(
    col: Column, lo: int, range_bits: int, bits: int = 8
) -> Column:
    """Map ``col`` (clamped to ``[lo, lo + 2^range_bits - 1]``) onto the
    integer bucket range ``[0, 2^bits)`` by dropping the low
    ``range_bits - bits`` bits. Pure subtract/shift — bit-identical in
    Spark and DuckDB by construction (no floats, no division). This is
    the rank/bucket normalization every Z-order implementation needs:
    raw values with wildly different ranges must occupy the same bit
    budget before interleaving, else one dimension dominates the code.
    """
    if bits > range_bits:
        raise ValueError("pow2_bucket needs bits <= range_bits")
    hi = lo + (1 << range_bits) - 1
    clamped = F.greatest(F.lit(lo), F.least(F.lit(hi), col.cast("long")))
    return F.shiftright(clamped - F.lit(lo), range_bits - bits)


def pow2_bucket_sql(expr: str, lo: int, range_bits: int, bits: int = 8) -> str:
    """DuckDB mirror of :func:`pow2_bucket` (same arithmetic, SQL text)."""
    hi = lo + (1 << range_bits) - 1
    clamped = f"GREATEST({lo}, LEAST({hi}, CAST({expr} AS BIGINT)))"
    return f"(({clamped} - {lo}) >> {range_bits - bits})"


def zvalue_expr(cols: list[Column], bits: int = 8) -> Column:
    """Morton/Z-value: interleave the low ``bits`` bits of each column
    (already bucketed to ``[0, 2^bits)``) — output bit ``i*n + j`` is
    bit ``i`` of ``cols[j]``. Expressed as a flat sum of shift-and-mask
    terms: pure JVM integer arithmetic inside whole-stage codegen, and
    the exact same formula is emitted for the DuckDB oracle by
    :func:`zvalue_sql`."""
    n = len(cols)
    out: Column | None = None
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            term = F.shiftleft(bit, i * n + j)
            out = term if out is None else out + term
    assert out is not None
    return out


def zvalue_sql(exprs: list[str], bits: int = 8) -> str:
    """DuckDB mirror of :func:`zvalue_expr`: the identical sum of
    shift/mask terms as SQL text."""
    n = len(exprs)
    terms = []
    for j, e in enumerate(exprs):
        for i in range(bits):
            terms.append(
                f"(((CAST({e} AS BIGINT) >> {i}) & 1) << {i * n + j})"
            )
    return "(" + " + ".join(terms) + ")"


def zorder_cells(
    df: DataFrame,
    specs: list[tuple[str, int, int]],
    bits: int = 8,
    cell_shift: int = 8,
) -> DataFrame:
    """Add ``zval`` (Morton code over the bucketed spec columns) and
    ``cell`` (``zval >> cell_shift`` — a fixed-width z-range standing
    in for an output file) to ``df``. ``specs`` is a list of
    ``(column_name, lo, range_bits)``. Deterministic: cell assignment
    depends only on row values, never on partitioning — which is what
    makes the layout model cross-engine hashable. The physical rewrite
    with data-sized ranges is :func:`zorder_layout`."""
    bucketed = [
        pow2_bucket(F.col(c), lo, rb, bits) for (c, lo, rb) in specs
    ]
    zv = zvalue_expr(bucketed, bits)
    return df.withColumn("zval", zv).withColumn(
        "cell", F.shiftright(F.col("zval"), cell_shift)
    )


def zorder_cells_sql(
    source: str,
    specs: list[tuple[str, int, int]],
    bits: int = 8,
    cell_shift: int = 8,
) -> str:
    """DuckDB mirror of :func:`zorder_cells`: ``SELECT *, zval, cell``."""
    bucketed = [pow2_bucket_sql(c, lo, rb, bits) for (c, lo, rb) in specs]
    zv = zvalue_sql(bucketed, bits)
    return (
        f"SELECT *, {zv} AS zval, ({zv} >> {cell_shift}) AS cell "
        f"FROM {source}"
    )


def cell_stats(cells: DataFrame, stat_cols: list[str]) -> DataFrame:
    """Per-cell row count + min/max of each clustered column — the
    parquet footer statistics a scan planner prunes on. One grouped
    aggregate with map-side combine; output is O(#cells), tiny."""
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return cells.groupBy("cell").agg(*aggs)


def zorder_layout(
    df: DataFrame,
    specs: list[tuple[str, int, int]],
    bits: int = 8,
    num_partitions: int = 8,
) -> DataFrame:
    """The physical OPTIMIZE ZORDER rewrite: compute the z-value, range-
    repartition on it (Spark samples the z-value distribution to pick
    balanced boundaries — data-sized files, unlike the fixed cells of
    the analytic model), and sort within partitions so every output
    file covers one contiguous z-range with tight min/max stats on all
    interleaved columns. Exactly one shuffle; write the result with
    ``df.write.parquet`` to materialize the clustered layout."""
    bucketed = [
        pow2_bucket(F.col(c), lo, rb, bits) for (c, lo, rb) in specs
    ]
    zv = zvalue_expr(bucketed, bits)
    out = df.withColumn("zval", zv)
    return out.repartitionByRange(num_partitions, "zval").sortWithinPartitions(
        "zval"
    )


def partition_stats(df: DataFrame, stat_cols: list[str]) -> DataFrame:
    """Physical-partition min/max stats (``spark_partition_id`` keyed) —
    the per-file footer stats the :func:`zorder_layout` writer would
    produce. Used by tests/bench to measure real pruning; not a gate
    (partition ids depend on the sampled range boundaries)."""
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.withColumn("pid", F.spark_partition_id()).groupBy("pid").agg(*aggs)
    )


def pruning_fraction(
    stats: DataFrame, col: str, lo: float, hi: float
) -> float:
    """Fraction of cells/partitions whose [min,max] interval on ``col``
    overlaps the predicate range ``[lo, hi]`` — i.e. the fraction of
    files a min/max-pruning scan planner must READ for that predicate.
    Lower is better; 1.0 means the layout gives this column nothing.
    Driver-side by design: ``stats`` is the tiny O(#files) stats table,
    never the data."""
    total = stats.count()
    if total == 0:
        return 0.0
    hit = stats.filter(
        (F.col(f"min_{col}") <= F.lit(hi)) & (F.col(f"max_{col}") >= F.lit(lo))
    ).count()
    return hit / total
