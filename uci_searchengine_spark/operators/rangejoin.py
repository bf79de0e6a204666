"""Bucketized interval range join: points ⋈ intervals on
``start <= point <= end`` as an EQUI-join, not a nested loop.

The naive Spark plan for a range predicate is
BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons, the
same all-pairs failure the LSH/IVF candidate joins exist to avoid on
the vector side. The published scale answer (the Databricks
range-join "bin" optimization, and the standard time-bucket pattern in
every streaming join) is to discretize the shared axis:

* each interval explodes to the fixed-width buckets it covers —
  ``sequence(start div w, end div w)``, a scan-side JVM projection;
* each point maps to exactly ONE bucket (``point div w``);
* the join becomes an equi-join on the bucket, followed by the exact
  ``BETWEEN`` filter on the survivors.

Because a point has exactly one bucket, every qualifying (point,
interval) pair meets in exactly one bucket — no dedup step, no
double-counting. Replication is bounded: an interval of length L
covers at most ``L/w + 2`` buckets, so choosing ``w`` near the median
interval length keeps the exploded side within ~2× its input while the
(typically much larger) point side is never replicated at all.
At 100 TB the bucket column is also the natural partition key: both
sides shuffle once on ``bucket`` and every comparison is local.

Axis type is ``long`` (days, seconds, integer positions) — callers
discretize timestamps first (``datediff`` for days), which keeps every
expression engine-portable integer math.

Reference: UCI-SearchEngine has no interval operator; the closest
shape is its crawl-window filtering (backend/app/services/search.py
date guards), which SQLite serves with a B-tree range scan per query.
This is the distributed form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def _fdiv(c: Column, w: int) -> Column:
    """Bucket id: floor(c / w) on a NON-NEGATIVE long axis. Uses the
    subtract-mod form so the division's numerator is an exact multiple
    of w; exact for axis values < 2^53 (covers day/second/millisecond
    offsets from any practical epoch). Callers use offsets from a fixed
    epoch, non-negative by construction — negative axes would need
    floor-mod semantics that differ between engines."""
    cl = c.cast("long")
    return ((cl - (cl % F.lit(w))) / F.lit(w)).cast("long")


def explode_interval_buckets(
    intervals: DataFrame, start_col: str, end_col: str, width: int
) -> DataFrame:
    """One row per (interval, covered bucket). Degenerate intervals
    (end < start) are dropped up front — they can match nothing, and
    letting them reach ``sequence`` would build a descending range."""
    if width <= 0:
        raise ValueError(f"bucket width must be positive, got {width}")
    iv = intervals.filter(F.col(end_col) >= F.col(start_col))
    return iv.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                _fdiv(F.col(start_col), width), _fdiv(F.col(end_col), width)
            )
        ),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    width: int,
) -> DataFrame:
    """Inner join of ``points`` × ``intervals`` where
    ``start_col <= point_col <= end_col``, as bucket-equi-join + exact
    filter. Output columns = all point columns followed by all interval
    columns (names must not collide — same contract as DataFrame.join).

    Each qualifying pair appears exactly once: the point owns exactly
    one bucket, and the interval covers that bucket iff the BETWEEN can
    hold. Plan shape (pytest/plan-audit pinned): one Exchange per side
    on the bucket key, an equi-join, zero CartesianProduct /
    BroadcastNestedLoopJoin."""
    pts = points.withColumn(_BUCKET, _fdiv(F.col(point_col), width))
    iv = explode_interval_buckets(intervals, start_col, end_col, width)
    joined = pts.join(iv, _BUCKET).filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop(_BUCKET)
