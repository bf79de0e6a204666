"""As-of (temporal) join — a first-class operator Spark's DataFrame API
lacks, built as a composition of existing relational ops.

``asof_join(left, right)`` attaches, to every left row, the most recent
right row of the same key whose timestamp is ≤ the left row's timestamp
(backward direction, inclusive) — the standard "last known state at event
time" join used by feature pipelines (latest user event before an order,
last price before a trade, most recent crawl before a query snapshot).

Why not the obvious formulations:

* ``left JOIN right ON key AND r.ts <= l.ts`` + keep-latest explodes:
  every left row matches ALL earlier right rows of its key — O(|L|·|R|)
  per key before the window prunes it. Useless at 10^12 rows.
* A lateral/correlated subquery isn't expressible in the DataFrame API
  and would be a nested-loop anyway.

This implementation is the MERGE formulation: union both sides tagged
(right=0, left=1), one hash shuffle on the key, and a running
``last(value, ignorenulls=True)`` over (ts, tag, tiebreak) within each
key. The window frame is (unbounded preceding → current row), so Spark
evaluates it as a streaming pass over each key's sorted run — no
buffering beyond the sort, no row explosion, exactly ONE shuffle of
|L|+|R| rows. Right rows sort BEFORE left rows at equal ts (tag 0 < 1),
which gives the inclusive ``r.ts <= l.ts`` semantics; among right rows
with identical ts the LAST by ``tiebreak`` wins, making the result
deterministic on real data where timestamps collide.

Scale notes (100 TB): cost = one shuffle + per-key sort, identical shape
to sessionization; a pathologically hot key (one user with 10^9 events)
is the same skew problem every keyed window has — pre-filter right to
the tolerance horizon, or salt by time-bucket and run the join per
bucket with a carry-in boundary row (the streaming variant in
streaming/ingest.py does exactly that with state).

No reference analog (the reference has no temporal joins); this is part
of the training-data-pipeline surface, same tier as dedup/ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | tuple[str, str],
    left_ts: str,
    right_ts: str,
    value_cols: dict[str, str],
    tiebreak: str | None = None,
    tolerance_micros: int | None = None,
) -> DataFrame:
    """Backward as-of join (inclusive): latest right row with
    ``right[right_ts] <= left[left_ts]`` per ``on`` key.

    on              key column name, or (left_key, right_key) when the
                    two sides name it differently
    value_cols      right column → output alias (what the match attaches)
    tiebreak        right column ordering equal-ts matches (max wins);
                    pass one on any data where timestamps can collide,
                    or the match is sort-nondeterministic
    tolerance_micros  optional max allowed (left_ts - right_ts) gap in
                    microseconds; staler matches become NULL

    Left rows with no qualifying match keep NULLs in the attached
    columns (left-outer semantics). Forward as-of = call with both ts
    columns negated/reversed upstream.
    """
    lkey, rkey = (on, on) if isinstance(on, str) else on
    out_names = list(value_cols.values())
    if len(set(out_names)) != len(out_names):
        raise ValueError("value_cols aliases must be unique")

    rv = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(a) for c, a in value_cols.items()],
    )
    r2 = right.select(
        F.col(rkey).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        rv.alias("__rv"),
    )
    l2 = left.select(
        F.col(lkey).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lv"),
    )
    # unionByName fills the side-specific struct columns with NULL
    u = r2.unionByName(l2, allowMissingColumns=True)

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("__asof", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    if tolerance_micros is not None:
        # cast: parquet timestamps may load as TIMESTAMP_NTZ, which
        # unix_micros rejects (session tz is pinned UTC, so this is exact)
        gap = F.unix_micros(F.col("__ts").cast("timestamp")) - F.unix_micros(
            F.col("__asof.__rts").cast("timestamp")
        )
        matched = matched.withColumn(
            "__asof", F.when(gap <= F.lit(tolerance_micros), F.col("__asof"))
        )
    return matched.select(
        "__lv.*",
        *[F.col(f"__asof.{a}").alias(a) for a in out_names],
    )
