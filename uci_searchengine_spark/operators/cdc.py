"""Change-data-capture over snapshots: apply a changelog to a table
(the MERGE INTO / Delta-CDF / Iceberg-upsert shape) and diff two
snapshots back into a changelog. At 100 TB this is the GDPR-delete and
incremental-refresh primitive: you never rewrite the corpus, you apply
the day's (insert/update/delete) relation to it.

Reference shape: the crawler's recrawl mode upserts by url through
index generations (`operators/index_append`); this is the same
keep-latest semantics lifted to a general relational operator.

Pinned semantics (`apply_changelog`):

* per key, the WINNING change is the max of struct(version, op,
  payload) — an aggregate argmax, never a window (a hot key with 10^6
  queued changes is one combiner row, the repo's canonicalization
  rule). Versions are expected unique per key (Delta/Iceberg commit
  ordinals); ties fall back to the documented struct order.
* winner op 'D' ⇒ the key disappears; 'I'/'U' ⇒ the winner's payload
  (full-row semantics, MERGE's WHEN MATCHED THEN UPDATE SET *);
  untouched snapshot keys pass through.

``snapshot_diff`` is the inverse: full-outer join old/new on key and
emit I (new only), D (old only), U (both, payload differs) — and
``apply_changelog(old, snapshot_diff(old, new)) ≡ new`` is the
round-trip law the tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPS = ("I", "U", "D")


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: "list[str]",
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Apply ``changes`` (snapshot's columns + version + op) to
    ``snapshot``; returns the new snapshot with the original column
    order."""
    payload = [c for c in snapshot.columns if c not in key_cols]
    missing = [
        c
        for c in snapshot.columns + [version_col, op_col]
        if c not in changes.columns
    ]
    if missing:
        raise ValueError(f"changes is missing columns: {missing}")
    win = changes.groupBy(*key_cols).agg(
        F.max(
            F.struct(
                F.col(version_col).alias("v"),
                F.col(op_col).alias("op"),
                *[F.col(c).alias(c) for c in payload],
            )
        ).alias("_w")
    )
    joined = snapshot.alias("s").join(win.alias("w"), key_cols, "full_outer")
    kept = joined.filter(
        F.col("_w").isNull() | (F.col("_w.op") != F.lit("D"))
    )
    cols = [F.col(c) for c in key_cols] + [
        F.when(F.col("_w").isNotNull(), F.col(f"_w.{c}"))
        .otherwise(F.col(f"s.{c}"))
        .alias(c)
        for c in payload
    ]
    return kept.select(*cols).select(*snapshot.columns)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: "list[str]",
    version: int = 1,
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """The changelog that turns ``old`` into ``new``: one full-outer
    join on the key — I rows carry the new payload, D rows the old
    (tombstone with last-known values, the Delta CDF convention), U
    rows the new payload and appear only when the payload actually
    differs (null-safe comparison)."""
    if old.columns != new.columns:
        raise ValueError("old and new must share the same schema")
    payload = [c for c in old.columns if c not in key_cols]
    # presence flags that survive all-null payloads: use a marker col
    o2 = old.withColumn("_po", F.lit(1)).alias("o")
    n2 = new.withColumn("_pn", F.lit(1)).alias("n")
    j = o2.join(n2, key_cols, "full_outer")
    changed = (
        F.lit(False)
        if not payload
        else ~F.expr(
            " AND ".join(
                f"(o.{c} <=> n.{c})" for c in payload
            )
        )
    )
    op = (
        F.when(F.col("o._po").isNull(), F.lit("I"))
        .when(F.col("n._pn").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
        .otherwise(F.lit(None))
    )
    pick = [
        F.when(op == F.lit("D"), F.col(f"o.{c}"))
        .otherwise(F.col(f"n.{c}"))
        .alias(c)
        for c in payload
    ]
    return (
        j.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(
            *[F.col(c) for c in key_cols],
            *pick,
            F.lit(version).cast("long").alias(version_col),
            F.col(op_col),
        )
    )
