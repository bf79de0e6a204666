"""Shuffle-elimination helpers: bucketed co-located joins + skew salting.

Two of the north-star's explicit scale tools, as reusable operators:

* ``write_bucketed`` / ``bucketed_join`` — persist both join sides
  CLUSTERED BY the join key into the same bucket count; Spark then plans
  the equi-join as a zip of co-located buckets with NO Exchange on
  either side (tests assert the plan). At 100 TB this turns every
  repeated fact⋈fact join on the same key from a full shuffle into a
  local merge — the relational cousin of the index's pre-partitioned
  ``pshard=`` layout (a "shuffle via storage" paid once at write time).

* ``salted_join`` — for a SKEWED equi-join: explode the small side into
  ``salt`` replicas and scatter the big side's hot keys uniformly with
  ``pmod(xxhash64(...), salt)``, so one hot key spreads over ``salt``
  reducer partitions instead of melting one executor. AQE's skew-join
  handles moderate skew adaptively (enabled in session.py); explicit
  salting is for the pathological head key — same trick as the index's
  doc-range bucket grid for head terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two tables bucketed on ``on``: zero Exchange on either side
    (SortMergeJoin over co-located buckets). Caller asserts via
    ``assert_no_shuffle``."""
    return spark.table(left_table).join(spark.table(right_table), on)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains an Exchange (shuffle)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(f"plan contains a shuffle:\n{plan}")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: big side scattered over ``salt`` sub-keys by
    row hash, small side replicated ``salt`` times. Output columns =
    the plain ``big.join(small, on)``."""
    big_s = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int"),
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_s.join(small_s, [on, "_salt"]).drop("_salt")
