"""Event-log analytics: sequential funnels and cohort retention.

Breadth beyond the reference (whose only event surface is crawler
statistics): the hourly/watermark window gates cover time bucketing,
sessionization covers gap-based grouping; this module adds the two
remaining classic event-log shapes — a SEQUENTIAL funnel (each step
must follow the previous within a window) and the cohort-retention
matrix. Both are windowless: per-user stepwise min-aggregates
conditioned on the prior step's time, and plain aggregates + joins —
a power user with millions of events is a handful of aggregate rows,
never a sorted window partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    within: str = "INTERVAL 30 MINUTES",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-step user counts + conversion rates for an ordered step
    list: a user converts step i when their EARLIEST step-i event
    falls strictly after their step-(i-1) time and within ``within``
    of it. Each stage = one filtered join + per-user min-aggregate;
    conversion division/rounding stay engine-side."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    stage = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    counts = [stage.count()]
    for s in steps[1:]:
        stage = (
            events.filter(F.col(type_col) == s)
            .join(stage.select(user_col, "_t"), user_col)
            .filter(
                (F.col(ts_col) > F.col("_t"))
                & (F.col(ts_col) <= F.col("_t") + F.expr(within))
            )
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        counts.append(stage.count())
    spark = events.sparkSession
    # Zero-pad the step index: the table is ordered by the string
    # label, and without padding "10_x" would sort before "2_y" on
    # funnels of 10+ steps.
    rows = [
        (
            f"{i + 1:02d}_{s}",
            counts[i],
            counts[i],
            counts[i - 1] if i else counts[0],
        )
        for i, s in enumerate(steps)
    ]
    return (
        spark.createDataFrame(
            rows, "step string, n_users long, num long, den long"
        )
        .select(
            "step",
            "n_users",
            F.when(F.col("den") > 0, F.round(F.col("num") / F.col("den"), 6))
            .otherwise(F.lit(0.0))
            .alias("conv"),
        )
        .orderBy("step")
    )


def cohort_retention(
    events: DataFrame,
    max_offset: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, offset, n_active, retention): ISO-week cohorts by
    first event, distinct weekly activity, offsets 0..max_offset."""
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort")
    )
    sizes = first.groupBy("cohort").agg(F.count("*").alias("cohort_n"))
    active = events.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("week")
    ).distinct()
    cells = (
        active.join(first, user_col)
        .select(
            "cohort",
            F.floor(F.datediff(F.col("week"), F.col("cohort")) / 7)
            .cast("int")
            .alias("offset"),
            user_col,
        )
        .filter(F.col("offset").between(0, max_offset))
        .groupBy("cohort", "offset")
        .agg(F.countDistinct(user_col).alias("n_active"))
    )
    return (
        cells.join(sizes, "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "offset",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_n"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "offset")
    )
