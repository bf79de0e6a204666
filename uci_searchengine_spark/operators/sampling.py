"""Deterministic (hash-based) sampling for training-data pipelines.

`df.sample()` is seed-dependent on partitioning and row order, which
makes pipeline reruns non-reproducible at scale; every sampler here
derives its keep/split decision from a content hash of a key column, so
the SAME rows are selected regardless of partition count, executor
count, or row order — and a DuckDB oracle can reproduce the exact
selection (the md5-prefix trick shared with operators/dedup.py).

All expressions are pure JVM (md5 + conv + comparison) and fold into the
scan as ordinary filters: at 100 TB a 1% stratified sample is one
predicate-pushed pass, zero shuffles, no driver involvement.

Reference: no sampling exists in UCI-SearchEngine — breadth extension
for the LLM-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^32 — the md5-prefix u32 is uniform on [0, 2^32)
_U32_SPAN = float(1 << 32)


def hash_uniform_col(key: Column) -> Column:
    """Deterministic uniform [0,1) per key: first 8 hex chars of
    md5(key) as u32 / 2^32. Portable — DuckDB:
    CAST(('0x' || substr(md5(k),1,8)) AS UBIGINT) / 4294967296.0"""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
            "double"
        )
        / _U32_SPAN
    )


def hash_uniform_sql(key: str) -> str:
    """DuckDB mirror of ``hash_uniform_col``."""
    return (
        f"(CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)),1,8)) AS UBIGINT)"
        f" / 4294967296.0)"
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep rows whose hash-uniform falls below `fraction` — the
    deterministic analog of df.sample(fraction)."""
    return df.filter(hash_uniform_col(F.col(key_col)) < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample head
    languages, keep tail languages whole). Strata missing from
    `fractions` keep `default`. One scan-side predicate, no shuffle."""
    frac = F.lit(float(default))
    for v, f in fractions.items():
        frac = F.when(F.col(strata_col) == v, F.lit(float(f))).otherwise(frac)
    return df.filter(hash_uniform_col(F.col(key_col)) < frac)


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float
) -> DataFrame:
    """Adds a deterministic `split` column ('test' below the threshold,
    'train' otherwise). Stable across reruns/partitionings — the property
    that matters for leakage-free splits of a growing corpus."""
    return df.withColumn(
        "split",
        F.when(
            hash_uniform_col(F.col(key_col)) < F.lit(float(test_fraction)),
            F.lit("test"),
        ).otherwise(F.lit("train")),
    )
