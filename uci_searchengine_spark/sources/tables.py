"""Table-format switch: Iceberg when the runtime is present, parquet
otherwise (SURVEY.md §7 step 8).

Reference analog: multi-database switching behind one session factory
(backend/app/database/connection.py:36-135, routes.py:62-130) — the
reference swaps SQLite/Postgres/MySQL per request; this engine swaps the
*table format* behind one reader/writer pair.

Iceberg needs its Spark runtime JAR plus a catalog config; this container
ships neither, so ``resolve_format("iceberg")`` probes the JVM classpath
for the Iceberg catalog class and falls back to ``"parquet"`` with a
warning. The parquet path keeps the engine's own manifest/lineage scheme
(operators/index_build), which carries the resume/lineage duties an
Iceberg snapshot would provide natively. On a cluster with
``--packages org.apache.iceberg:iceberg-spark-runtime-...`` and a
catalog configured, the same call writes a real Iceberg table with no
code change.

Probe record (round 3, 2026-08-17): attempted to fetch
``iceberg-spark-runtime`` from Maven Central to exercise the real
branch — the sandbox has no DNS (``urlopen('https://repo1.maven.org')``
→ ``URLError: Name or service not known``) and no Iceberg jar exists
anywhere on the image (``find / -name '*iceberg*'`` empty, pyspark
jars dir checked). The Iceberg branch therefore remains
classpath-gated and untested in this environment by necessity;
tests/test_partitioning.py covers the probe + fallback behavior.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "iceberg")


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def resolve_format(spark: SparkSession, fmt: str | None) -> str:
    """Normalize + validate a format request, degrading iceberg→parquet
    when the runtime is absent (never fails the job over a packaging
    difference — the reference's connection fallback behavior)."""
    fmt = (fmt or "parquet").lower()
    if fmt not in FORMATS:
        raise ValueError(f"unknown table format {fmt!r}; expected {FORMATS}")
    if fmt == "iceberg" and not iceberg_available(spark):
        warnings.warn(
            "iceberg runtime not on the classpath; falling back to parquet "
            "(identical layout to --format parquet)",
            stacklevel=2,
        )
        return "parquet"
    return fmt


def write_table(
    df: DataFrame,
    target: str,
    fmt: str | None = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """Write ``df`` as ``fmt``; returns the RESOLVED format actually used.

    ``target`` is a path for parquet, a catalog identifier for iceberg.
    """
    resolved = resolve_format(df.sparkSession, fmt)
    if resolved == "iceberg":
        w = df.writeTo(target).using("iceberg")
        for c in partition_by or []:
            w = w.partitionedBy(c)
        w.createOrReplace()
    else:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)
    return resolved


def read_table(spark: SparkSession, target: str, fmt: str | None = "parquet") -> DataFrame:
    """Read a table written by ``write_table`` (same fallback rule)."""
    resolved = resolve_format(spark, fmt)
    if resolved == "iceberg":
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)
