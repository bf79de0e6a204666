"""JSONL (newline-delimited JSON) source — the other wire format
web-corpus dumps actually arrive in (Common-Crawl derivative sets,
OpenWebText-style releases, most labeling-pipeline exports).

Contract: the schema is EXPLICIT, always. ``inferSchema``-style
sampling is wrong twice at corpus scale — it costs a full extra pass,
and a 100 TB dump with one malformed shard silently widens a column
for every downstream reader. Readers here take a DDL schema string,
run in ``PERMISSIVE`` mode, and surface malformed lines in a
``_corrupt`` column the caller can count/quarantine instead of
crashing the job on row 10^11 (the CCNet operational rule: bad lines
are data, not exceptions).

Scale shape: ``spark.read.json`` with an explicit schema is one
splittable scan (gzip members aside) with column pruning through the
JSON parser — Jackson only materializes requested fields; the parse
IS the scan projection, no Python anywhere.

Reference: UCI-SearchEngine ingests only its own crawler's SQLite rows
(backend/app/services/crawler.py); file-format breadth
(parquet/iceberg-fallback/WARC/JSONL) is engine-side extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON under the EXPLICIT ``schema_ddl``.
    Malformed lines land in ``_corrupt`` (PERMISSIVE mode);
    ``keep_corrupt=False`` (default) drops them after the scan —
    callers that must account for loss read with ``True`` and
    count/quarantine the column themselves."""
    reader = (
        spark.read.schema(f"{schema_ddl}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    df = reader.json(path)
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def corrupt_count(spark: SparkSession, path: str, schema_ddl: str) -> int:
    """Number of malformed lines — the quarantine metric a 100 TB
    ingest reports per shard. Spark refuses a query that references
    ONLY the corrupt column of a raw JSON scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the documented contract is to
    materialize first — in production the ingest caches/persists the
    batch anyway before splitting it into accepted + quarantined."""
    df = read_jsonl(spark, path, schema_ddl, keep_corrupt=True).cache()
    try:
        return df.filter(F.col(CORRUPT_COL).isNotNull()).count()
    finally:
        df.unpersist()


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> str:
    """Write as JSONL (test/export helper; production exports keep the
    parallel writer — ``single_file`` exists for deterministic
    fixtures only)."""
    w = df.coalesce(1) if single_file else df
    w.write.mode("overwrite").json(path)
    return path
