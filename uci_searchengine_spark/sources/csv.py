"""CSV source — the third text wire format real corpora arrive in
(metadata sidecars, labeling exports, registry dumps). Same contract
as `sources/jsonl`: the schema is EXPLICIT always (inferSchema is a
full extra pass AND a silent column-widening hazard at corpus scale),
the reader runs PERMISSIVE with malformed lines quarantined to a
countable ``_corrupt`` column, and quoting/escaping is pinned to RFC
4180 (quote ``"``, escape by doubling) so embedded commas, quotes, and
newlines in document text round-trip — ``multiLine`` is OFF by
default because a multiline-quoted CSV is NOT splittable (one 100 GB
shard becomes one task); writers here escape newlines instead, which
keeps every shard line-splittable (the reason JSONL beats CSV for
text corpora, stated as code).

Reference: file-format breadth is engine-side extension (see
sources/jsonl.py for the family rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uci_searchengine_spark.sources.jsonl import CORRUPT_COL

CSV_OPTIONS = {
    "header": "true",
    "quote": '"',
    "escape": '"',  # RFC 4180: quotes escape by doubling
    "mode": "PERMISSIVE",
}


def read_csv(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    keep_corrupt: bool = False,
    multi_line: bool = False,
) -> DataFrame:
    """Read CSV under the EXPLICIT ``schema_ddl``; malformed rows land
    in ``_corrupt``. ``multi_line=True`` accepts quoted newlines at
    the cost of splittability — off by default, by design."""
    reader = (
        spark.read.schema(f"{schema_ddl}, {CORRUPT_COL} string")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", "true" if multi_line else "false")
    )
    for k, v in CSV_OPTIONS.items():
        reader = reader.option(k, v)
    df = reader.csv(path)
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_csv(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    newline_sub: str = "\\n",
) -> str:
    """Write RFC-4180 CSV with header. String columns get literal
    newlines substituted (``newline_sub``) so every output shard stays
    LINE-SPLITTABLE — the lossy-but-splittable trade is explicit: pass
    ``newline_sub=None`` to keep newlines (quoted correctly, but the
    file then needs multiLine readers)."""
    out = df
    if newline_sub is not None:
        # regexp_replace replacement treats \ and $ specially (Java
        # Matcher.replaceAll) — escape them so the substitution string
        # is taken literally
        lit_sub = newline_sub.replace("\\", "\\\\").replace("$", "\\$")
        for fld in df.schema.fields:
            if fld.dataType.simpleString() == "string":
                out = out.withColumn(
                    fld.name,
                    F.regexp_replace(F.col(fld.name), "[\\r\\n]", lit_sub),
                )
    w = out.coalesce(1) if single_file else out
    w.write.mode("overwrite").option("header", "true").option(
        "quote", '"'
    ).option("escape", '"').csv(path)
    return path
