"""Explicit StructTypes for every engine table (no schema inference).

Input table `pages` follows BASELINE.json input_hint exactly:
(url string, warc_ts timestamp, html binary, text string, lang string).
Derived-table schemas are pinned in FIXTURES.md §2.
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

# extract UDF output: html -> title / text / links
EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
    ]
)

DOC_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("doc_len", T.IntegerType(), False),
        T.StructField("title", T.StringType(), True),
    ]
)

# term-sharded compressed index segment (FIXTURES.md §2)
SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.IntegerType(), False),
        T.StructField("postings", T.BinaryType(), False),
        T.StructField("block_max", T.ArrayType(T.FloatType()), False),
        T.StructField("block_offsets", T.ArrayType(T.IntegerType()), False),
        T.StructField("block_last_doc", T.ArrayType(T.LongType()), False),
    ]
)

INDEX_META_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("avgdl", T.DoubleType(), False),
        T.StructField("built_at", T.TimestampType(), False),
        T.StructField("input_snapshot", T.StringType(), False),
    ]
)

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("docs", T.LongType(), False),
        T.StructField("postings", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("input_snapshot", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)

LINKS_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType(), False),
        T.StructField("dst_url", T.StringType(), False),
    ]
)

# flat postings relation used by the naive scorer and as the segment input
POSTINGS_FLAT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
    ]
)

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_testdata(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
