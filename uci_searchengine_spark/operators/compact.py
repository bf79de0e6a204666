"""Compaction: fold generations + tombstones back into one fresh index.

``compact_index`` rebuilds from the index's OWN doc store — surviving
docs only (tombstones dropped, upserted urls already hold one live
version) — producing a single-generation index with un-frozen
statistics. This is the merge step of the Lucene-shaped lifecycle:
build → append/upsert (generations) → delete (tombstones) → compact.

Page reconstruction inverts the pinned extractor exactly (the extractor
concatenates title text into the document text — functions/extract.py):

* real title (``text`` starts with it): ``<title>T</title>`` + body =
  ``text[len(T):]`` → extractor re-yields title = T, text = T + body ≡
  the stored text, byte-for-byte;
* fallback title (== url) or any non-prefix oddity: no title tag, body =
  the stored text → tokens preserved (display title falls back to url).

Doc ids are re-ranked (fresh global url ranks) — compaction renumbers,
exactly like a Lucene merge; urls are the stable identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.index_build import (
    IndexMeta,
    build_index,
    load_docs,
)


def _esc(c: F.Column) -> F.Column:
    return F.replace(
        F.replace(
            F.replace(c, F.lit("&"), F.lit("&amp;")), F.lit("<"), F.lit("&lt;")
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )


def surviving_pages(spark: SparkSession, index_dir: str) -> DataFrame:
    """(url, warc_ts, html) reconstructed from the live doc store."""
    from uci_searchengine_spark.operators.tombstones import load_tombstone_ids

    docs = load_docs(spark, index_dir).select("doc_id", "url", "title", "text")
    t = load_tombstone_ids(index_dir)
    if t.size:
        tomb = spark.createDataFrame([(int(i),) for i in t], "doc_id long")
        docs = docs.join(F.broadcast(tomb), "doc_id", "left_anti")
    has_title = (F.col("title") != F.col("url")) & F.col("text").startswith(
        F.col("title")
    )
    body = F.when(
        has_title, F.expr("substring(text, length(title) + 1)")
    ).otherwise(F.col("text"))
    head = F.when(
        has_title,
        F.concat(F.lit("<head><title>"), _esc(F.col("title")), F.lit("</title></head>")),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html>"), head, F.lit("<body>"), _esc(body), F.lit("</body></html>")
    )
    return docs.select(
        "url",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
    )


def compact_index(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    input_snapshot: str = "compact",
) -> IndexMeta:
    """Rebuild the live corpus into ``out_dir`` (fresh single-gen index,
    same analysis flags and shard count as the source)."""
    meta = IndexMeta.load(index_dir)
    return build_index(
        spark,
        surviving_pages(spark, index_dir),
        out_dir,
        num_shards=meta.num_shards,
        input_snapshot=input_snapshot,
        stem=bool(getattr(meta, "stem", False)),
        positions=bool(getattr(meta, "positions", False)),
    )
