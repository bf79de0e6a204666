"""Structured Streaming ingestion: incremental crawl→index analog.

The reference's nearest streaming construct is the resumable crawl loop
(backend/app/api/routes.py:144-213 fresh/continue/recrawl + the in-memory
frontier, crawler.py:58,171-172). Here that becomes:

* ``stream_pages`` — ``readStream`` over a pages directory (new files =
  newly crawled batches; on a cluster this is the landing zone of a WARC
  ingestion job or a Kafka source with the same schema).
* ``incremental_postings`` — foreachBatch: each micro-batch runs the SAME
  extract→tokenize→tf dataflow as the batch builder and appends to the
  flat-postings table; segment compaction then runs periodically (exactly
  the reference's "continue" mode: only new documents are processed).
* ``windowed_page_counts`` — event-time tumbling window + watermark on
  ``warc_ts`` (late pages allowed up to the watermark), the build-metrics
  stream (crawl_statistics analog, models.py:142-150).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.index_build import (
    POSTINGS_STAGE_SCHEMA,
    _tf_rows,
    _tokens_udf,
)
from uci_searchengine_spark.functions.extract import extract_html
from uci_searchengine_spark.schema import PAGES_SCHEMA


def stream_pages(spark: SparkSession, pages_dir: str, max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(pages_dir)
    )


def _batch_postings(batch: DataFrame) -> DataFrame:
    """extract → tokenize → per-doc tf rows; doc identity = xxhash64(url)
    (incremental batches can't see the global url order, so streaming mode
    uses hash doc ids — documented trade-off vs the batch builder)."""
    ex = F.col("_ex")
    tokenized = (
        batch.withColumn("_ex", extract_html(F.col("html"), F.col("url")))
        .select(
            F.xxhash64("url").alias("doc_id"),
            _tokens_udf(ex["text"]).alias("tokens"),
        )
        .withColumn("doc_len", F.size("tokens").cast("int"))
    )
    return tokenized.select("doc_id", "doc_len", "tokens").mapInPandas(
        _tf_rows, schema=POSTINGS_STAGE_SCHEMA
    )


def incremental_postings(
    pages_stream: DataFrame, out_dir: str, checkpoint_dir: str
):
    """writeStream.foreachBatch writing tf rows per micro-batch.

    foreachBatch is at-least-once: a crash between the sink write and the
    checkpoint commit replays the batch on restart. The sink is made
    idempotent by keying each micro-batch's output directory on batch_id
    and overwriting — a replayed batch rewrites the same files instead of
    appending duplicates (checkpoint = crawler_state analog,
    models.py:162-179; idempotent partition write = the batch builder's
    manifest pattern)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        _batch_postings(batch).write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )

    return (
        pages_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_page_counts(pages_stream: DataFrame) -> DataFrame:
    """Event-time windowed ingest metrics with late-data handling."""
    return (
        pages_stream.withWatermark("warc_ts", "1 hour")
        .groupBy(F.window("warc_ts", "10 minutes").alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages")
    )


SESSION_OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
SESSION_STATE_SCHEMA = "n_sessions long, n_events long, last_ns long"


def sessionize_events(events_stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom STATEFUL streaming operator: per-user sessionization via
    ``applyInPandasWithState`` (arbitrary state, Arrow-batched — the
    streaming form of the batch `user_sessions` gate).

    State per user = (n_sessions, n_events, last event time in ns); a gap
    > ``gap_minutes`` between consecutive events opens a new session.
    Each micro-batch emits the user's running totals (outputMode update —
    the latest row per user is the current answer).

    Ordering contract: events must land in per-user time order across
    micro-batches (the standard log-ingestion landing; within a batch any
    order is fine — the operator sorts). A production deployment facing
    out-of-order streams would put a watermark + buffer stage in front;
    the reference has no streaming analog at all (SURVEY §2.10), so this
    pins the canonical shape.
    """
    import numpy as np
    import pandas as pd

    gap_ns = gap_minutes * 60 * 1_000_000_000

    def fn(key, pdfs, state):
        (user_id,) = key
        if state.exists:
            n_sess, n_ev, last_ns = state.get
        else:
            n_sess, n_ev, last_ns = 0, 0, -1
        parts = [pdf["ts"] for pdf in pdfs if len(pdf)]
        if parts:
            ts = pd.concat(parts).sort_values()
            arr = ts.to_numpy().astype("datetime64[ns]").astype("int64")
            prev = np.concatenate(([last_ns], arr[:-1]))
            gaps_open = (arr - prev) > gap_ns
            if last_ns < 0:
                gaps_open[0] = True  # first-ever event always opens
            n_sess += int(gaps_open.sum())
            n_ev += arr.size
            last_ns = int(arr[-1])
        state.update((n_sess, n_ev, last_ns))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_sessions": [n_sess], "n_events": [n_ev]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def dedup_pages_stream(
    pages_stream: DataFrame,
    watermark: str = "10 minutes",
    key: str = "content",
) -> DataFrame:
    """Streaming exact dedup — the ingest-time form of
    ``dedup.dedup_exact`` (the batch operator keeps min-doc-id; a
    stream has no global order, so the pinned streaming semantics is
    FIRST-ARRIVAL-wins within the watermark horizon).

    ``key='content'`` fingerprints the extracted text (md5 — the same
    fingerprint relation the batch dedup and the incremental store
    probes use, so a batch-built store and this stream agree on
    identity); ``key='url'`` dedups recrawls of one url instead.

    Uses ``dropDuplicatesWithinWatermark``: state is BOUNDED by the
    event-time horizon instead of growing with the corpus — the
    production requirement for an unbounded crawl stream; a duplicate
    arriving past the horizon re-admits (at 100 TB that residue is
    exactly what the periodic batch `incremental_dedup` sweep
    removes — the published lambda shape: streaming bounds the hot
    window, batch owns history)."""
    if key == "content":
        fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    elif key == "url":
        fp = F.col("url")
    else:
        raise ValueError("key must be 'content' or 'url'")
    return (
        pages_stream.withColumn("fp", fp)
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
