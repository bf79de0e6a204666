"""Structured Streaming ingestion: incremental postings == batch postings."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
@pytest.mark.slow
def test_incremental_postings_match_batch(spark, tmp_path_factory):
    from uci_searchengine_spark.schema import PAGES_SCHEMA
    from uci_searchengine_spark.sources.synth import synth_pages_local
    from uci_searchengine_spark.streaming.ingest import (
        incremental_postings,
        stream_pages,
        _batch_postings,
    )

    base = str(tmp_path_factory.mktemp("stream"))
    pages_dir = os.path.join(base, "pages")
    out_dir = os.path.join(base, "postings")
    ckpt = os.path.join(base, "ckpt")

    pdf = synth_pages_local(40, 1337)
    # land pages in two file batches (two "crawl rounds")
    spark.createDataFrame(pdf.iloc[:20], PAGES_SCHEMA).write.mode("append").parquet(pages_dir)
    spark.createDataFrame(pdf.iloc[20:], PAGES_SCHEMA).write.mode("append").parquet(pages_dir)

    q = incremental_postings(stream_pages(spark, pages_dir, max_files=1), out_dir, ckpt)
    q.awaitTermination(120)

    got = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in _batch_postings(
            spark.createDataFrame(pdf, PAGES_SCHEMA)
        ).collect()
    }
    assert got == want

    # resume semantics: restarting the stream processes nothing new.
    # (raw row counts can exceed len(got): duplicate-url pages landing in
    # different micro-batches emit identical rows — same hashed doc_id,
    # same tf — which the dict comparison above collapses by design)
    rows_before = spark.read.parquet(out_dir).count()
    q2 = incremental_postings(stream_pages(spark, pages_dir, max_files=1), out_dir, ckpt)
    q2.awaitTermination(60)
    after = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert after == got
    assert spark.read.parquet(out_dir).count() == rows_before


@pytest.mark.spark
@pytest.mark.slow
def test_windowed_page_counts_streaming_matches_batch(spark, tmp_path_factory):
    from uci_searchengine_spark.schema import PAGES_SCHEMA
    from uci_searchengine_spark.sources.synth import synth_pages_local
    from uci_searchengine_spark.streaming.ingest import stream_pages, windowed_page_counts

    base = str(tmp_path_factory.mktemp("streamw"))
    pages_dir = os.path.join(base, "pages")
    pdf = synth_pages_local(40, 1337)
    spark.createDataFrame(pdf, PAGES_SCHEMA).write.parquet(pages_dir)

    agg = windowed_page_counts(stream_pages(spark, pages_dir))
    q = (
        agg.writeStream.format("memory")
        .queryName("page_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows (watermark); check subset-of-batch
    got = {
        (r["window_start"], r["lang"]): r["n_pages"]
        for r in spark.sql("select * from page_counts").collect()
    }
    batch = {
        (r["w"]["start"], r["lang"]): r["n"]
        for r in spark.createDataFrame(pdf, PAGES_SCHEMA)
        .groupBy(F.window("warc_ts", "10 minutes").alias("w"), "lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for k, v in got.items():
        assert batch[k] == v
