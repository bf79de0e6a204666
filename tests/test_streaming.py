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


@pytest.mark.spark
@pytest.mark.slow
def test_stateful_sessionization_matches_batch(spark, tmp_path_factory):
    """applyInPandasWithState sessionization over two time-ordered
    micro-batches == the batch lag()-window computation."""
    import pandas as pd

    from uci_searchengine_spark.streaming.ingest import sessionize_events

    base = str(tmp_path_factory.mktemp("sess"))
    ev_dir = os.path.join(base, "events")

    # synthetic per-user event times with gaps straddling the batch cut
    rows = []
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    eid = 0
    for user in range(6):
        t = t0 + pd.Timedelta(minutes=user)
        for k in range(10):
            # every 4th event jumps > 30 min -> new session
            t = t + pd.Timedelta(minutes=45 if k % 4 == 0 else 5)
            rows.append((eid, t.to_pydatetime(), user))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    pdf = pdf.sort_values("ts").reset_index(drop=True)
    schema = "event_id long, ts timestamp, user_id long"
    half = len(pdf) // 2
    # two time-ordered landing files (per-user order preserved)
    spark.createDataFrame(pdf.iloc[:half], schema).coalesce(1).write.mode(
        "append"
    ).parquet(ev_dir)
    spark.createDataFrame(pdf.iloc[half:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(ev_dir)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(ev_dir)
    )
    q = (
        sessionize_events(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # latest row per user = final totals
    got = {}
    for r in spark.sql("select * from sessions").collect():
        got[r["user_id"]] = (r["n_sessions"], r["n_events"])  # update mode: later overwrites

    # batch oracle (same rule as the user_sessions gate)
    want = {}
    for user, g in pdf.groupby("user_id"):
        ts = g["ts"].sort_values().to_numpy().astype("datetime64[ns]").astype("int64")
        n_sess = 1 + int(((ts[1:] - ts[:-1]) > 30 * 60 * 1_000_000_000).sum())
        want[user] = (n_sess, len(g))
    assert got == want


@pytest.mark.spark
@pytest.mark.slow
def test_stateful_sessionization_survives_restart(spark, tmp_path_factory):
    """Kill/restart semantics for the custom stateful operator: a SECOND
    streaming query on the same checkpoint must restore per-user state
    and produce the same final totals as one uninterrupted run."""
    import pandas as pd

    from uci_searchengine_spark.streaming.ingest import sessionize_events

    base = str(tmp_path_factory.mktemp("sessrestart"))
    ev_dir = os.path.join(base, "events")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    schema = "event_id long, ts timestamp, user_id long"

    rows = []
    t0 = pd.Timestamp("2024-03-01 00:00:00")
    eid = 0
    for user in range(4):
        t = t0 + pd.Timedelta(minutes=user)
        for k in range(8):
            t = t + pd.Timedelta(minutes=40 if k % 3 == 0 else 10)
            rows.append((eid, t.to_pydatetime(), user))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"]).sort_values("ts")
    half = len(pdf) // 2

    def run_round(files_written: int) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev_dir)
        )
        sess = sessionize_events(stream, gap_minutes=30)

        def handle(batch, batch_id):
            batch.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

        q = (
            sess.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # round 1: first half lands, query runs, then "the job dies"
    spark.createDataFrame(pdf.iloc[:half], schema).coalesce(1).write.mode(
        "append"
    ).parquet(ev_dir)
    run_round(1)
    # round 2: second half lands, a NEW query restarts from the checkpoint
    spark.createDataFrame(pdf.iloc[half:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(ev_dir)
    run_round(2)

    # latest batch's row per user = final totals (update mode)
    import pyspark.sql.functions as SF

    got_df = spark.read.option("basePath", out_dir).parquet(out_dir)
    latest = (
        got_df.withColumn(
            "rn",
            SF.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy(SF.desc("batch"))
            ),
        )
        .filter(SF.col("rn") == 1)
        .collect()
    )
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in latest}

    want = {}
    for user, g in pdf.groupby("user_id"):
        ts = g["ts"].sort_values().to_numpy().astype("datetime64[ns]").astype("int64")
        n_sess = 1 + int(((ts[1:] - ts[:-1]) > 30 * 60 * 1_000_000_000).sum())
        want[user] = (n_sess, len(g))
    assert got == want


@pytest.mark.spark
@pytest.mark.slow
def test_dedup_pages_stream_removes_duplicates(spark, tmp_path_factory):
    """Streaming exact dedup: duplicated texts collapse to one survivor
    per fingerprint across micro-batches, distinct texts all survive,
    and the url-keyed variant dedups recrawls. Survivor IDENTITY is
    arrival-order (pinned semantics) so assertions are set-level."""
    from uci_searchengine_spark.schema import PAGES_SCHEMA
    from uci_searchengine_spark.sources.synth import synth_pages_local
    from uci_searchengine_spark.streaming.ingest import (
        dedup_pages_stream,
        stream_pages,
    )

    base = str(tmp_path_factory.mktemp("streamdd"))
    pages_dir = os.path.join(base, "pages")
    pdf = synth_pages_local(30, 1337)
    # duplicate every third page's text under a fresh url
    dup = pdf.iloc[::3].copy()
    dup["url"] = dup["url"] + "?copy=1"
    both = __import__("pandas").concat([pdf, dup], ignore_index=True)
    df = spark.createDataFrame(both, PAGES_SCHEMA).repartition(4)
    df.write.parquet(pages_dir)

    out = dedup_pages_stream(
        stream_pages(spark, pages_dir, max_files=1), watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select fp, text from dedup_stream").collect()
    fps = [r["fp"] for r in rows]
    assert len(fps) == len(set(fps)), "duplicate fingerprints survived"
    import hashlib

    want = {hashlib.md5((t or "").encode()).hexdigest() for t in both["text"]}
    assert set(fps) == want, "some distinct content lost or invented"
    assert len(rows) == len(set(both["text"]))

    # url-keyed variant: the recrawl dedup — distinct urls all survive
    out_u = dedup_pages_stream(
        stream_pages(spark, pages_dir, max_files=2), key="url"
    )
    qu = (
        out_u.writeStream.format("memory")
        .queryName("dedup_stream_url")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    qu.awaitTermination(120)
    urls = [r["fp"] for r in spark.sql("select fp from dedup_stream_url").collect()]
    assert len(urls) == len(set(urls)) == len(set(both["url"]))

    with pytest.raises(ValueError):
        dedup_pages_stream(stream_pages(spark, pages_dir), key="nope")
