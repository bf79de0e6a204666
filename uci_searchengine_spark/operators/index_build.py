"""Inverted-index build: pages → compressed term-sharded segments.

Pipeline (all declarative DataFrame ops + two sanctioned Arrow UDF stages):

1. **dedup** by url keeping latest ``warc_ts`` (input_hint; reference analog:
   unique url constraint + visited-set, backend/app/database/models.py:72,
   backend/app/api/crawler.py:175).
2. **extract** title/text/links from html (vectorized Arrow UDF, pinned to
   the reference extractor — see functions/extract.py).
3. **docIDs**: deterministic dense ids by url rank (plans/docids.py).
4. **tokenize** (vectorized, pinned tokenizer) → per-doc term frequencies
   computed inside the same Arrow batch (reference analog:
   backend/app/api/tokenizer.py:12-16) — emitting one row per distinct
   (term, doc) pair, so the build shuffle carries tf-aggregated pairs,
   never raw token instances.
5. **pack**: repartition by shard → sortWithinPartitions(term, bucket,
   doc_id) → mapInPandas group-carver → delta+varint posting bytes with
   per-block max-score metadata (operators/codec.py). This is the explicit
   partial-index sort-merge: the shuffle delivers each shard's postings
   once, the sort makes groups contiguous, and packing walks them in one
   Arrow pass (per-group Spark overhead would dominate with applyInPandas).

   * ``shard  = xxhash64(term) % num_shards`` → hive partition dir; query
     reads only the shards of its query terms (partition pruning ≙ the
     reference's B-tree probe on terms.term, models.py:41).
   * ``bucket = doc_id // bucket_size`` — a uniform doc-range grid. This is
     the skew control: a head term appearing in 80% of 10^12 docs is split
     into bounded, doc-range-contiguous segment rows (≤ bucket_size
     postings each) instead of one giant group — the "salted
     repartitioning" of the north star, with the salt chosen so posting
     lists stay sorted/contiguous and never need a second merge pass.
     Query-side scoring is embarrassingly parallel over buckets because a
     doc's postings for *all* terms share its bucket.
6. **write**: per-output-partition parquet files + `_manifest/*.json`
   checkpoint (docs, postings, bytes, input-snapshot lineage). A rerun
   skips every partition whose manifest is committed for the same input
   snapshot → killed builds resume without rewriting completed work.
   (Reference analog: crawler_state resumable checkpoint rows,
   models.py:162-179, and continue-mode frontier, routes.py:158-188.)

Stage boundaries (docs+postings, then segments) are materialized to
parquet, so stage 2 of a resumed build doesn't recompute extraction.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from uci_searchengine_spark import BM25_B, BM25_K1, DEFAULT_NUM_SHARDS
from uci_searchengine_spark.functions.extract import extract_html
from uci_searchengine_spark.functions.tokenize import tokenize_series
from uci_searchengine_spark.operators.codec import pack_postings
from uci_searchengine_spark.plans.docids import assign_doc_ids

SEGMENT_ROW_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("df", T.IntegerType(), False),
        T.StructField("postings", T.BinaryType(), False),
        T.StructField("block_max", T.ArrayType(T.FloatType()), False),
        T.StructField("block_offsets", T.ArrayType(T.IntegerType()), False),
        T.StructField("block_last_doc", T.ArrayType(T.LongType()), False),
    ]
)

POSTINGS_STAGE_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("doc_len", T.IntegerType(), False),
    ]
)


@dataclass
class IndexMeta:
    n_docs: int
    avgdl: float
    num_shards: int
    n_buckets: int
    bucket_size: int
    input_snapshot: str
    k1: float = BM25_K1
    b: float = BM25_B

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @staticmethod
    def load(index_dir: str) -> "IndexMeta":
        with open(os.path.join(index_dir, "meta.json")) as f:
            return IndexMeta(**json.load(f))


def _manifest_path(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, "_manifest", f"{name}.json")


def _read_manifest(index_dir: str, name: str) -> dict | None:
    p = _manifest_path(index_dir, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _commit_manifest(index_dir: str, name: str, payload: dict) -> None:
    """Atomic rename-commit of a manifest JSON."""
    p = _manifest_path(index_dir, name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, p)


def dedup_by_url(pages: DataFrame) -> DataFrame:
    """Keep the latest warc_ts row per url (deterministic tie-break)."""
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(), F.xxhash64("html").asc()
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def _tokens_udf(text: pd.Series) -> pd.Series:
    return tokenize_series(text)


def _tf_rows(it):
    """mapInPandas: (doc_id, doc_len, tokens) → (term, doc_id, tf, doc_len).

    Per-doc term counting with pandas value_counts per Arrow batch —
    the A1 hot-path mapping (SURVEY.md §2.4): the shuffle downstream sees
    one row per distinct (term, doc), never one per token instance.
    """
    for pdf in it:
        if not len(pdf):
            continue
        n = pdf["tokens"].map(len)
        ex = pd.DataFrame(
            {
                "term": np.concatenate(pdf["tokens"].to_numpy(), dtype=object)
                if len(pdf)
                else [],
                "doc_id": np.repeat(pdf["doc_id"].to_numpy(), n),
                "doc_len": np.repeat(pdf["doc_len"].to_numpy(), n),
            }
        )
        out = (
            ex.groupby(["term", "doc_id", "doc_len"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        out["tf"] = out["tf"].astype("int32")
        out["doc_len"] = out["doc_len"].astype("int32")
        yield out[["term", "doc_id", "tf", "doc_len"]]


def _pack_partition(avgdl: float):
    """mapInPandas packer over a shard-partitioned, (term,bucket,doc_id)-
    sorted stream of flat postings.

    Spark's groupBy().applyInPandas pays per-group Arrow/schema overhead —
    ruinous for millions of tiny term groups. Instead we sort within the
    shard partition and carve group boundaries ourselves: one Arrow pass,
    numpy slicing per (term, bucket) group, a held-back tail so groups that
    span Arrow batches are never split. Per-group Python is O(distinct
    terms), never O(postings) — the hot per-posting work stays vectorized
    in pack_postings.
    """

    def run(batches):
        hold: pd.DataFrame | None = None

        def emit(pdf: pd.DataFrame, last_incomplete: bool):
            nonlocal hold
            terms = pdf["term"].to_numpy()
            buckets = pdf["bucket"].to_numpy()
            # boundaries where (term, bucket) changes
            change = np.flatnonzero(
                (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
            )
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [len(pdf)]))
            if last_incomplete and len(starts):
                hold = pdf.iloc[starts[-1] :]
                starts, ends = starts[:-1], ends[:-1]
            else:
                hold = None
            if not len(starts):
                return None
            doc_ids = pdf["doc_id"].to_numpy()
            tfs = pdf["tf"].to_numpy()
            dls = pdf["doc_len"].to_numpy()
            shards = pdf["shard"].to_numpy()
            rows = []
            for s, e in zip(starts, ends):
                blob, bmax, offs, blast = pack_postings(
                    doc_ids[s:e], tfs[s:e], dls[s:e], avgdl
                )
                rows.append(
                    (
                        int(shards[s]),
                        terms[s],
                        int(buckets[s]),
                        int(e - s),
                        blob,
                        bmax,
                        offs,
                        blast,
                    )
                )
            return pd.DataFrame(
                rows,
                columns=[
                    "shard",
                    "term",
                    "bucket",
                    "df",
                    "postings",
                    "block_max",
                    "block_offsets",
                    "block_last_doc",
                ],
            )

        for pdf in batches:
            if hold is not None:
                pdf = pd.concat([hold, pdf], ignore_index=True)
            if not len(pdf):
                continue
            out = emit(pdf, last_incomplete=True)
            if out is not None and len(out):
                yield out
        if hold is not None and len(hold):
            out = emit(hold.reset_index(drop=True), last_incomplete=False)
            if out is not None and len(out):
                yield out

    return run


def _write_partition_fn(index_dir: str, snapshot: str, kind: str, order_cols: list[str]):
    """Returns a mapInPandas fn writing one parquet file per (partition,
    hive-dir) with a per-partition manifest; skips committed partitions."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark import TaskContext

    hive_col = "shard" if kind == "segments" else "bucket"

    def write(it):
        pid = TaskContext.get().partitionId()
        name = f"{kind}-{pid:05d}"
        existing = _read_manifest(index_dir, name)
        if existing and existing.get("status") == "committed" and existing.get("input_snapshot") == snapshot:
            # already built by a previous (killed) run — zero recompute
            for _ in it:
                pass
            yield pd.DataFrame({"partition_id": [pid], "skipped": [True]})
            return
        rows = 0
        tbl_bytes = 0
        postings_total = 0
        chunks = [pdf for pdf in it if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
            for hv, grp in pdf.groupby(hive_col, sort=True):
                out_dir = os.path.join(index_dir, kind, f"{hive_col}={hv}")
                os.makedirs(out_dir, exist_ok=True)
                tbl = pa.Table.from_pandas(
                    grp.drop(columns=[hive_col]), preserve_index=False
                )
                path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
                pq.write_table(tbl, path + ".tmp", compression="zstd")
                os.replace(path + ".tmp", path)
                rows += len(grp)
                tbl_bytes += os.path.getsize(path)
                if kind == "segments":
                    postings_total += int(grp["df"].sum())
        _commit_manifest(
            index_dir,
            name,
            {
                "partition_id": pid,
                "docs": rows if kind == "docs" else 0,
                "postings": postings_total,
                "bytes": tbl_bytes,
                "rows": rows,
                "input_snapshot": snapshot,
                "status": "committed",
            },
        )
        yield pd.DataFrame({"partition_id": [pid], "skipped": [False]})

    return write


_WRITE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("skipped", T.BooleanType(), False),
    ]
)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    *,
    num_shards: int = DEFAULT_NUM_SHARDS,
    n_buckets: int = 16,
    input_snapshot: str = "unknown",
    write_partitions: int | None = None,
) -> IndexMeta:
    """Build (or resume) the index at ``index_dir`` from a pages DataFrame."""
    os.makedirs(index_dir, exist_ok=True)
    parallelism = spark.sparkContext.defaultParallelism
    write_partitions = write_partitions or parallelism

    docs_stage = _read_manifest(index_dir, "stage-docs")
    if not (
        docs_stage
        and docs_stage.get("status") == "committed"
        and docs_stage.get("input_snapshot") == input_snapshot
        and docs_stage.get("num_shards") == num_shards
        and docs_stage.get("n_buckets") == n_buckets
    ):
        deduped = dedup_by_url(pages)
        with_ids = assign_doc_ids(deduped, "url")
        ex = F.col("_ex")
        extracted = (
            with_ids.withColumn("_ex", extract_html(F.col("html"), F.col("url")))
            .select(
                "doc_id",
                "url",
                ex["title"].alias("title"),
                ex["text"].alias("text"),
            )
            .withColumn("tokens", _tokens_udf(F.col("text")))
            .withColumn("doc_len", F.size("tokens").cast("int"))
        ).cache()

        stats = extracted.agg(
            F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
        ).collect()[0]
        n_docs, avgdl = int(stats["n"]), float(stats["avgdl"] or 0.0)
        bucket_size = max(1, math.ceil(n_docs / n_buckets))

        # stage-1 outputs: docs table (bucket-partitioned, doc_id-sorted for
        # row-group pruning) + flat postings parquet
        docs_df = extracted.select(
            "doc_id",
            "url",
            "title",
            "doc_len",
            (F.col("doc_id") / F.lit(bucket_size)).cast("int").alias("bucket"),
            "text",
        ).repartition(write_partitions, "bucket")
        docs_write = docs_df.mapInPandas(
            _write_partition_fn(index_dir, input_snapshot, "docs", ["doc_id"]),
            schema=_WRITE_RESULT_SCHEMA,
        )
        docs_write.collect()

        postings = extracted.select("doc_id", "doc_len", "tokens").mapInPandas(
            _tf_rows, schema=POSTINGS_STAGE_SCHEMA
        )
        postings.write.mode("overwrite").parquet(
            os.path.join(index_dir, "postings_flat")
        )
        extracted.unpersist()
        with_ids.unpersist()
        _commit_manifest(
            index_dir,
            "stage-docs",
            {
                "status": "committed",
                "input_snapshot": input_snapshot,
                "n_docs": n_docs,
                "avgdl": avgdl,
                "num_shards": num_shards,
                "n_buckets": n_buckets,
                "bucket_size": bucket_size,
            },
        )
        docs_stage = _read_manifest(index_dir, "stage-docs")

    n_docs = docs_stage["n_docs"]
    avgdl = docs_stage["avgdl"]
    bucket_size = docs_stage["bucket_size"]

    flat = spark.read.parquet(os.path.join(index_dir, "postings_flat"))
    keyed = flat.select(
        F.pmod(F.xxhash64("term"), F.lit(num_shards)).cast("int").alias("shard"),
        "term",
        (F.col("doc_id") / F.lit(bucket_size)).cast("int").alias("bucket"),
        "doc_id",
        "tf",
        "doc_len",
    )
    segments = (
        keyed.repartition(write_partitions, "shard")
        .sortWithinPartitions("shard", "term", "bucket", "doc_id")
        .mapInPandas(_pack_partition(avgdl), schema=SEGMENT_ROW_SCHEMA)
    )
    # pack and write run pipelined in the same task (no shuffle between)
    seg_write = segments.mapInPandas(
        _write_partition_fn(index_dir, input_snapshot, "segments", ["term", "bucket"]),
        schema=_WRITE_RESULT_SCHEMA,
    )
    seg_write.collect()

    meta = IndexMeta(
        n_docs=n_docs,
        avgdl=avgdl,
        num_shards=num_shards,
        n_buckets=n_buckets,
        bucket_size=bucket_size,
        input_snapshot=input_snapshot,
    )
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        f.write(meta.to_json())
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    return meta


def load_segments(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(index_dir, "segments")).parquet(
        os.path.join(index_dir, "segments")
    )


def load_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(index_dir, "docs")).parquet(
        os.path.join(index_dir, "docs")
    )


def build_metrics(index_dir: str) -> dict:
    """Aggregate per-partition manifests into build metrics
    (reference analog: crawl_statistics, models.py:142-150)."""
    mdir = os.path.join(index_dir, "_manifest")
    out = {"partitions": 0, "docs": 0, "postings": 0, "bytes": 0}
    for fn in sorted(os.listdir(mdir)):
        if not fn.endswith(".json") or fn.startswith("stage-"):
            continue
        with open(os.path.join(mdir, fn)) as f:
            m = json.load(f)
        out["partitions"] += 1
        out["docs"] += m.get("docs", 0)
        out["postings"] += m.get("postings", 0)
        out["bytes"] += m.get("bytes", 0)
    return out
