"""Batch query evaluation: score MANY queries against the index in ONE
Spark job.

Offline evaluation shape: relevance sweeps, A/B reranking studies, and
training-data mining (hard-negative retrieval) all run 10^3-10^6 queries
against the same index. Looping the single-query path launches one job
per query — at cluster scale the scheduler round-trips dwarf the actual
scoring. Here the whole batch becomes one plan:

1. analyze every query once on the driver (bounded: the query table is
   tiny by definition — it's human-written queries);
2. ONE partition-pruned segment scan covering the UNION of all query
   terms (each shard dir is touched once no matter how many queries hit
   it);
3. per scoring bucket, the pandas fn scores EVERY query against the
   bucket's rows — per-query block-max pruning over the shared in-memory
   Arrow batch (the scan and the groupBy(bucket) shuffle are paid once
   for the whole batch; a cross-query decoded-postings memo inside the
   fn would additionally dedupe per-term varint decodes and is the next
   step, not needed at evaluation sizes);
4. one global per-query top-k window over ≤ n_queries·n_buckets·k rows.

Scaling: cost grows with the union term set's postings, not with the
query count — a thousand queries over a shared vocabulary cost barely
more than the distinct-term sweep. For 10^6+ query batches the driver
analysis loop itself should distribute (tokenize the query table with
the same Arrow UDF as documents); noted, not needed at evaluation sizes.

Reference: no batch path exists (one HTTP request per query,
backend/app/api/routes.py:378-387); breadth extension.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from uci_searchengine_spark.operators.bm25 import idf as idf_fn
from uci_searchengine_spark.operators.bm25 import terms_for_index
from uci_searchengine_spark.operators.index_build import IndexMeta
from uci_searchengine_spark.operators.wand import (
    _score_bucket,
    _score_bucket_and,
    apply_per_bucket,
    load_excl,
    pruned_segments,
)

_BATCH_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def batch_topk(
    spark: SparkSession,
    index_dir: str,
    queries: "dict[str, str] | list[tuple[str, str]]",
    k: int = 10,
    mode: str = "or",
) -> DataFrame:
    """(query_id, doc_id, score): BM25 top-k per query, every query's
    ranking identical to the single-query scorer's (pytest-pinned).

    ``queries``: {query_id: query text} (or (id, text) pairs)."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    pairs = list(queries.items()) if isinstance(queries, dict) else list(queries)
    meta = IndexMeta.load(index_dir)
    q_terms = {
        str(qid): terms_for_index(meta, text) for qid, text in pairs
    }
    q_terms = {qid: ts for qid, ts in q_terms.items() if ts}
    empty = spark.createDataFrame([], _BATCH_SCHEMA)
    if not q_terms:
        return empty
    union_terms = list(dict.fromkeys(t for ts in q_terms.values() for t in ts))
    seg = pruned_segments(spark, index_dir, meta, union_terms)
    n_docs, avgdl, bucket_size = meta.n_docs, meta.avgdl, meta.bucket_size

    def make_fn(excl_local):
        def fn(key, seg_pdf):
            out = []
            if len(seg_pdf):
                terms_here = set(seg_pdf["term"])
                idf_all = {
                    t: idf_fn(n_docs, int(d))
                    for t, d in zip(seg_pdf["term"], seg_pdf["df_global"])
                }
                for qid, ts in q_terms.items():
                    mine = [t for t in ts if t in terms_here]
                    if not mine:
                        continue
                    if mode == "and" and len(mine) < len(ts):
                        continue  # some term absent from this bucket
                    sub = seg_pdf[seg_pdf["term"].isin(mine)]
                    if mode == "and":
                        pdf = _score_bucket_and(
                            sub, idf_all, avgdl, bucket_size, len(ts), k,
                            excl=excl_local,
                        )
                    else:
                        pdf = _score_bucket(
                            sub, idf_all, avgdl, bucket_size, k, excl=excl_local
                        )
                    if len(pdf):
                        pdf = pdf.copy()
                        pdf.insert(0, "query_id", qid)
                        out.append(pdf)
            if not out:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series([], dtype="object"),
                        "doc_id": pd.Series([], dtype="int64"),
                        "score": pd.Series([], dtype="float64"),
                    }
                )
            return pd.concat(out, ignore_index=True)

        return fn

    excl = load_excl(index_dir, spark, meta.bucket_size)
    per_bucket = apply_per_bucket(seg, excl, make_fn, _BATCH_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_bucket.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    )
