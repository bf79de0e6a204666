"""Phrase search over the compressed segment index.

Physical plan (match-then-verify, the classic non-positional-index
strategy): candidates come from the index via rarest-first conjunctive
posting-list intersection (wand._score_bucket_and — cost bounded by the
rarest term's list), and adjacency is verified against the doc store
INSIDE the same per-bucket task. The doc store is hive-partitioned by
the SAME doc-range buckets the scorer is grouped by, so each pandas task
reads exactly its own `docs/bucket=N/` files with a pyarrow doc_id
filter — candidate fetch is co-located by construction: no join, no
second shuffle, reads pruned to the intersection survivors. Python-side
work (tokenize + sequence scan) is bounded by the intersection size,
never the corpus — the hot path (posting decode, intersection) stays
numpy over the varint planes.

Scale note: at 10^12 docs the alternative — positional postings — costs
~2-3x index size; match-then-verify keeps the index small and pays one
doc-store point-read per AND-surviving candidate, the right trade for
phrase queries whose conjunctive candidate sets are rare-term bounded.

Reference: no phrase operator exists in UCI-SearchEngine
(backend/app/api/search.py:79-82 is a pure token OR); breadth extension.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uci_searchengine_spark.functions.phrase import count_phrase_py
from uci_searchengine_spark.operators.bm25 import analyze_seq
from uci_searchengine_spark.operators.bm25 import idf as idf_fn
from uci_searchengine_spark.operators.index_build import IndexMeta
from uci_searchengine_spark.operators.wand import (
    _score_bucket_and,
    pruned_segments,
)

_OUT_SCHEMA = "doc_id long, score double, n_occ int"


def _verify_bucket(
    docs_dir: str, bucket: int, ids: np.ndarray, seq: list[str], stem: bool
) -> dict[int, int]:
    """Read this bucket's doc-store files pruned to the candidate ids
    (pyarrow predicate → row-group skip; docs are written doc_id-sorted
    per bucket) and count phrase occurrences under the build tokenizer."""
    import pyarrow.dataset as pads

    from uci_searchengine_spark.functions.tokenize import tokenize_series

    part = os.path.join(docs_dir, f"bucket={bucket}")
    if not os.path.isdir(part):
        return {}
    tbl = pads.dataset(part, format="parquet").to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(ids.tolist()),
    )
    pdf = tbl.to_pandas()
    toks = tokenize_series(pdf["text"])
    if stem:
        from uci_searchengine_spark.functions.stem import stem_tokens

        toks = toks.map(stem_tokens)
    return {
        int(d): count_phrase_py(t, seq)
        for d, t in zip(pdf["doc_id"], toks)
    }


def phrase_search(
    spark: SparkSession, index_dir: str, phrase: str, k: int = 10
) -> DataFrame:
    """Top-k (doc_id, score, n_occ) among docs containing the exact
    analyzed token sequence; score = the same OR-sum BM25 as score_wand,
    rank (score desc, doc_id asc)."""
    meta = IndexMeta.load(index_dir)
    seq = analyze_seq(meta, phrase)
    empty = spark.createDataFrame([], _OUT_SCHEMA)
    if not seq:
        return empty
    terms = list(dict.fromkeys(seq))
    n_terms = len(terms)
    seg = pruned_segments(spark, index_dir, meta, terms)
    docs_dir = os.path.join(index_dir, "docs")
    n_docs, avgdl, bucket_size = meta.n_docs, meta.avgdl, meta.bucket_size
    stem = bool(getattr(meta, "stem", False))

    def score_fn(key, seg_pdf):
        out_empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
                "n_occ": pd.Series([], dtype="int32"),
            }
        )
        if not len(seg_pdf):
            return out_empty
        idf_map = {
            t: idf_fn(n_docs, int(d))
            for t, d in zip(seg_pdf["term"], seg_pdf["df_global"])
        }
        # k=None: the FULL intersection — truncating before adjacency
        # verification would be wrong (a verified doc outside the raw
        # AND top-k could belong in the phrase top-k)
        cand = _score_bucket_and(
            seg_pdf, idf_map, avgdl, bucket_size, n_terms, k=None
        )
        if not len(cand):
            return out_empty
        bucket = int(seg_pdf["bucket"].iloc[0])
        occ = _verify_bucket(
            docs_dir, bucket, cand["doc_id"].to_numpy(), seq, stem
        )
        cand = cand.assign(
            n_occ=cand["doc_id"].map(lambda d: occ.get(int(d), 0)).astype("int32")
        )
        cand = cand[cand["n_occ"] > 0]
        # NOW per-bucket truncation is safe (scores already sorted desc,
        # doc asc by _score_bucket_and — stable head keeps the contract)
        return cand.head(k)

    per_bucket = seg.groupBy("bucket").applyInPandas(score_fn, schema=_OUT_SCHEMA)
    return per_bucket.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
