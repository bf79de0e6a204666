"""Filter-context search: BM25 top-k restricted to an ALLOWED set of
documents given as a Spark relation (Lucene's filter clause / Elastic's
``bool.filter`` — the filter constrains eligibility, never the score).

The allowed set arrives as a DataFrame of global doc ids — itself the
output of an arbitrary relational predicate (language, domain, date
range, a join against an allowlist...), so the filter composes with the
whole DataFrame API. Delivery to the scorers reuses the tombstone
machinery's bucket grid: the relation is keyed by ``doc_id div
bucket_size`` and COGROUPED with the segment rows per scoring bucket, so
each task receives only its own bucket's allowed ids — constant driver
memory at any filter size, no join against the postings, no shuffle of
the (huge) segment relation beyond the groupBy(bucket) it already does.

Correctness: the inclusion mask is applied at accumulation time inside
``_score_bucket`` / ``_score_bucket_and`` — before θ ever tightens — so
block-max pruning stays admissible for the post-filter top-k (same
argument as tombstone exclusion; a post-scoring filter would silently
drop filtered-in docs that unfiltered docs had pruned away).

Tombstones compose by folding into the allowed relation (anti-join) —
one mechanism per bucket, no 3-way cogroup.

Reference: no filtered search exists in UCI-SearchEngine; breadth
extension with Lucene semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.bm25 import idf as idf_fn
from uci_searchengine_spark.operators.bm25 import terms_for_index
from uci_searchengine_spark.operators.index_build import IndexMeta
from uci_searchengine_spark.operators.wand import (
    _TOPK_SCHEMA,
    _score_bucket,
    _score_bucket_and,
    load_excl,
    pruned_segments,
)


def _bucketed(allowed: DataFrame, bucket_size: int) -> DataFrame:
    return allowed.select(
        (F.col("doc_id").cast("long") / F.lit(bucket_size))
        .cast("long")
        .alias("bucket"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )


def filtered_topk(
    spark: SparkSession,
    index_dir: str,
    query: str,
    allowed: DataFrame,
    k: int = 10,
    mode: str = "or",
) -> DataFrame:
    """Top-k (doc_id, score) among ``allowed`` docs only.

    ``allowed``: DataFrame with a ``doc_id`` column (global index doc
    ids). Scores are pure BM25 — identical to the unfiltered score of
    the same doc (filter context, not a boost)."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    meta = IndexMeta.load(index_dir)
    terms = terms_for_index(meta, query)
    empty = spark.createDataFrame([], "doc_id long, score double")
    if not terms:
        return empty

    excl = load_excl(index_dir, spark, meta.bucket_size)
    excl_arr: "np.ndarray | None" = None
    if isinstance(excl, np.ndarray):
        # common case: tombstones fit the driver closure — ship alongside
        # the inclusion mask, zero extra plan nodes
        excl_arr = excl
    elif excl is not None:  # BucketedExcl relation: fold into the filter
        allowed = allowed.join(excl.df.select("doc_id"), "doc_id", "left_anti")

    seg = pruned_segments(spark, index_dir, meta, terms)
    n_docs, avgdl, bucket_size = meta.n_docs, meta.avgdl, meta.bucket_size
    n_terms = len(terms)

    def fn(key, seg_pdf, incl_pdf):
        if not len(seg_pdf):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        incl = np.unique(incl_pdf["doc_id"].to_numpy().astype(np.int64))
        idf_map = {
            t: idf_fn(n_docs, int(d))
            for t, d in zip(seg_pdf["term"], seg_pdf["df_global"])
        }
        if mode == "and":
            return _score_bucket_and(
                seg_pdf, idf_map, avgdl, bucket_size, n_terms, k,
                excl=excl_arr, incl=incl,
            )
        return _score_bucket(
            seg_pdf, idf_map, avgdl, bucket_size, k, excl=excl_arr, incl=incl
        )

    per_bucket = (
        seg.groupBy("bucket")
        .cogroup(_bucketed(allowed, bucket_size).groupBy("bucket"))
        .applyInPandas(fn, schema=_TOPK_SCHEMA)
    )
    return per_bucket.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
