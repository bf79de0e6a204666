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
   for the whole batch). ``decode="shared"`` additionally dedupes the
   per-term varint decodes: one decode per row per bucket, exhaustive
   scoring in the same float order (bit-equal results) — measured 2×
   warm / 5.8× cold faster on a term-overlapping 32-query sweep
   (BENCH/BASELINE.md); the per-query default keeps block skipping,
   which wins on disjoint single-rare-term batches;
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

# decode="auto" switches to shared when the batch's df-weighted term
# reuse crosses this: at multiplicity R the per-query path decodes each
# posting ~R times, the shared path once (paid for with exhaustive
# scoring instead of block skipping). Measured on the bench shapes:
# shared won 2x warm / 5.8x cold at R~10 (32 overlapping queries) and
# lost on disjoint batches (R~1); 3.0 splits those regimes with margin.
DECODE_AUTO_THRESHOLD = 3.0


def decode_multiplicity(
    q_terms: "dict[str, list[str]]", df: "dict[str, int]"
) -> float:
    """df-weighted average number of queries each posting is decoded
    for: Σ_q Σ_{t∈q} df(t) ÷ Σ_{t∈union} df(t). 1.0 = fully disjoint
    batch; large = heavy term overlap (the shared-decode regime).
    Terms absent from ``df`` (not in this bucket / index) contribute 0."""
    union = {t for ts in q_terms.values() for t in ts if t in df}
    denom = float(sum(df[t] for t in union))
    if denom <= 0:
        return 1.0
    num = float(
        sum(df.get(t, 0) for ts in q_terms.values() for t in ts)
    )
    return num / denom


_BATCH_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def _score_shared(
    decoded: "list[tuple[float, np.ndarray, np.ndarray, np.ndarray]]",
    avgdl: float,
    base: int,
    bucket_size: int,
    k: int,
    excl: "np.ndarray | None",
) -> pd.DataFrame:
    """Exhaustive OR scoring from PRE-DECODED postings (the shared-decode
    batch path): rows already (idf, d, tf, dl) and sorted by upper bound
    desc — the same float-accumulation order as wand._score_bucket, so
    scores are bit-equal to the pruned path for every returned doc."""
    from uci_searchengine_spark import BM25_B, BM25_K1

    acc = np.zeros(bucket_size, dtype=np.float64)
    for w, d, tf, dl in decoded:
        if excl is not None and excl.size and d.size:
            p = np.clip(np.searchsorted(excl, d), 0, excl.size - 1)
            m = excl[p] != d
            d, tf, dl = d[m], tf[m], dl[m]
        if not d.size:
            continue
        tf_f = tf.astype(np.float64)
        contrib = w * (
            tf_f
            * (BM25_K1 + 1.0)
            / (tf_f + BM25_K1 * (1.0 - BM25_B + BM25_B * dl.astype(np.float64) / avgdl))
        )
        np.add.at(acc, d - base, contrib)
    nz = np.flatnonzero(acc > 0)
    if not nz.size:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "score": pd.Series([], dtype="float64")}
        )
    scores = acc[nz]
    if nz.size > k:
        kth = np.partition(scores, nz.size - k)[nz.size - k]
        keep = scores >= kth
        nz, scores = nz[keep], scores[keep]
    order = np.lexsort((nz, -scores))[:k]
    return pd.DataFrame(
        {"doc_id": (nz[order] + base).astype("int64"), "score": scores[order]}
    )


def batch_topk(
    spark: SparkSession,
    index_dir: str,
    queries: "dict[str, str] | list[tuple[str, str]]",
    k: int = 10,
    mode: str = "or",
    decode: str = "per-query",
) -> DataFrame:
    """(query_id, doc_id, score): BM25 top-k per query, every query's
    ranking identical to the single-query scorer's (pytest-pinned).

    ``queries``: {query_id: query text} (or (id, text) pairs).

    ``decode``: "auto" (recommended — per scoring bucket, pick "shared"
    when the batch's measured df-weighted term overlap
    (``decode_multiplicity`` over the bucket's own df_global column)
    crosses ``DECODE_AUTO_THRESHOLD``, else "per-query"; zero extra
    I/O, and both strategies are bit-equal so the choice is pure
    performance), "per-query" (default — each query runs the block-max
    pruned scorer; terms shared by queries decode once per query) or
    "shared" (OR mode only: every pruned row decodes ONCE per bucket and
    all queries score exhaustively from the shared arrays — wins when
    the batch's queries overlap heavily on terms, loses the per-query
    block skipping; equality is pytest-pinned, the trade is measured in
    BENCH/BASELINE.md). "auto" under mode="and" always resolves to
    "per-query" (shared is OR-only)."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    if decode not in ("per-query", "shared", "auto"):
        raise ValueError(
            f"decode must be per-query|shared|auto, got {decode!r}"
        )
    if decode == "shared" and mode != "or":
        raise ValueError("decode='shared' supports mode='or' only")
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
                decode_eff = decode
                if decode == "auto":
                    dfm = {
                        t: int(d)
                        for t, d in zip(
                            seg_pdf["term"], seg_pdf["df_global"]
                        )
                    }
                    decode_eff = (
                        "shared"
                        if mode == "or"
                        and decode_multiplicity(q_terms, dfm)
                        >= DECODE_AUTO_THRESHOLD
                        else "per-query"
                    )
                if decode_eff == "shared":
                    from uci_searchengine_spark.operators.codec import (
                        unpack_postings,
                    )

                    base = int(seg_pdf["bucket"].iloc[0]) * bucket_size
                    has_gen = "gen_avgdl" in seg_pdf.columns
                    by_term: dict[str, list] = {}
                    for r in seg_pdf.itertuples(index=False):
                        w = idf_all[r.term]
                        d, tf, dl = unpack_postings(bytes(r.postings))
                        # same upper-bound sort key as the pruned scorer
                        # (incl. the multi-generation avgdl inflation, so
                        # the accumulation ORDER — and therefore the
                        # float sum — matches bit for bit)
                        from uci_searchengine_spark import BM25_K1

                        bm = np.asarray(r.block_max, dtype=np.float64)
                        infl = (
                            max(1.0, avgdl / float(r.gen_avgdl))
                            if has_gen
                            else 1.0
                        )
                        ub = (
                            w * (BM25_K1 + 1.0)
                            * (bm.max() if bm.size else 0.0) * infl
                        )
                        by_term.setdefault(r.term, []).append((ub, w, d, tf, dl))
                    for qid, ts in q_terms.items():
                        rows = [x for t in ts for x in by_term.get(t, [])]
                        if not rows:
                            continue
                        rows.sort(key=lambda x: -x[0])
                        pdf = _score_shared(
                            [(w, d, tf, dl) for _, w, d, tf, dl in rows],
                            avgdl, base, bucket_size, k, excl_local,
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
