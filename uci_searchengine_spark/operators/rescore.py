"""Two-phase rescoring (ES ``rescore`` API analog): cheap primary
ranking over the whole match set, an expensive secondary signal
computed ONLY for the top-``window`` docs, blended re-rank of the
window.

Pinned semantics:

* window = the top-``window`` docs by the primary rank order
  (score desc, doc_id asc) — ES's ``window_size``;
* secondary signal = ordered-proximity occurrence count of a phrase
  (``functions/phrase.py`` semantics, slop-aware), shaped as
  ``ln(1 + n_occ)`` — monotone, bounded, exactly mirrored in SQL;
* final = ``query_weight · primary + rescore_weight · ln(1+n_occ)``
  (the ES weight pair, defaults 1/1), ranked (final desc, doc_id asc);
* ``k ≤ window`` required — ES leaves sub-window results in primary
  order; this operator only returns from the window, so a larger k
  would silently mix two orderings.

Scale shape: phase 1 is the ordinary block-max pruned top-k (bounded
per-bucket heaps, one job). Phase 2 touches exactly ``window`` docs —
bounded, independent of corpus size — so it runs IN-PROCESS against
the same pruned segment files the task-local serving plan reads
(candidate-restricted positional decode / doc-store verify through the
shared phrase machinery), the same judgment call as the envelope's
bounded co-located doc fetch: distributing O(window) work would cost
more in scheduling than it buys. The expensive signal is never
evaluated corpus-wide — that is the entire point of the rescore
pattern.

Reference: no rescoring exists in UCI-SearchEngine; breadth extension
with ES semantics.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.index_build import IndexMeta
from uci_searchengine_spark.operators.wand import score_wand

_OUT = "doc_id long, score double, primary double, n_occ int"


def phrase_occ_for_ids(
    index_dir: str,
    meta: IndexMeta,
    phrase: str,
    doc_ids: np.ndarray,
    slop: int = 0,
    method: str = "auto",
) -> dict[int, int]:
    """Ordered-proximity occurrence counts for an EXPLICIT doc-id set —
    the bounded phase-2 primitive. Reads only the phrase terms' pruned
    segment rows (positional plane when available) or the candidate
    docs' doc-store row groups; cost is O(|doc_ids|), never corpus."""
    from uci_searchengine_spark.operators.local_search import (
        read_pruned_segments_local,
    )
    from uci_searchengine_spark.operators.phrase import (
        _near_counts,
        _positional_counts,
        _verify_bucket,
        phrase_plan,
    )

    seq, terms, use_pos = phrase_plan(meta, phrase, method, slop)
    if not seq:
        return {}
    out: dict[int, int] = {}
    ids = np.asarray(sorted(int(d) for d in doc_ids), dtype=np.int64)
    if not ids.size:
        return {}
    by_bucket: dict[int, np.ndarray] = {}
    for b in np.unique(ids // meta.bucket_size):
        b = int(b)
        lo, hi = b * meta.bucket_size, (b + 1) * meta.bucket_size
        by_bucket[b] = ids[(ids >= lo) & (ids < hi)]
    if use_pos:
        seg = read_pruned_segments_local(
            index_dir, meta, terms, with_positions=True
        )
        for b, cand in by_bucket.items():
            sp = seg[seg["bucket"] == b].reset_index(drop=True)
            if not len(sp) or sp["term"].nunique() < len(set(seq)):
                continue
            if slop == 0:
                occ = _positional_counts(sp, cand, b * meta.bucket_size, seq)
            else:
                occ = _near_counts(sp, cand, b * meta.bucket_size, seq, slop)
            out.update(occ)
    else:
        import os

        from uci_searchengine_spark.operators.index_build import (
            generation_dirs,
        )

        docs_dirs = [
            os.path.join(d, "docs") for d in generation_dirs(index_dir)
        ]
        stem = bool(getattr(meta, "stem", False))
        for b, cand in by_bucket.items():
            out.update(
                _verify_bucket(docs_dirs, b, cand, seq, stem, slop)
            )
    return out


def rescore_phrase(
    spark: SparkSession,
    index_dir: str,
    query: str,
    phrase: str,
    k: int = 10,
    window: int = 100,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    slop: int = 0,
    method: str = "auto",
) -> DataFrame:
    """(doc_id, score, primary, n_occ): the top-``window`` primary
    (BM25 OR) docs re-ranked by
    ``query_weight·primary + rescore_weight·ln(1+n_occ)``, truncated to
    k. See module docstring for the pinned semantics and the bounded
    phase-2 design."""
    if k > window:
        raise ValueError(f"k ({k}) must be <= window ({window})")
    meta = IndexMeta.load(index_dir)
    top = score_wand(spark, index_dir, query, k=window).collect()
    if not top:
        return spark.createDataFrame([], _OUT)
    ids = np.asarray([r["doc_id"] for r in top], dtype=np.int64)
    occ = phrase_occ_for_ids(index_dir, meta, phrase, ids, slop, method)
    rows = []
    for r in top:
        n = int(occ.get(int(r["doc_id"]), 0))
        final = query_weight * float(r["score"]) + rescore_weight * math.log1p(n)
        rows.append((int(r["doc_id"]), final, float(r["score"]), n))
    rows.sort(key=lambda t: (-t[1], t[0]))
    return spark.createDataFrame(rows[:k], _OUT)
