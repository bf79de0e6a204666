"""Soft deletes (tombstones) for a built index.

``delete_docs`` appends doc ids to ``<index>/tombstones/*.parquet``;
every query path subtracts them from its candidates. Deliberately
Lucene-shaped semantics: corpus statistics (n_docs, avgdl, df) keep
counting tombstoned docs until the index is rebuilt/compacted — deletes
are metadata, scoring of surviving docs is unchanged, and a rebuild
without the deleted pages is the compaction step.

Scale note: the exclusion set is loaded driver-side as a sorted int64
array and shipped in the scorer closures (the same mechanism boolean
NOT uses), which is exact and cheap up to ~10^7 tombstones (80 MB).
Beyond that the right plan is a bucket-cogrouped exclusion relation
(tombstones are doc-range bucketed exactly like everything else) — the
load helper enforces the cap with a clear error naming the rebuild
path, rather than silently degrading.

Reference: no delete path exists (crawled pages are append-only);
breadth extension.
"""

from __future__ import annotations

import os
import uuid

import numpy as np

_CAP = 10_000_000


def delete_docs(index_dir: str, doc_ids) -> int:
    """Append tombstones; returns the total tombstone count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    d = os.path.join(index_dir, "tombstones")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"tomb-{uuid.uuid4().hex[:12]}.parquet")
    pq.write_table(pa.table({"doc_id": ids}), path + ".tmp")
    os.replace(path + ".tmp", path)
    return load_tombstone_ids(index_dir).size


def load_tombstone_ids(index_dir: str) -> np.ndarray:
    """Sorted unique tombstoned doc ids (empty array if none)."""
    import pyarrow.parquet as pq

    d = os.path.join(index_dir, "tombstones")
    if not os.path.isdir(d):
        return np.empty(0, dtype=np.int64)
    parts = []
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".parquet"):
            parts.append(
                pq.read_table(os.path.join(d, fn), columns=["doc_id"])
                .column("doc_id")
                .to_numpy()
            )
    if not parts:
        return np.empty(0, dtype=np.int64)
    out = np.unique(np.concatenate(parts)).astype(np.int64)
    if out.size > _CAP:
        raise ValueError(
            f"{out.size} tombstones exceeds the driver-array cap ({_CAP}); "
            "rebuild the index without the deleted pages (compaction)"
        )
    return out


def clear_tombstones(index_dir: str) -> None:
    import shutil

    shutil.rmtree(os.path.join(index_dir, "tombstones"), ignore_errors=True)
