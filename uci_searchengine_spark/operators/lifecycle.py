"""Ingest-loop composition: delta → build/append → policy merge → switch.

The pieces exist separately (crawler round deltas, ``append_index``,
``should_merge``/``merge_generations``, ``IndexRegistry``); this module
is the loop a production ingest actually runs per batch:

1. first batch builds the index, later batches append a generation
   (upserts auto-tombstone re-seen urls);
2. when the tiered policy trips (generation count or tombstone
   fraction), the index is merged — no re-tokenization — into a NEW
   registry version (visibility is atomic: an index is listed only once
   its meta.json lands, and merge writes meta.json last);
3. the registry CURRENT pointer switches; readers that loaded the old
   version keep serving it (directories are immutable), new loads get
   the merged one. Old versions stay until deleted via the registry —
   the reference's database-switch retention model (routes.py:62-130).

Reference parity: the reference's crawler writes straight into the live
SQLite database; at cluster scale the analog is exactly this
append + policy-merge + pointer-switch loop (Lucene/Iceberg commit
model).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from uci_searchengine_spark.operators.index_build import IndexMeta
from uci_searchengine_spark.registry import IndexRegistry


def ingest_round(
    spark: SparkSession,
    delta_pages: DataFrame,
    registry: IndexRegistry,
    *,
    base_name: str = "idx",
    num_shards: int = 8,
    n_buckets: "int | None" = None,
    positions: bool = False,
    input_snapshot: str = "ingest",
    max_gens: int = 4,
    max_tombstone_frac: float = 0.2,
) -> str:
    """Apply one page delta to the registry's current index and run the
    merge policy. Returns the current version name afterwards."""
    from uci_searchengine_spark.operators.index_append import append_index
    from uci_searchengine_spark.operators.index_build import build_index
    from uci_searchengine_spark.operators.merge import (
        merge_generations,
        should_merge,
    )

    cur = registry.current()
    if cur is None:
        d = os.path.join(registry.root, base_name)
        kw = {"n_buckets": n_buckets} if n_buckets else {}
        build_index(
            spark, delta_pages, d, num_shards=num_shards,
            positions=positions, input_snapshot=input_snapshot, **kw,
        )
        registry.switch(base_name)
        return base_name
    cur_dir = registry.path(cur)
    append_index(spark, delta_pages, cur_dir, input_snapshot=input_snapshot)
    if os.path.isdir(os.path.join(cur_dir, "vocabplane")):
        # the sorted terms-dictionary plane is derived data keyed to
        # (gens, n_docs) — an append stales it; rewrite so prefix scans
        # keep their row-group pruning through the ingest loop
        from uci_searchengine_spark.operators.prefix import write_vocab_plane

        write_vocab_plane(spark, cur_dir)
    if os.path.isdir(os.path.join(cur_dir, "titleplane")):
        # same staleness contract as the vocab plane: the title postings
        # plane is keyed to (gens, n_docs) and an append stales it
        from uci_searchengine_spark.operators.multifield import (
            write_title_plane,
        )

        write_title_plane(spark, cur_dir)
    if should_merge(cur_dir, max_gens, max_tombstone_frac):
        gens = int(getattr(IndexMeta.load(cur_dir), "gens", 1))
        merged = f"{cur.split('-m')[0]}-m{gens}"
        n = 0
        while merged in registry.available():  # unique version name
            n += 1
            merged = f"{cur.split('-m')[0]}-m{gens}.{n}"
        merge_generations(
            spark, cur_dir, os.path.join(registry.root, merged),
            input_snapshot=input_snapshot,
        )
        registry.switch(merged)
        return merged
    return cur
