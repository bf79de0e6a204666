"""Sharded top-N terms aggregation with ES-exact error bounds.

The Elasticsearch ``terms`` agg is NOT exact on a distributed index:
each shard returns only its local top-``shard_size`` terms, the
coordinator sums what it received, and a term one shard didn't return
may be undercounted. ES quantifies this with
``doc_count_error_upper_bound``: for each merged term, the sum over
non-reporting shards of that shard's SMALLEST returned count (the
worst case the shard could have hidden); a shard that returned fewer
than ``shard_size`` terms returned its whole vocabulary, so it can
hide nothing and contributes 0.

This module reproduces those semantics exactly and deterministically:
the "shards" are md5-hash buckets of the doc id, so the whole
computation — per-shard counts, per-shard top-N cut, merged sums,
error bounds — is value-determined and cross-engine hashable. That is
also why it earns a gate: the error bound itself (usually an opaque
runtime artifact of wherever documents happened to land) becomes a
testable function of the data.

Scale shape: one (shard, term) count aggregate (map-combined), one
per-shard rank window (partition = one shard's vocabulary — the same
per-shard work a real ES data node does with a heap), a broadcast-
joined per-shard floor, and a term-keyed merge. Nothing touches the
corpus twice.

Reference: UCI-SearchEngine serves term stats from one SQLite file —
exact by construction, impossible to scale; this is what the same
query honestly costs and guarantees on a sharded corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_shard(key: Column, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards): first 8 md5 hex chars
    of the stringified key, mod n_shards — portable (DuckDB:
    CAST(('0x' || substr(md5(k),1,8)) AS UBIGINT) % n)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % F.lit(n_shards)
    )


def hash_shard_sql(key_expr: str, n_shards: int) -> str:
    """DuckDB mirror of :func:`hash_shard`."""
    k = f"CAST({key_expr} AS VARCHAR)"
    return (
        f"(CAST(('0x' || substr(md5({k}),1,8)) AS UBIGINT)"
        f" % {n_shards})::BIGINT"
    )


def sharded_terms(
    pairs: DataFrame,
    doc_col: str,
    term_col: str,
    n_shards: int = 4,
    shard_size: int = 5,
    k: int = 10,
) -> DataFrame:
    """ES terms-agg semantics over ``pairs`` (one row per (doc, term)
    — pre-deduped if doc-frequency counting is wanted): returns the
    merged top-``k`` (term, doc_count, error_ub) by received-count
    desc, term asc. ``doc_count`` is the coordinator's sum of received
    per-shard counts; ``error_ub`` the ES worst-case undercount."""
    if n_shards <= 0 or shard_size <= 0:
        raise ValueError("n_shards and shard_size must be positive")
    cnt = (
        pairs.select(
            hash_shard(F.col(doc_col), n_shards).alias("shard"),
            F.col(term_col).alias("term"),
        )
        .groupBy("shard", "term")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("term"))
    ranked = cnt.withColumn("rk", F.row_number().over(w))
    returned = ranked.filter(F.col("rk") <= shard_size)
    # per-shard floor: the smallest RETURNED count, and whether the
    # shard was cut (returned exactly shard_size → could hide terms)
    floors = returned.groupBy("shard").agg(
        F.min("cnt").alias("floor"),
        (F.count("*") == shard_size).alias("cut"),
    )
    # every (candidate term × shard) — candidates are the union of
    # returned terms; a (term, shard) hole contributes the shard's
    # floor iff that shard was cut
    terms = returned.select("term").distinct()
    grid = terms.crossJoin(F.broadcast(floors))
    merged = (
        grid.join(returned, ["shard", "term"], "left_outer")
        .groupBy("term")
        .agg(
            F.sum(F.coalesce(F.col("cnt"), F.lit(0))).alias("doc_count"),
            F.sum(
                F.when(
                    F.col("cnt").isNull() & F.col("cut"), F.col("floor")
                ).otherwise(F.lit(0))
            ).alias("error_ub"),
        )
    )
    return merged.orderBy(F.desc("doc_count"), F.asc("term")).limit(k)
