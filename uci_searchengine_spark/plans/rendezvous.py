"""Rendezvous (highest-random-weight) hashing — reshard-stable shard
assignment.

Thaler & Ravishankar 1996 (HRW), the assignment rule behind
consistent-hashing-class systems: a key's shard is the shard whose
salted hash ``h(key, shard)`` is LARGEST. The property mod-hashing
(``h(key) % n`` — what ``index_build``'s static term sharding and
every naive partitioner use) cannot give: growing ``n → n+1`` moves
only the keys whose new shard's weight beats all old ones — an
expected ``1/(n+1)`` of the corpus — while mod-hashing reshuffles
``n/(n+1)`` of it. At 10^12 documents, re-sharding an index from 64
to 80 shards is the difference between migrating ~1/80 of the
postings and migrating ~all of them.

Everything is value-determined (md5 of ``key|shard``), so assignments
are reproducible across engines, runs, and cluster layouts — the same
determinism contract as the index's term sharding, now with minimal-
disruption growth. The weight evaluation for ``n`` shards is an
in-row ``array_max`` over ``n`` literal-salted hashes — a scan
projection, no shuffle, no Python; n is a config constant (dozens to
thousands), never data-sized.

Reference: UCI-SearchEngine stores everything in one SQLite file —
resharding is out of its vocabulary; this plans-layer extension is
what the engine's own ``num_shards`` growth story costs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _weight(key: Column, shard: int) -> Column:
    """64-bit-ish weight: first 15 md5 hex chars of ``key|shard`` —
    60 bits, exact in a signed long in both engines."""
    return F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(f"|{shard}"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def hrw_shard(key: Column, n_shards: int) -> Column:
    """The shard in [0, n_shards) with the highest rendezvous weight
    for ``key`` — one in-row max over n literal-salted hashes."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    pairs = F.array(
        *[
            F.struct(
                _weight(key, s).alias("w"), F.lit(s).alias("s")
            )
            for s in range(n_shards)
        ]
    )
    return F.array_max(pairs).getField("s")


def hrw_shard_sql(key_expr: str, n_shards: int) -> str:
    """DuckDB mirror: ``list_max`` over the same salted weight structs.
    Struct comparison is lexicographic (w first) in both engines."""
    k = f"CAST({key_expr} AS VARCHAR)"

    def w(s: int) -> str:
        return (
            f"CAST(('0x' || substr(md5({k} || '|{s}'), 1, 15)) AS UBIGINT)"
            f"::BIGINT"
        )

    structs = ", ".join(
        f"{{'w': {w(s)}, 's': {s}}}" for s in range(n_shards)
    )
    return f"(list_max([{structs}])).s"
