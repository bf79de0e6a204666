"""Deterministic, exact DataFrame partitioning.

Spark's ``repartition(P, col)`` places rows by ``pmod(murmur3(col), P)`` —
you cannot pick the target partition directly, and hashing P distinct keys
into P partitions leaves ~1/e of them empty (parallelism loss), while
``repartitionByRange`` seeds its sampler with the RDD id, so boundaries can
shift between identical reruns — fatal for per-partition resume manifests.

The probe-int trick restores exact placement inside the pure DataFrame
API: precompute, for every target partition p, an integer ``probe[p]``
with ``pmod(murmur3(probe[p]), P) == p`` (driver-side brute force against
a bit-exact Python Murmur3), then ``repartition(P, element_at(probes,
pid+1))``. Row → exactly the partition you computed, deterministically,
with zero empty partitions.

tests/test_partitioning.py verifies murmur3_int32 against ``F.hash`` and
the placement property end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M32 = 0xFFFFFFFF


def murmur3_int32(x: int, seed: int = 42) -> int:
    """Spark-compatible Murmur3 (x86_32) of a 4-byte int, as signed int32
    (bit-exact with ``F.hash(int_col)``)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    k = (x & _M32) * c1 & _M32
    k = ((k << 15) | (k >> 17)) & _M32
    k = k * c2 & _M32
    h = (seed ^ k) & _M32
    h = ((h << 13) | (h >> 19)) & _M32
    h = (h * 5 + 0xE6546B64) & _M32
    h ^= 4  # length in bytes
    h ^= h >> 16
    h = h * 0x85EBCA6B & _M32
    h ^= h >> 13
    h = h * 0xC2B2AE35 & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def probe_ints(num_partitions: int) -> list[int]:
    """probe_ints(P)[p] is an int whose Spark hash lands in partition p."""
    out: dict[int, int] = {}
    x = 0
    while len(out) < num_partitions:
        p = murmur3_int32(x) % num_partitions
        if p not in out:
            out[p] = x
        x += 1
    return [out[p] for p in range(num_partitions)]


def exact_repartition(df: DataFrame, num_partitions: int, pid_col: str) -> DataFrame:
    """Repartition so each row lands exactly in partition ``df[pid_col]``
    (values must be in [0, num_partitions))."""
    probes = probe_ints(num_partitions)
    probe_expr = F.element_at(
        F.array(*[F.lit(p) for p in probes]), F.col(pid_col).cast("int") + 1
    )
    return df.repartition(num_partitions, probe_expr)


def url_range_pids(urls_sorted_sample: list[str], num_partitions: int, col: Column) -> Column:
    """Partition id by sampled range boundaries over a string column.

    Boundaries are byte-order sorted (matching Spark's UTF8String binary
    comparison); pid = count of boundaries ≤ value — an O(P) array filter
    per row, fine for P up to a few hundred (use a range join against a
    boundary table beyond that).
    """
    n = len(urls_sorted_sample)
    if n == 0 or num_partitions <= 1:
        return F.lit(0)
    bounds = [
        urls_sorted_sample[(i * n) // num_partitions]
        for i in range(1, num_partitions)
    ]
    return pids_from_bounds(bounds, col)


def pids_from_bounds(bounds: list[str], col: Column) -> Column:
    """pid = count of precomputed byte-order boundaries ≤ value."""
    if not bounds:
        return F.lit(0)
    arr = F.array(*[F.lit(b) for b in bounds])
    return F.size(F.filter(arr, lambda b: b <= col))


def weighted_range_bounds(
    samples: list[tuple[str, int]], num_partitions: int
) -> list[str]:
    """Range boundaries from a WEIGHTED sample of (value, weight) pairs.

    Weight = the stride the sample was taken at ≈ the number of input
    rows it represents, so partitions whose source sampled more coarsely
    (geometric decimation under a per-partition cap) still contribute
    their true share of the key mass. Returns ``num_partitions - 1``
    byte-order-sorted bounds; boundary j sits at cumulative weight
    j/num_partitions of the total.
    """
    if num_partitions <= 1 or not samples:
        return []
    ordered = sorted(samples, key=lambda t: t[0].encode())
    total = sum(w for _, w in ordered)
    bounds: list[str] = []
    acc = 0
    j = 1
    for u, w in ordered:
        acc += w
        while j < num_partitions and acc * num_partitions >= j * total:
            bounds.append(u)
            j += 1
    while len(bounds) < num_partitions - 1:
        bounds.append(ordered[-1][0])
    return bounds
