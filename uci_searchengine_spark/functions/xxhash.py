"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` on string columns.

Spark's XxHash64 expression hashes a string's UTF-8 bytes with XXH64
(seed 42 by default). Having the same hash driver-side lets the query path
compute term→shard assignments without a Spark job (one fewer round trip
per query). tests/test_xxhash.py asserts equality against the JVM for
ASCII, Unicode, empty, and long strings.
"""

from __future__ import annotations

MASK = 0xFFFFFFFFFFFFFFFF
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * P2) & MASK
    return (_rotl(acc, 31) * P1) & MASK


def _merge_round(h: int, acc: int) -> int:
    h ^= _round(0, acc)
    return (h * P1 + P4) & MASK


def xxhash64(data: bytes | str, seed: int = 42) -> int:
    """XXH64 digest as Spark's signed 64-bit long."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        a1 = (seed + P1 + P2) & MASK
        a2 = (seed + P2) & MASK
        a3 = seed & MASK
        a4 = (seed - P1) & MASK
        while i + 32 <= n:
            a1 = _round(a1, int.from_bytes(data[i : i + 8], "little"))
            a2 = _round(a2, int.from_bytes(data[i + 8 : i + 16], "little"))
            a3 = _round(a3, int.from_bytes(data[i + 16 : i + 24], "little"))
            a4 = _round(a4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & MASK
        for a in (a1, a2, a3, a4):
            h = _merge_round(h, a)
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    # Spark longs are signed
    return h - (1 << 64) if h >= (1 << 63) else h


def term_shard(term: str, num_shards: int) -> int:
    """pmod(xxhash64(term), num_shards) — build-side shard assignment."""
    return xxhash64(term) % num_shards
