"""Compressed posting-list codec: docID-delta + LEB128 varint, block-max.

Physical format (FIXTURES.md §2, north_star):

* postings ``binary``: interleaved LEB128 varints ``gap_0 tf_0 gap_1 tf_1 …``
  where ``gap_0 = doc_id_0 + 1`` and ``gap_i = doc_id_i - doc_id_{i-1}``
  (always ≥ 1 — doc ids are unique and sorted ascending).
* blocks of ``BLOCK_SIZE`` (=128) postings. Per block we store:
  - ``block_offsets``: byte offset of the block's first varint (skip pointer),
  - ``block_last_doc``: last doc_id in the block (WAND skipping),
  - ``block_max``: max over the block of the idf-independent BM25 factor
    ``tf / (tf + k1*(1 - b + b*doc_len/avgdl))`` so the query-time upper
    bound for the block is ``idf(t) * (k1+1) * block_max`` (block-max WAND).

Everything is vectorized numpy — no per-element Python on encode or decode.

Replaces the reference's row-per-posting SQLite table
(/root/reference/backend/app/database/models.py:182-197); ordering within a
term there was implicit insert order (models.py:187) — here it is an
explicit sort by doc_id, the prerequisite for delta coding and WAND.
"""

from __future__ import annotations

import numpy as np

from uci_searchengine_spark import BLOCK_SIZE, BM25_B, BM25_K1


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, fully vectorized."""
    v = values.astype(np.uint64, copy=False)
    if v.size == 0:
        return b""
    # byte length per value: ceil(bitlen/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum((nbits + 6) // 7, 1)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    # position of each output byte within its value
    byte_idx = np.arange(total, dtype=np.int64)
    owner = np.searchsorted(ends, byte_idx, side="right")
    pos = byte_idx - starts[owner]
    chunk = (v[owner] >> (np.uint64(7) * pos.astype(np.uint64))) & np.uint64(0x7F)
    cont = byte_idx != (ends[owner] - 1)  # continuation bit on all but last byte
    out[:] = chunk.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def decode_varints(buf: bytes, offset: int = 0, count: int | None = None) -> np.ndarray:
    """Decode LEB128 varints from ``buf[offset:]``; vectorized.

    If ``count`` is given, decodes exactly that many values (ignoring
    trailing bytes); else decodes to the end of the buffer.
    """
    b = np.frombuffer(buf, dtype=np.uint8, offset=offset)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    if count is not None:
        # truncate to the first `count` terminators
        lasts = np.flatnonzero(is_last)
        b = b[: lasts[count - 1] + 1]
        is_last = is_last[: lasts[count - 1] + 1]
    # group id per byte = number of terminators before it
    gid = np.concatenate(([0], np.cumsum(is_last)[:-1]))
    starts = np.concatenate(([0], np.flatnonzero(is_last)[:-1] + 1))
    pos = np.arange(b.size, dtype=np.int64) - starts[gid]
    contrib = (b.astype(np.uint64) & np.uint64(0x7F)) << (
        np.uint64(7) * pos.astype(np.uint64)
    )
    n = int(is_last.sum())
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, gid, contrib)  # ≤10 bytes/value → no overflow within uint64
    return out


def bm25_tf_factor(tf: np.ndarray, doc_len: np.ndarray, avgdl: float) -> np.ndarray:
    """idf-independent BM25 factor tf/(tf + k1*(1-b+b*dl/avgdl)), float64."""
    tf = tf.astype(np.float64)
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * doc_len.astype(np.float64) / avgdl)
    return tf / denom


def pack_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doc_lens: np.ndarray,
    avgdl: float,
) -> tuple[bytes, np.ndarray, np.ndarray, np.ndarray]:
    """Pack one term's postings (already sorted by doc_id asc, unique).

    Returns (postings_bytes, block_max float32[], block_offsets int32[],
    block_last_doc int64[]).
    """
    n = doc_ids.size
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = np.uint64(doc_ids[0] + 1)
    if n > 1:
        gaps[1:] = np.diff(doc_ids).astype(np.uint64)
    interleaved = np.empty(2 * n, dtype=np.uint64)
    interleaved[0::2] = gaps
    interleaved[1::2] = tfs.astype(np.uint64)

    # per-block byte offsets: encode per block so offsets are exact
    factors = bm25_tf_factor(tfs, doc_lens, avgdl)
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    offsets = np.zeros(n_blocks, dtype=np.int32)
    block_max = np.zeros(n_blocks, dtype=np.float32)
    block_last = np.zeros(n_blocks, dtype=np.int64)
    chunks = []
    off = 0
    for bi in range(n_blocks):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, n)
        enc = encode_varints(interleaved[2 * lo : 2 * hi])
        offsets[bi] = off
        off += len(enc)
        chunks.append(enc)
        block_max[bi] = factors[lo:hi].max()
        block_last[bi] = doc_ids[hi - 1]
    return b"".join(chunks), block_max, offsets, block_last


def unpack_postings(buf: bytes, offset: int = 0, count: int | None = None):
    """Inverse of pack: returns (doc_ids int64[], tfs int32[])."""
    vals = decode_varints(buf, offset=offset, count=None if count is None else 2 * count)
    gaps = vals[0::2].astype(np.int64)
    tfs = vals[1::2].astype(np.int32)
    doc_ids = np.cumsum(gaps) - 1
    return doc_ids, tfs
