"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct. The Spark-side plumbing — schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning — is real and tested; the
actual decode (PIL/ffmpeg/soundfile) is NOT available in this container,
so the decode step is isolated behind ``_decode_image_real`` which raises
``NotImplementedError``, and a clearly-marked deterministic fake
(md5-derived dimensions) stands in so the distributed plumbing can be
exercised end-to-end and verified against an external oracle.

At 100 TB: binary payloads dominate row size → keep them out of shuffles
(derive metadata early, project payloads away before joins/aggs), size
``maxRecordsPerBatch`` down so Arrow batches of big blobs fit in memory,
and partition by content hash for even file sizes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("md5", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("format", T.StringType(), False),
    ]
)


def _decode_image_real(payload: bytes) -> tuple[int, int, str]:
    """Real decoder boundary. Requires an image library (PIL) that is not
    present in this environment — STUB."""
    raise NotImplementedError(
        "image decode requires PIL/libvips; not available in this container"
    )


def _decode_image_fake(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake decode: dimensions derived from the payload md5.

    width  = 16 + (first md5 byte)
    height = 16 + (second md5 byte)
    format = 'png' if third byte even else 'jpeg'
    Portable: any engine with md5 can reproduce it (the DuckDB oracle does).
    """
    h = hashlib.md5(payload).digest()
    return 16 + h[0], 16 + h[1], "png" if h[2] % 2 == 0 else "jpeg"


def decode_image_meta(
    df: DataFrame, id_col: str, payload_col: str, use_real: bool = False
) -> DataFrame:
    """mapInPandas over (id, payload) → IMAGE_META_SCHEMA rows.

    Arrow-batched; per-image work happens inside the batch (decode is
    irreducibly per-payload, like HTML parse). Payload column is projected
    away in the output so downstream stages never shuffle blobs.
    """
    decode = _decode_image_real if use_real else _decode_image_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            metas = [decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "md5": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
                    "width": pd.Series([m[0] for m in metas], dtype="int32"),
                    "height": pd.Series([m[1] for m in metas], dtype="int32"),
                    "format": [m[2] for m in metas],
                }
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=IMAGE_META_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_chunks", T.IntegerType(), False),
        T.StructField("loudness_fp", T.StringType(), False),
    ]
)


def _decode_audio_real(payload: bytes) -> tuple[int, list[float]]:
    """Real decoder boundary (soundfile/ffmpeg) — not in this container."""
    raise NotImplementedError(
        "audio decode requires soundfile/ffmpeg; not available in this container"
    )


def decode_audio_meta(
    df: DataFrame, id_col: str, payload_col: str, chunk_bytes: int = 128, use_real: bool = False
) -> DataFrame:
    """Audio-modality plumbing: payload → (sample_rate, chunk count,
    loudness fingerprint). The fake decode derives a deterministic
    sample_rate from the payload md5 and a per-chunk 'loudness'
    fingerprint = md5 over the chunk md5s — both reproducible by the
    DuckDB oracle. The real decoder is the stubbed boundary above; the
    Spark-side schema / Arrow batch shape / blob-projection discipline is
    what this operator pins."""
    if use_real:
        _decode_audio_real(b"")  # fail fast: decoder absent by design

    rates = [8000, 16000, 22050, 44100, 48000]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, sr, nc, fp = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                h = hashlib.md5(raw).digest()
                chunks = max(1, (len(raw) + chunk_bytes - 1) // chunk_bytes)
                # md5 over the concatenated per-chunk HEX digests (hex, not
                # binary: portable to engines whose md5 is VARCHAR-only)
                chunk_digest = hashlib.md5(
                    "".join(
                        hashlib.md5(raw[c * chunk_bytes : (c + 1) * chunk_bytes]).hexdigest()
                        for c in range(chunks)
                    ).encode()
                ).hexdigest()
                ids.append(i)
                nb.append(len(raw))
                sr.append(rates[h[0] % len(rates)])
                nc.append(chunks)
                fp.append(chunk_digest)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_bytes": pd.Series(nb, dtype="int32"),
                    "sample_rate": pd.Series(sr, dtype="int32"),
                    "n_chunks": pd.Series(nc, dtype="int32"),
                    "loudness_fp": fp,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=AUDIO_META_SCHEMA)


def sample_frames(
    df: DataFrame, id_col: str, payload_col: str, every_n: int = 4
) -> DataFrame:
    """Frame-sampling plumbing (video analog): one payload → many frame
    rows (a flatMap-shaped mapInPandas). The fake "frame" is a byte-slice;
    a real build swaps the slicer for an ffmpeg keyframe extractor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                n_frames = max(1, len(raw) // 64)
                for fi in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    hashes.append(
                        hashlib.md5(raw[fi * 64 : (fi + 1) * 64]).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": hashes,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
