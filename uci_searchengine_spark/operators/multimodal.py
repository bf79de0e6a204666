"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct. The Spark-side plumbing — schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partitioning — is real and tested.
Decode comes in three tiers:

* REAL, stdlib-only: container-header metadata — PNG/GIF/JPEG
  (width, height, format) parsed from header bytes, and full PCM WAV
  decode via the ``wave`` module. Gate-verified against generators the
  parsers must invert exactly (``synth_image_bytes``/``synth_wav_bytes``).
* STUBBED (library genuinely absent in this container): pixel-level
  image decode (``_decode_pixels_real``) and compressed audio codecs
  (``_decode_compressed_audio_real``) raise NotImplementedError at a
  clearly-marked boundary.
* FAKE, deterministic: md5-derived metadata reproducible by the DuckDB
  oracle — exercises the distributed plumbing on arbitrary bytes.

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
    """Real decode: pure-stdlib container-header parsing for PNG / GIF /
    JPEG — the (width, height, format) metadata every curation pipeline
    needs, with zero image-library dependency. Full pixel decode (resize,
    feature extraction) still requires PIL/libvips and stays stubbed
    (``_decode_pixels_real``); header metadata is real.

    Raises ValueError on unrecognized bytes (callers choose fallback)."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is always the first chunk: width/height big-endian uint32
        # at byte 16/20
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("truncated PNG")
        w, h = struct.unpack(">II", payload[16:24])
        return w, h, "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("truncated GIF")
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h, "gif"
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        # walk the marker chain to the first SOFn frame header
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    break
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return w, h, "jpeg"
            i += 2 + seglen
        raise ValueError("JPEG without SOF header")
    raise ValueError("unrecognized image container")


def _decode_pixels_real(payload: bytes):
    """Pixel-level decode boundary (resize / embeddings / OCR). Requires
    PIL/libvips — not in this container; STUB."""
    raise NotImplementedError(
        "pixel decode requires PIL/libvips; not available in this container"
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
    df: DataFrame, id_col: str, payload_col: str, use_real: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """mapInPandas over (id, payload) → IMAGE_META_SCHEMA rows.

    Arrow-batched; per-image work happens inside the batch (decode is
    irreducibly per-payload, like HTML parse). Payload column is projected
    away in the output so downstream stages never shuffle blobs.

    ``use_real=True``: stdlib header parsing (PNG/GIF/JPEG). Unrecognized
    payloads raise by default; ``on_error="fake"`` falls back to the
    deterministic fake per payload (mixed-corpus mode)."""
    if use_real and on_error == "fake":
        def decode(p):
            try:
                return _decode_image_real(p)
            except ValueError:
                return _decode_image_fake(p)
    else:
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


RESIZE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("scale", T.DoubleType(), False),
        T.StructField("format", T.StringType(), False),
    ]
)


def _fit_dims(w: int, h: int, tw: int, th: int, mode: str):
    """Aspect-geometry for a resize: 'fit' letterboxes inside (tw, th),
    'fill' covers it (then crops), 'stretch' ignores aspect. Returns
    (out_w, out_h, scale); scale is the applied linear factor ('stretch'
    reports the width factor). Pure arithmetic — identical in any
    engine, which is what the gate's SQL oracle recomputes."""
    if mode == "stretch":
        return tw, th, tw / w
    s = min(tw / w, th / h) if mode == "fit" else max(tw / w, th / h)
    return max(1, int(w * s)), max(1, int(h * s)), s


def resize_image_meta(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    target_w: int,
    target_h: int,
    mode: str = "fit",
    use_real: bool = False,
    resample: bool = False,
) -> DataFrame:
    """The resize stage of an image-curation pipeline, split at the
    honest boundary: header decode + output-geometry planning are REAL
    (stdlib parsers + pure arithmetic — everything a scheduler needs to
    budget a distributed resize: output dims, scale factor, per-format
    routing), while the pixel resample itself (``resample=True``)
    requires PIL/libvips and raises via ``_decode_pixels_real`` exactly
    like the other pixel stages. mapInPandas with the blob projected
    away on output, so downstream stages never shuffle payloads."""
    if mode not in ("fit", "fill", "stretch"):
        raise ValueError(f"unknown resize mode {mode!r}")
    decode = _decode_image_real if use_real else _decode_image_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, fmt = decode(bytes(p))
                if resample:
                    _decode_pixels_real(bytes(p))  # honest stub: raises
                ow, oh, s = _fit_dims(w, h, target_w, target_h, mode)
                rows.append((int(i), w, h, ow, oh, round(s, 6), fmt))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "out_w", "out_h",
                    "scale", "format",
                ],
            ).astype(
                {
                    "doc_id": "int64", "width": "int32", "height": "int32",
                    "out_w": "int32", "out_h": "int32", "scale": "float64",
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=RESIZE_META_SCHEMA
    )


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType(), False), False),
    ]
)

_FMT_CODE = {"png": 0, "gif": 1, "jpeg": 2}


def image_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    dim: int = 8,
    use_real: bool = False,
) -> DataFrame:
    """Feature-extraction plumbing (the CLIP/ResNet-embedding stage of a
    multimodal curation pipeline): mapInPandas over (id, payload) →
    (id, array<double> of length ``dim``) — the exact schema, batch
    shape, and blob-free output contract the real extractor needs.
    ``use_real=True`` is the honest pixel-model stub
    (``_decode_pixels_real`` raises: no PIL/torch in this container);
    the default is a DETERMINISTIC FAKE derived from the REAL header
    metadata — features[i] = ((31*w + 7*h + 5*fmt_code + 13*i) % 997)
    / 997 — so the plumbing is testable end-to-end and the gate's SQL
    oracle can recompute it from the generator formula."""

    def fake_vec(p: bytes):
        w, h, fmt = _decode_image_real(p)
        base = 31 * w + 7 * h + 5 * _FMT_CODE[fmt]
        return [((base + 13 * i) % 997) / 997.0 for i in range(dim)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:
                for p in pdf[payload_col]:
                    _decode_pixels_real(bytes(p))  # raises
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "features": [fake_vec(bytes(p)) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


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


def _decode_audio_real(payload: bytes) -> tuple[int, bytes]:
    """Real decode for WAV containers via the stdlib ``wave`` module:
    (sample_rate, raw PCM frame bytes). Compressed codecs (mp3/ogg/flac)
    would require soundfile/ffmpeg — that boundary stays stubbed
    (``_decode_compressed_audio_real``); PCM WAV is fully real."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        return w.getframerate(), w.readframes(w.getnframes())


def _decode_compressed_audio_real(payload: bytes):
    """Compressed-codec decode boundary (mp3/ogg/flac) — requires
    soundfile/ffmpeg, not in this container; STUB."""
    raise NotImplementedError(
        "compressed audio decode requires soundfile/ffmpeg; "
        "not available in this container"
    )


def decode_audio_meta(
    df: DataFrame, id_col: str, payload_col: str, chunk_bytes: int = 128, use_real: bool = False
) -> DataFrame:
    """Audio-modality plumbing: payload → (sample_rate, chunk count,
    loudness fingerprint). ``use_real=True`` parses WAV containers with
    the stdlib ``wave`` module — sample_rate is the file's actual rate
    and chunking/fingerprinting run over the DECODED PCM frames; the
    fake derives a deterministic sample_rate from the payload md5 and
    chunks the raw bytes (both reproducible by the DuckDB oracle).
    Compressed codecs stay stubbed (``_decode_compressed_audio_real``).
    The Spark-side schema / Arrow batch shape / blob-projection
    discipline is identical on both paths."""
    rates = [8000, 16000, 22050, 44100, 48000]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, sr, nc, fp = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                if use_real:
                    rate, body = _decode_audio_real(raw)
                else:
                    h = hashlib.md5(raw).digest()
                    rate, body = rates[h[0] % len(rates)], raw
                chunks = max(1, (len(body) + chunk_bytes - 1) // chunk_bytes)
                # md5 over the concatenated per-chunk HEX digests (hex, not
                # binary: portable to engines whose md5 is VARCHAR-only)
                chunk_digest = hashlib.md5(
                    "".join(
                        hashlib.md5(body[c * chunk_bytes : (c + 1) * chunk_bytes]).hexdigest()
                        for c in range(chunks)
                    ).encode()
                ).hexdigest()
                ids.append(i)
                nb.append(len(raw))
                sr.append(rate)
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


# ---------------------------------------------------------------- fixtures
# Deterministic VALID container bytes for gates/tests: the real decoders
# must invert these generators exactly (parser ⁻¹ ∘ generator = identity),
# which the DuckDB oracle checks by predicting the metadata straight from
# the id formula — end-to-end proof the stdlib parsers read real headers.

def synth_image_bytes(doc_id: int) -> bytes:
    """Valid PNG / GIF / JPEG bytes with dimensions derived from doc_id:
    width = 16 + id % 101, height = 16 + (7*id) % 89, format cycling
    png/gif/jpeg by id % 3. CRCs are correct (zlib.crc32)."""
    import struct
    import zlib

    w = 16 + doc_id % 101
    h = 16 + (7 * doc_id) % 89
    m = doc_id % 3
    if m == 0:  # PNG: signature + IHDR + IEND, real CRCs
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        def chunk(tag, data):
            return (
                struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )
        return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    if m == 1:  # GIF89a: little-endian logical screen size
        return (
            b"GIF89a" + struct.pack("<HH", w, h) + b"\xf0\x00\x00"
            + b"\x00\x00\x00\xff\xff\xff" + b"\x3b"
        )
    # JPEG: SOI + SOF0 (1 component) + EOI
    sof = struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"
    )


def synth_wav_bytes(doc_id: int) -> bytes:
    """Valid mono 16-bit PCM WAV: sample rate cycling the standard rates
    by id % 5, 50 + id % 100 frames of deterministic samples."""
    import io
    import struct
    import wave

    rates = [8000, 16000, 22050, 44100, 48000]
    n_frames = 50 + doc_id % 100
    pcm = b"".join(
        struct.pack("<h", ((doc_id * 31 + i * 7) % 4096) - 2048)
        for i in range(n_frames)
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rates[doc_id % 5])
        wv.writeframes(pcm)
    return buf.getvalue()
