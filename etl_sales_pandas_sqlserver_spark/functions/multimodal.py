"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Codec-free formats are decoded for REAL: BMP (24-bit BI_RGB header +
pixel extraction, :func:`decode_bmp`) and WAV (chunk-walking RIFF
parser + integer-ratio PCM resampling, :func:`decode_wav` /
:func:`resample_audio`) are pure byte/array math and need no external
library. Only formats that genuinely require a codec stay behind the
optional-dependency gate, exactly as a production pipeline would gate
a missing import: :func:`decode_image` on non-BMP payloads (PNG/JPEG
need PIL/opencv), :func:`resample_audio` on compressed/non-integer-
ratio audio (needs a DSP library), and :func:`sample_frames` (any
video container needs ffmpeg). Everything around the gates -- the
binary schema, the Arrow batch iteration, the output contract, the
partition-preserving plan shape -- is real and tested.

Scale notes: ``mapInPandas`` is a narrow transformation (no shuffle);
payload bytes flow executor-side through Arrow in
``spark.sql.execution.arrow.maxRecordsPerBatch``-sized batches, so
memory is bounded per batch regardless of table size. The final
per-source rollup is the only shuffle, on a small keyspace.

The driver-checkable query derives its binary payloads from
``documents.text`` (utf-8 encode) so a DuckDB oracle can recompute the
features from the text side (the testdata text is pure ASCII:
char == byte, verified in tests).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.testdata import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

#: modality tag derived deterministically from doc_id (no media files in
#: the testdata; the tag exercises the metadata column contract)
_MODALITIES = ["image", "audio", "video"]


# ---------------------------------------------------------------------------
# Real codec-free decoders (BMP, WAV) + the optional-dependency gates
# for everything that genuinely needs a codec.
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Serialize an ``(h, w, 3)`` uint8 RGB array as a 24-bit
    uncompressed (BI_RGB) bottom-up BMP: BITMAPFILEHEADER (14 bytes) +
    BITMAPINFOHEADER (40 bytes) + pixel rows in BGR order, each row
    padded to a 4-byte boundary per the format spec."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp needs an (h, w, 3) uint8 array")
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up row order, RGB -> BGR channel order
    rows[:, :row_bytes] = pixels[::-1, :, ::-1].reshape(h, row_bytes)
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a 24-bit uncompressed BMP into ``(width, height, pixels)``
    with ``pixels`` an ``(h, w, 3)`` uint8 RGB array in top-down row
    order regardless of the stored orientation (negative biHeight
    means a top-down source). Pure byte math: magic + offsets from the
    file header, dimensions from the DIB header, then one numpy
    reshape that strips the per-row padding."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMPs are codec-free (got bpp={bpp}, "
            f"compression={compression})"
        )
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate BMP dimensions {w}x{h_raw}")
    stride = (w * 3 + 3) & ~3
    body = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:
        rows = rows[::-1]  # bottom-up storage -> top-down
    return w, h, rows[:, :, ::-1]  # BGR -> RGB


def decode_image(payload: bytes, *, fake: bool = False) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    BMP payloads are decoded for real (:func:`decode_bmp`); any other
    format needs an image codec (PIL/opencv) this environment does not
    ship. ``fake=True`` derives deterministic dimensions from the raw
    bytes instead (used by tests and the byte-stats plumbing query --
    clearly marked, never silently wrong).
    """
    if fake:
        width = int(payload[0]) % 64 + 1 if payload else 1
        height = len(payload) % 64 + 1
        return width, height
    if payload[:2] == b"BM":
        w, h, _pixels = decode_bmp(payload)
        return w, h
    raise NotImplementedError(
        "non-BMP image decoding requires an image codec (PIL/opencv); "
        "re-run with fake=True for the deterministic stub"
    )


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Serialize a mono PCM sample array (uint8 or int16) as a
    RIFF/WAVE payload: fmt chunk (format 1 = uncompressed PCM) +
    data chunk, little-endian throughout per the spec."""
    if samples.dtype == np.uint8:
        bits = 8
    elif samples.dtype == np.int16:
        bits = 16
    else:
        raise ValueError("encode_wav needs uint8 or int16 samples")
    data = samples.astype(samples.dtype.newbyteorder("<")).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * bits // 8, bits // 8, bits)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) % 2 else b"")  # chunks are word-aligned
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Chunk-walking RIFF parser: returns ``(sample_rate, samples)``
    for mono uncompressed PCM (format 1, 8/16-bit). Compressed or
    multi-channel encodings stay behind the optional-dependency gate
    -- they need a real audio library."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_code = channels = rate = bits = None
    data: bytes | None = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate, _brate, _balign, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV payload missing fmt or data chunk")
    if fmt_code != 1 or channels != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only mono 8/16-bit PCM is codec-free (got format={fmt_code}, "
            f"channels={channels}, bits={bits}); other encodings need an "
            "audio library (soundfile/librosa)"
        )
    dtype = np.uint8 if bits == 8 else np.dtype("<i2")
    return rate, np.frombuffer(data, dtype=dtype)


def resample_audio(payload: bytes, rate: int = 16000) -> np.ndarray:
    """Resample a PCM WAV payload to ``rate`` Hz by nearest-neighbor
    integer-ratio decimation/repetition -- exact integer math, so the
    DuckDB oracle can replay it bit-for-bit. Non-integer ratios need a
    proper polyphase filter (scipy/librosa) and stay gated."""
    src_rate, samples = decode_wav(payload)
    if rate == src_rate:
        return samples
    if rate < src_rate and src_rate % rate == 0:
        return samples[:: src_rate // rate]
    if rate > src_rate and rate % src_rate == 0:
        return np.repeat(samples, rate // src_rate)
    raise NotImplementedError(
        f"non-integer-ratio resampling ({src_rate} -> {rate}) requires "
        "a DSP library (scipy/librosa)"
    )


def sample_frames(payload: bytes, every_n: int = 30) -> list[bytes]:
    raise NotImplementedError("frame sampling requires a video codec (ffmpeg)")


# ---------------------------------------------------------------------------
# Arrow-batched feature extraction over the binary column.
# ---------------------------------------------------------------------------

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)


def _segment_view(payloads: "pd.Series") -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate a batch's payloads into ONE uint8 buffer and return
    (buf, starts, lens). All per-row byte stats then become O(total
    bytes) numpy segment ops on the flat buffer -- no Python-level
    per-row work inside the Arrow batch."""
    lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=len(payloads))
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return buf, starts, lens


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: fully vectorized byte stats per Arrow batch.
    Payloads are flattened once; per-doc sums come from a prefix-sum
    difference (exact int64), first bytes from a gather at segment
    starts. Reproduces decode_image(fake=True) math vectorized --
    parity is pinned in tests/test_functions.py."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        buf, starts, lens = _segment_view(pdf["payload"])
        csum = np.zeros(buf.size + 1, dtype=np.int64)
        np.cumsum(buf, dtype=np.int64, out=csum[1:])
        byte_sum = csum[starts + lens] - csum[starts]
        nonempty = lens > 0
        first = np.full(len(lens), -1, dtype=np.int64)
        first[nonempty] = buf[starts[nonempty]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "modality": pdf["modality"],
                "n_bytes": lens,
                "first_byte": first,
                "byte_sum": byte_sum,
                "fake_width": np.where(nonempty, first % 64 + 1, 1),
                "fake_height": lens % 64 + 1,
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column + typed metadata the way a real
    multimodal table would carry them (payload, modality, n_bytes)."""
    return docs.select(
        "doc_id",
        "source",
        F.encode("text", "UTF-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(m) for m in _MODALITIES]),
            (F.col("doc_id") % len(_MODALITIES) + 1).cast("int"),
        ).alias("modality"),
    )


def extract_binary_features(docs: DataFrame) -> DataFrame:
    return with_binary_payload(docs).mapInPandas(
        _extract_features, schema=FEATURE_SCHEMA
    )


def _bytes_cte(where: str) -> str:
    """SQL CTE pair exposing each document's UTF-8 payload as a list of
    BYTE values (``bs``, 1-indexed) plus its byte length (``nb``).

    The kernels all operate on ``encode(text, 'UTF-8')`` payload BYTES;
    until round 8 the oracles used ``ascii(substr(text, i, 1))``, which
    is CHARACTER semantics and coincides with bytes only on ASCII
    fixtures (round-8 advice). DuckDB has no blob indexing, so bytes
    are recovered from ``to_hex(encode(text))`` with hex-digit
    arithmetic -- exact for any input."""
    return f"""
  h AS (
    SELECT doc_id, source, to_hex(encode(text)) AS hx,
           octet_length(encode(text)) AS nb
    FROM documents {where}
  ),
  b AS (
    SELECT doc_id, source, nb,
           list_transform(range(1, nb + 1),
             i -> 16 * (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1)
                + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)) AS bs
    FROM h
  )"""


# DuckDB recomputes the same features from the payload BYTES (see
# _bytes_cte); empty docs are kept with the kernel's sentinel values.
BINARY_FEATURES_SQL = f"""
  WITH {_bytes_cte("")},
  feats AS (
    SELECT doc_id, source,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           nb AS n_bytes,
           coalesce(bs[1], -1) AS first_byte,
           coalesce(list_sum(bs), 0) AS byte_sum,
           CASE WHEN nb > 0 THEN bs[1] % 64 + 1 ELSE 1 END AS fake_width,
           nb % 64 + 1 AS fake_height
    FROM b
  )
  SELECT modality, source,
         COUNT(*) AS n_docs,
         CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
         CAST(SUM(byte_sum) AS BIGINT) AS total_byte_sum,
         CAST(MIN(fake_width) AS BIGINT) AS min_width,
         CAST(MAX(fake_height) AS BIGINT) AS max_height
  FROM feats
  GROUP BY modality, source
  ORDER BY modality, source
"""


def q_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_binary_features(docs.select("doc_id", "source", "text"))
    return (
        feats.groupBy("modality", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("byte_sum").alias("total_byte_sum"),
            F.min("fake_width").alias("min_width"),
            F.max("fake_height").alias("max_height"),
        )
    )


# ---------------------------------------------------------------------------
# Frame sampling plumbing: chop the "video" payloads into fixed-size
# byte frames and keep every Nth -- the exact batch shape a real
# ffmpeg-backed sampler produces (list-of-frames per row), with the
# codec swapped for deterministic byte slicing. The kernel slices
# frames vectorized per Arrow batch; only the per-doc rollup leaves the
# map side. The oracle recomputes frame boundaries from the text
# (ASCII: byte i == ascii(char i)).
# ---------------------------------------------------------------------------

_FRAME_BYTES = 16
_FRAME_EVERY_N = 4

_FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_sampled", T.LongType()),
        T.StructField("sampled_first_sum", T.LongType()),
    ]
)


def sample_frames_fake(
    payload: bytes, frame_size: int = _FRAME_BYTES, every_n: int = _FRAME_EVERY_N
) -> list[bytes]:
    """Deterministic stand-in for :func:`sample_frames`: fixed-size
    byte windows, every Nth kept. Same output contract (list of frame
    payloads) a real decoder would produce."""
    n = len(payload) // frame_size
    return [
        payload[i * frame_size : (i + 1) * frame_size]
        for i in range(0, n, every_n)
    ]


def _frame_sample_kernel(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Vectorized frame sampling: sampled-frame first bytes are a
    single gather on the flat buffer (positions built with the
    repeat/arange ragged-index trick), summed per doc with bincount.
    Semantics identical to mapping sample_frames_fake per row (pinned
    in tests); every sampled frame is a full _FRAME_BYTES window, so
    its first byte always exists."""
    stride = _FRAME_EVERY_N * _FRAME_BYTES
    for pdf in batches:
        if len(pdf) == 0:
            continue
        buf, starts, lens = _segment_view(pdf["payload"])
        n_frames = lens // _FRAME_BYTES
        n_sampled = -(-n_frames // _FRAME_EVERY_N)  # ceil-div
        doc_idx = np.repeat(np.arange(len(lens)), n_sampled)
        seg_off = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(n_sampled[:-1], out=seg_off[1:])
        j = np.arange(int(n_sampled.sum()), dtype=np.int64) - seg_off[doc_idx]
        vals = buf[starts[doc_idx] + j * stride]
        first_sum = np.bincount(
            doc_idx, weights=vals, minlength=len(lens)
        ).astype(np.int64)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_frames": n_frames,
                "n_sampled": n_sampled,
                "sampled_first_sum": first_sum,
            }
        )


FRAME_SAMPLE_SQL = f"""
  WITH {_bytes_cte("WHERE CAST(doc_id % 3 AS INTEGER) = 2")}
  SELECT doc_id,
         CAST(nb // {_FRAME_BYTES} AS BIGINT) AS n_frames,
         CAST(ceil((nb // {_FRAME_BYTES})
                   / CAST({_FRAME_EVERY_N} AS DOUBLE)) AS BIGINT) AS n_sampled,
         CAST(coalesce(list_sum(list_transform(
             range(0, nb // {_FRAME_BYTES}, {_FRAME_EVERY_N}),
             i -> bs[i * {_FRAME_BYTES} + 1])), 0)
           AS BIGINT) AS sampled_first_sum
  FROM b
  ORDER BY doc_id
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    video = with_binary_payload(docs.select("doc_id", "source", "text")).filter(
        F.col("modality") == "video"
    )
    return video.select("doc_id", "payload").mapInPandas(
        _frame_sample_kernel, schema=_FRAME_SAMPLE_SCHEMA
    )


# ---------------------------------------------------------------------------
# Audio chunking: fixed-size non-overlapping byte windows per audio
# payload (the segmentation step before feature extraction / ASR), one
# row per chunk with exact integer byte stats. Real audio decode stays
# behind the gated stub (resample_audio); the Spark-side plumbing --
# binary column in, Arrow batches, np.add/maximum.reduceat over the
# flat buffer with chunk boundaries, one row per chunk out -- is the
# production shape. The oracle replays byte-exactly from the UTF-8
# payload bytes (_bytes_cte), valid for any text, not just ASCII.
# ---------------------------------------------------------------------------

_AUDIO_CHUNK_BYTES = 200

_AUDIO_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.LongType()),
        T.StructField("start_byte", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("max_byte", T.LongType()),
    ]
)

AUDIO_CHUNKS_SQL = f"""
  WITH {_bytes_cte("WHERE doc_id % 3 = 1")},
  c AS (
    SELECT doc_id, bs, nb,
           UNNEST(range(0, (nb + {_AUDIO_CHUNK_BYTES - 1})
                           // {_AUDIO_CHUNK_BYTES})) AS i
    FROM b
  )
  SELECT doc_id,
         CAST(i AS BIGINT) AS chunk_idx,
         CAST(i * {_AUDIO_CHUNK_BYTES} AS BIGINT) AS start_byte,
         CAST(LEAST({_AUDIO_CHUNK_BYTES},
                    nb - i * {_AUDIO_CHUNK_BYTES}) AS BIGINT) AS n_bytes,
         CAST(list_sum(list_transform(
                range(i * {_AUDIO_CHUNK_BYTES} + 1,
                      i * {_AUDIO_CHUNK_BYTES} + 1
                      + LEAST({_AUDIO_CHUNK_BYTES}, nb - i * {_AUDIO_CHUNK_BYTES})),
                j -> bs[j])) AS BIGINT) AS byte_sum,
         CAST(list_max(list_transform(
                range(i * {_AUDIO_CHUNK_BYTES} + 1,
                      i * {_AUDIO_CHUNK_BYTES} + 1
                      + LEAST({_AUDIO_CHUNK_BYTES}, nb - i * {_AUDIO_CHUNK_BYTES})),
                j -> bs[j])) AS BIGINT) AS max_byte
  FROM c
  ORDER BY doc_id, chunk_idx
"""


def _audio_chunk_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        cols: dict[str, list] = {k: [] for k in (
            "doc_id", "chunk_idx", "start_byte", "n_bytes", "byte_sum", "max_byte"
        )}
        for did, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            if n == 0:
                continue
            arr = np.frombuffer(payload, dtype=np.uint8)
            bounds = np.arange(0, n, _AUDIO_CHUNK_BYTES, dtype=np.int64)
            k = len(bounds)
            lens = np.full(k, _AUDIO_CHUNK_BYTES, dtype=np.int64)
            lens[-1] = n - bounds[-1]
            cols["doc_id"].append(np.full(k, did, dtype=np.int64))
            cols["chunk_idx"].append(np.arange(k, dtype=np.int64))
            cols["start_byte"].append(bounds)
            cols["n_bytes"].append(lens)
            cols["byte_sum"].append(
                np.add.reduceat(arr.astype(np.int64), bounds)
            )
            cols["max_byte"].append(
                np.maximum.reduceat(arr, bounds).astype(np.int64)
            )
        if not cols["doc_id"]:
            continue
        yield pd.DataFrame({k: np.concatenate(v) for k, v in cols.items()})


def q_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    audio = with_binary_payload(docs.select("doc_id", "source", "text")).filter(
        F.col("modality") == "audio"
    )
    return (
        audio.select("doc_id", "payload")
        .mapInPandas(_audio_chunk_kernel, schema=_AUDIO_CHUNK_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Round-trip queries over the REAL decoders: each image-modality doc is
# serialized as a spec-conformant BMP (pixels = the doc's text bytes
# cycled over the RGB buffer) and decoded back through the actual
# header/pixel parser; each audio-modality doc becomes a mono 8-bit
# PCM WAV that the chunk-walking parser + integer-ratio resampler
# process. The DuckDB oracle recomputes every output from the text
# side alone, so any parser defect (stride, row order, channel order,
# chunk walk, decimation phase) diverges the hash. Per-row Python here
# is the O(1) header encode/decode any real codec pays per item; the
# pixel/sample math is numpy over the Arrow batch.
# ---------------------------------------------------------------------------

_BMP_W_MOD = 31
_BMP_H_MOD = 13

_BMP_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("last_px", T.LongType()),
        T.StructField("first_blue", T.LongType()),
    ]
)


def _bmp_roundtrip_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """encode_bmp -> decode_bmp round trip per doc. last_px (bottom-
    right blue-most sample in decoded RGB = last cycled byte) breaks if
    the decoder forgets the vertical un-flip; first_blue (top-left blue
    channel = 3rd cycled byte) breaks if BGR->RGB is dropped."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        out: dict[str, list[int]] = {
            k: []
            for k in (
                "doc_id", "width", "height", "pixel_sum", "last_px", "first_blue"
            )
        }
        for did, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8)
            if arr.size == 0:
                continue
            w = int(arr.size % _BMP_W_MOD) + 1
            h = int(arr[0] % _BMP_H_MOD) + 1
            rgb = np.resize(arr, (h, w, 3))  # cycles the text bytes
            dec_w, dec_h, pixels = decode_bmp(encode_bmp(rgb))
            out["doc_id"].append(int(did))
            out["width"].append(dec_w)
            out["height"].append(dec_h)
            out["pixel_sum"].append(int(pixels.sum(dtype=np.int64)))
            out["last_px"].append(int(pixels[-1, -1, -1]))
            out["first_blue"].append(int(pixels[0, 0, 2]))
        if out["doc_id"]:
            yield pd.DataFrame({k: np.asarray(v, dtype=np.int64) for k, v in out.items()})


BMP_DECODE_SQL = f"""
  -- nb > 0 mirrors the kernel's empty-payload skip (round-8 advice:
  -- an empty doc would otherwise emit a row with div-by-zero/NULL
  -- stats here while the kernel emits nothing); all stats are over
  -- payload BYTES via _bytes_cte, matching the kernel on non-ASCII
  WITH {_bytes_cte("WHERE CAST(doc_id % 3 AS INTEGER) = 0 AND length(text) > 0")},
  p AS (
    SELECT doc_id, bs, nb,
           (nb % {_BMP_W_MOD}) + 1 AS w,
           (bs[1] % {_BMP_H_MOD}) + 1 AS h,
           ((nb % {_BMP_W_MOD}) + 1) * ((bs[1] % {_BMP_H_MOD}) + 1) * 3 AS npix,
           list_sum(bs) AS tsum
    FROM b
  )
  SELECT doc_id,
         CAST(w AS BIGINT) AS width,
         CAST(h AS BIGINT) AS height,
         CAST((npix // nb) * tsum
              + coalesce(list_sum(bs[1 : npix % nb]), 0) AS BIGINT)
           AS pixel_sum,
         CAST(bs[((npix - 1) % nb) + 1] AS BIGINT) AS last_px,
         CAST(bs[(2 % nb) + 1] AS BIGINT) AS first_blue
  FROM p
  ORDER BY doc_id
"""


def q_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    images = with_binary_payload(docs.select("doc_id", "source", "text")).filter(
        F.col("modality") == "image"
    )
    return (
        images.select("doc_id", "payload")
        .mapInPandas(_bmp_roundtrip_kernel, schema=_BMP_DECODE_SCHEMA)
    )


_WAV_SRC_RATE = 8000
_WAV_TARGET_RATE = 2000  # integer ratio 4:1 -> exact decimation

_WAV_RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_sum", T.LongType()),
        T.StructField("max_sample", T.LongType()),
    ]
)


def _wav_resample_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """encode_wav -> resample_audio round trip per doc: text bytes as
    8-bit PCM at 8 kHz, decimated 4:1 to 2 kHz through the real RIFF
    chunk walk. A wrong decimation phase or a chunk-walk misparse
    shifts every downstream stat."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        out: dict[str, list[int]] = {
            k: [] for k in ("doc_id", "n_samples", "sample_sum", "max_sample")
        }
        for did, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8)
            if arr.size == 0:
                continue
            resampled = resample_audio(
                encode_wav(arr, _WAV_SRC_RATE), _WAV_TARGET_RATE
            )
            out["doc_id"].append(int(did))
            out["n_samples"].append(int(resampled.size))
            out["sample_sum"].append(int(resampled.sum(dtype=np.int64)))
            out["max_sample"].append(int(resampled.max()))
        if out["doc_id"]:
            yield pd.DataFrame({k: np.asarray(v, dtype=np.int64) for k, v in out.items()})


_WAV_DECIM = _WAV_SRC_RATE // _WAV_TARGET_RATE

WAV_RESAMPLE_SQL = f"""
  -- nb > 0 mirrors the kernel's empty-payload skip; PCM samples are
  -- payload BYTES via _bytes_cte, matching the kernel on non-ASCII
  WITH {_bytes_cte("WHERE CAST(doc_id % 3 AS INTEGER) = 1 AND length(text) > 0")}
  SELECT doc_id,
         CAST((nb + {_WAV_DECIM - 1}) // {_WAV_DECIM} AS BIGINT)
           AS n_samples,
         CAST(list_sum(list_transform(
             range(1, nb + 1, {_WAV_DECIM}), j -> bs[j])) AS BIGINT)
           AS sample_sum,
         CAST(list_max(list_transform(
             range(1, nb + 1, {_WAV_DECIM}), j -> bs[j])) AS BIGINT)
           AS max_sample
  FROM b
  ORDER BY doc_id
"""


def q_wav_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    audio = with_binary_payload(docs.select("doc_id", "source", "text")).filter(
        F.col("modality") == "audio"
    )
    return (
        audio.select("doc_id", "payload")
        .mapInPandas(_wav_resample_kernel, schema=_WAV_RESAMPLE_SCHEMA)
    )


QUERIES_EXPORT: dict[str, tuple[SparkQuery, str | None]] = {
    "multimodal_binary_features": (q_binary_features, BINARY_FEATURES_SQL),
    "multimodal_frame_sample": (q_frame_sample, FRAME_SAMPLE_SQL),
    "multimodal_audio_chunks": (q_audio_chunks, AUDIO_CHUNKS_SQL),
    "multimodal_bmp_decode": (q_bmp_decode, BMP_DECODE_SQL),
    "multimodal_wav_resample": (q_wav_resample, WAV_RESAMPLE_SQL),
}
