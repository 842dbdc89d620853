"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is
stubbed exactly as a production pipeline would gate a missing optional
dependency: :func:`decode_image` / :func:`resample_audio` /
:func:`sample_frames` raise ``NotImplementedError`` unless a
deterministic fake decoder is requested. Everything around the stub --
the binary schema, the Arrow batch iteration, the output contract, the
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
# Stubbed decoders -- the optional-dependency gate, spelled explicitly.
# ---------------------------------------------------------------------------


def decode_image(payload: bytes, *, fake: bool = False) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    Real decoding needs an image codec (PIL/opencv), which this
    environment does not ship; ``fake=True`` derives deterministic
    dimensions from the bytes instead (used by tests and the plumbing
    query below -- clearly marked, never silently wrong).
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec (PIL/opencv); "
            "re-run with fake=True for the deterministic stub"
        )
    width = int(payload[0]) % 64 + 1 if payload else 1
    height = len(payload) % 64 + 1
    return width, height


def resample_audio(payload: bytes, rate: int = 16000) -> np.ndarray:
    raise NotImplementedError(
        "audio resampling requires an audio codec (soundfile/librosa)"
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


# DuckDB recomputes the same features from the text side (ASCII: the
# byte at position i is ascii(substr(text, i, 1))).
BINARY_FEATURES_SQL = """
  WITH feats AS (
    SELECT doc_id, source,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           length(text) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           list_sum(list_transform(range(1, length(text) + 1),
                                   i -> ascii(substr(text, i, 1)))) AS byte_sum,
           ascii(substr(text, 1, 1)) % 64 + 1 AS fake_width,
           length(text) % 64 + 1 AS fake_height
    FROM documents
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
        .orderBy("modality", "source")
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
  SELECT doc_id,
         length(text) // {_FRAME_BYTES} AS n_frames,
         CAST(ceil((length(text) // {_FRAME_BYTES})
                   / CAST({_FRAME_EVERY_N} AS DOUBLE)) AS BIGINT) AS n_sampled,
         CAST(coalesce(list_sum(list_transform(
             range(0, length(text) // {_FRAME_BYTES}, {_FRAME_EVERY_N}),
             i -> ascii(substr(text, i * {_FRAME_BYTES} + 1, 1)))), 0)
           AS BIGINT) AS sampled_first_sum
  FROM documents
  WHERE CAST(doc_id % 3 AS INTEGER) = 2
  ORDER BY doc_id
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    video = with_binary_payload(docs.select("doc_id", "source", "text")).filter(
        F.col("modality") == "video"
    )
    return video.select("doc_id", "payload").mapInPandas(
        _frame_sample_kernel, schema=_FRAME_SAMPLE_SCHEMA
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Audio chunking: fixed-size non-overlapping byte windows per audio
# payload (the segmentation step before feature extraction / ASR), one
# row per chunk with exact integer byte stats. Real audio decode stays
# behind the gated stub (resample_audio); the Spark-side plumbing --
# binary column in, Arrow batches, np.add/maximum.reduceat over the
# flat buffer with chunk boundaries, one row per chunk out -- is the
# production shape. The oracle replays byte-exactly from the text side
# (payloads are UTF-8 of ASCII text, so byte i == ascii(char i)).
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
  WITH a AS (
    SELECT doc_id, text, length(text) AS n
    FROM documents WHERE doc_id % 3 = 1
  ),
  c AS (
    SELECT doc_id, text, n,
           UNNEST(range(0, (n + {_AUDIO_CHUNK_BYTES - 1})
                           // {_AUDIO_CHUNK_BYTES})) AS i
    FROM a
  )
  SELECT doc_id,
         CAST(i AS BIGINT) AS chunk_idx,
         CAST(i * {_AUDIO_CHUNK_BYTES} AS BIGINT) AS start_byte,
         CAST(LEAST({_AUDIO_CHUNK_BYTES},
                    n - i * {_AUDIO_CHUNK_BYTES}) AS BIGINT) AS n_bytes,
         CAST(list_sum(list_transform(
                range(i * {_AUDIO_CHUNK_BYTES} + 1,
                      i * {_AUDIO_CHUNK_BYTES} + 1
                      + LEAST({_AUDIO_CHUNK_BYTES}, n - i * {_AUDIO_CHUNK_BYTES})),
                j -> ascii(substr(text, j, 1)))) AS BIGINT) AS byte_sum,
         CAST(list_max(list_transform(
                range(i * {_AUDIO_CHUNK_BYTES} + 1,
                      i * {_AUDIO_CHUNK_BYTES} + 1
                      + LEAST({_AUDIO_CHUNK_BYTES}, n - i * {_AUDIO_CHUNK_BYTES})),
                j -> ascii(substr(text, j, 1)))) AS BIGINT) AS max_byte
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
        .orderBy("doc_id", "chunk_idx")
    )


QUERIES_EXPORT: dict[str, tuple[SparkQuery, str | None]] = {
    "multimodal_binary_features": (q_binary_features, BINARY_FEATURES_SQL),
    "multimodal_frame_sample": (q_frame_sample, FRAME_SAMPLE_SQL),
    "multimodal_audio_chunks": (q_audio_chunks, AUDIO_CHUNKS_SQL),
}
