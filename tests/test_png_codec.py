"""Conformance + driver parity for the stdlib PNG codec
(functions/png_codec.py).

A round trip alone can hide a MATCHED encoder/decoder bug (both sides
sharing a wrong Paeth predictor still reproduce the input), so the
known-answer tests below check the encoded byte stream against values
computed by hand from the PNG specification (RFC 2083 §6), not against
this codec."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_sales_pandas_sqlserver_spark.functions.png_codec import (
    QUERIES_EXPORT,
    _paeth,
    decode_png,
    encode_png,
)

from .oracle_compare import compare, run_oracle


def _idat_stream(payload: bytes) -> bytes:
    """Extract and inflate the IDAT stream of an encoded PNG."""
    pos = 8
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat.extend(payload[pos + 8 : pos + 8 + length])
        pos += 12 + length
    return zlib.decompress(bytes(idat))


def test_roundtrip_exact_all_filters():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (2, 3), (5, 4), (17, 29), (13, 8), (1, 29), (6, 1)]:
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        dw, dh, out = decode_png(encode_png(px))
        assert (dw, dh) == (w, h)
        assert np.array_equal(out, px)


def test_known_answer_none_and_sub_filters():
    """2x2 image: row 0 carries filter 0 (None, raw bytes), row 1
    filter 1 (Sub, byte minus the byte one PIXEL to the left).
    Expected filtered bytes computed by hand from the spec."""
    px = np.array(
        [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8
    )
    stream = _idat_stream(encode_png(px))
    assert list(stream) == [
        0, 1, 2, 3, 4, 5, 6,          # row 0: None
        1, 7, 8, 9, 3, 3, 3,          # row 1: Sub (10-7, 11-8, 12-9)
    ]


def test_known_answer_up_average_paeth_rows():
    """5x1 image exercises Up (row 2), Average (row 3), Paeth (row 4);
    with w=1 there is no left neighbor, so Average halves the up byte
    and Paeth predicts the up byte (b wins when a=c=0)."""
    col = np.array([[[10, 20, 30]], [[50, 60, 70]], [[90, 100, 110]],
                    [[130, 140, 150]], [[170, 180, 190]]], dtype=np.uint8)
    stream = _idat_stream(encode_png(col))
    rows = [list(stream[i * 4 : (i + 1) * 4]) for i in range(5)]
    assert rows[0] == [0, 10, 20, 30]
    assert rows[1] == [1, 50, 60, 70]          # Sub, no left -> raw
    assert rows[2] == [2, 40, 40, 40]          # Up: 90-50 ...
    assert rows[3] == [3, 130 - 45, 140 - 50, 150 - 55]  # Avg: floor(up/2)
    assert rows[4] == [4, 40, 40, 40]          # Paeth -> up predictor


def test_paeth_predictor_spec_cases():
    # ties prefer a, then b (RFC 2083: "breaking ties in order a, b, c")
    assert _paeth(3, 4, 5) == 3       # p=2: pa=1 smallest -> a
    assert _paeth(0, 0, 0) == 0
    assert _paeth(10, 10, 10) == 10   # tie -> a
    assert _paeth(0, 255, 128) == 128  # p=127: pc=1 smallest -> c
    assert _paeth(255, 0, 128) == 128  # p=127: pc=1 smallest -> c
    assert _paeth(1, 2, 254) == 1     # p=-251: pa=252 smallest -> a
    assert _paeth(5, 9, 7) == 7       # p=7: pc=0 smallest -> c
    assert _paeth(4, 5, 2) == 5       # p=7: pa=3, pb=2 -> b


def test_corruption_and_truncation_detected():
    px = np.zeros((3, 3, 3), dtype=np.uint8)
    good = encode_png(px)
    bad = bytearray(good)
    bad[20] ^= 1
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(good[:-6])
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_unsupported_features_gate_honestly():
    # grayscale IHDR must raise NotImplementedError, not garbage
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    buf = bytearray(encode_png(px))
    # IHDR data starts at offset 16; colortype is its 10th byte
    ihdr = bytearray(buf[16 : 16 + 13])
    ihdr[9] = 0  # grayscale
    crc = zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    buf[16 : 16 + 13] = ihdr
    buf[29:33] = struct.pack(">I", crc)
    with pytest.raises(NotImplementedError):
        decode_png(bytes(buf))


def test_png_decode_oracle_parity(spark, sf_small):
    fn, sql = QUERIES_EXPORT["multimodal_png_decode"]
    problems = compare(fn(spark, sf_small), run_oracle(sql, sf_small))
    assert not problems, problems
