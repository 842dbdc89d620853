"""Property tests for the cross-engine primitives the round-9 oracles
lean on, checked against Python ground truth through DuckDB alone (no
Spark session -- these guard the ORACLE side of the contract; the
Spark side is pinned by the driver-style parity suites).

1. _bytes_cte: to_hex(encode(text)) + hex-digit arithmetic must
   recover the exact UTF-8 byte values for ARBITRARY unicode text --
   the multimodal oracles' byte grain rests on it.
2. The k-means quantizer floor(CAST(x AS DOUBLE) * 2^20) must agree
   with Python's exact math for arbitrary float32 inputs (the product
   of a 24-bit mantissa and a power of two is exact in double, so
   floor is deterministic) -- every integer the k-means oracles hash
   descends from it.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_sales_pandas_sqlserver_spark.functions.multimodal import _bytes_cte


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=60))
def test_bytes_cte_recovers_exact_utf8_bytes(con, s):
    con.execute("CREATE OR REPLACE TABLE documents AS SELECT 1 AS doc_id, ? AS text, 's' AS source", [s])
    got = con.execute(
        f"WITH {_bytes_cte('')} SELECT nb, bs FROM b"
    ).fetchone()
    want = list(s.encode("utf-8"))
    assert got[0] == len(want)
    assert list(got[1]) == want


@settings(max_examples=200, deadline=None)
@given(
    st.floats(
        width=32, allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
    )
)
def test_kmeans_quantizer_matches_exact_math(con, x):
    import numpy as np

    from etl_sales_pandas_sqlserver_spark.functions.kmeans import _Q

    x32 = np.float32(x)
    got = con.execute(
        f"SELECT CAST(floor(CAST(CAST(? AS FLOAT) AS DOUBLE) * {_Q}.0) AS BIGINT)",
        [float(x32)],
    ).fetchone()[0]
    # ground truth: float32 -> exact Fraction, scale by 2^20, floor
    from fractions import Fraction

    want = math.floor(Fraction(float(x32)) * _Q)
    assert got == want, (x32, got, want)
