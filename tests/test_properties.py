"""Property-based tests (hypothesis): the money-math and dedup-hash
invariants that golden fixtures can only spot-check. Each example is a
BATCH of generated values pushed through one Spark job, so the suite
stays fast while the generator explores tie-adjacent cents, negative
amounts, and garbage strings a hand-written fixture would miss.
"""

from __future__ import annotations

from decimal import ROUND_HALF_EVEN, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_sales_pandas_sqlserver_spark.operators.numeric import (
    normalize_currency,
)

#: exact-cent amounts as strings, including the .xx25/.xx75 cases whose
#: *0.85 product lands exactly on a rounding tie (xx.5 cents)
_amounts = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)
_currency = st.sampled_from(["USD", "EUR", ""])


def _expected(amount: Decimal, cur: str) -> float:
    if cur == "EUR":
        exact = amount * Decimal("0.85")
        return float(exact.quantize(Decimal("0.01"), rounding=ROUND_HALF_EVEN))
    return float(amount)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(st.tuples(_amounts, _currency), min_size=1, max_size=64))
def test_normalize_currency_matches_decimal_reference(spark, batch):
    rows = [(f"{amt}{cur}",) for amt, cur in batch]
    df = spark.createDataFrame(rows, "raw string")
    got = [
        r["out"]
        for r in df.select(normalize_currency("raw").alias("out")).collect()
    ]
    want = [_expected(amt, cur) for amt, cur in batch]
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="ascii", exclude_categories=["Cs", "Cc"]
            ),
            max_size=24,
        ),
        min_size=1,
        max_size=64,
    )
)
def test_garbage_amounts_null_never_throw(spark, batch):
    # ANSI mode is ON in driver conditions; try_cast semantics must
    # hold for arbitrary garbage -- NULL, never an exception
    df = spark.createDataFrame([(s,) for s in batch], "raw string")
    out = df.select(normalize_currency("raw").alias("out")).collect()
    assert len(out) == len(batch)
