"""Registry-wide non-empty-result invariant (round-7, verdict #2).

A driver hash-match on a 0-row result verifies nothing: both engines
agree on the empty set even when the whole plan is dead (the round-6
`tpch_q8_market_share` had a filter on a region name that does not
exist in the testdata and sat vacuously green for five rounds).

This test runs every registered oracle SQL through DuckDB at the
driver's correctness SF (sf0.01) and asserts the result is non-empty.
DuckDB-only is sufficient: if the oracle returns >0 rows and the
driver's hash comparison passes, the Spark side returned the same
non-empty set — so no oracle-checkable query can ever be vacuously
green again. (Running the Spark side too would triple the cost for no
extra coverage; `test_oracle_parity` already executes every Spark
plan.)

Queries whose CORRECT answer is legitimately empty must be listed in
``EMPTY_OK`` with a justification — none exist today.
"""

from __future__ import annotations

import pytest

from etl_sales_pandas_sqlserver_spark.plans.testdata_queries import QUERIES

from .conftest import SF_ORACLE
from .oracle_compare import oracle_connection

# name -> why an empty result is the correct answer. Keep this empty
# unless a query's semantics genuinely produce zero rows on the
# testdata; a dead filter is NOT a justification.
EMPTY_OK: dict[str, str] = {}

CASES = [(name, sql) for name, (fn, sql) in QUERIES.items() if sql is not None]


@pytest.mark.parametrize("name,sql", CASES, ids=[c[0] for c in CASES])
def test_oracle_nonempty(name, sql):
    if name in EMPTY_OK:
        pytest.skip(f"legitimately empty: {EMPTY_OK[name]}")
    con = oracle_connection(SF_ORACLE)
    n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
    assert n > 0, (
        f"{name}: oracle returns 0 rows at {SF_ORACLE} — a hash match "
        "would be vacuous. Fix the query (dead filter?) or add an "
        "EMPTY_OK justification."
    )
