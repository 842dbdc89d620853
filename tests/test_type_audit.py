"""Registry-wide cross-engine output-type audit (round-8, verdict #1b).

The driver hashes TYPED values: a DuckDB ``SUM(BIGINT)`` surfaces at the
Arrow layer as HUGEINT -> ``decimal128(38,0)`` (``Decimal(123)``) while
the Spark twin emits ``int64`` (``123``), so the value hash diverges
even when the arithmetic is identical.  Round 7's
``window_zscore_anomaly`` sat red for exactly this reason while the
local value-canonicalizing sim stayed green — the typed divergence was
invisible to the builder.

This test closes the class: every registered oracle SQL is planned
through DuckDB with ``LIMIT 0`` (types are fully resolved, nothing is
executed) and its Arrow schema is asserted decimal-free.  No Spark plan
in this repo emits DecimalType (the testdata parquet has no decimal
columns and every aggregate is spelled over BIGINT/DOUBLE), so ANY
decimal column in an oracle's output is a typed divergence waiting to
hash red on the driver.  The canonical offender is a bare
``SUM(<bigint>)`` — spell it ``CAST(SUM(x) AS BIGINT)`` (or cast the
aliased CTE column, as ZSCORE_ANOMALY_SQL now does).

If a future query legitimately emits decimal on BOTH engines, list it
in ``DECIMAL_OK`` with the matching Spark-side DecimalType evidence.
"""

from __future__ import annotations

import pytest

from etl_sales_pandas_sqlserver_spark.plans.testdata_queries import QUERIES

from .conftest import SF_ORACLE
from .oracle_compare import oracle_connection

# name -> justification; only valid when the Spark plan's schema also
# says DecimalType for the same column. None exist today.
DECIMAL_OK: dict[str, str] = {}

CASES = [(name, sql) for name, (fn, sql) in QUERIES.items() if sql is not None]


@pytest.mark.parametrize("name,sql", CASES, ids=[c[0] for c in CASES])
def test_oracle_output_types_decimal_free(name, sql):
    if name in DECIMAL_OK:
        pytest.skip(f"decimal on both engines: {DECIMAL_OK[name]}")
    con = oracle_connection(SF_ORACLE)
    schema = con.execute(
        f"SELECT * FROM ({sql}) LIMIT 0"
    ).fetch_arrow_table().schema
    leaks = [
        f"{f.name}: {f.type}" for f in schema if "decimal" in str(f.type)
    ]
    assert not leaks, (
        f"{name}: oracle emits decimal at the Arrow layer ({leaks}) but "
        "Spark will emit int64/double — the driver's typed value hash "
        "WILL diverge. CAST the offending expression (usually a bare "
        "SUM over BIGINT) to BIGINT/DOUBLE in the oracle SQL."
    )
