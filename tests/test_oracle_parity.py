"""Pre-validate every queries()/oracle_sql() pair exactly the way the
driver will: run the Spark query and the DuckDB oracle on the same
parquet tables, compare row-count + columns + order-insensitive values.

Runs at sf0.001 by default (fast dev loop); set
SPARK_GRAFT_SF_ORACLE=/root/testdata/sf0.01 to match the driver's t2.
"""

from __future__ import annotations

import pytest

from etl_sales_pandas_sqlserver_spark.plans.testdata_queries import QUERIES

from .oracle_compare import compare, run_oracle

CASES = [(name, fn, sql) for name, (fn, sql) in QUERIES.items() if sql is not None]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_oracle_parity(spark, sf_small, name, fn, sql):
    sdf = fn(spark, sf_small)
    odf = run_oracle(sql, sf_small)
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == [
        "mes",
        "producto",
        "ventas_totales",
        "numero_transacciones",
        "venta_minima",
    ]


def test_registry_consistency():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o).issubset(set(q))
    assert q, "queries() must not be empty"
