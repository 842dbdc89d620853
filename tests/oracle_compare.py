"""Local re-implementation of the driver's Spark-vs-DuckDB compare:
row-count + column set + order-insensitive value comparison.

Used by tests/test_oracle_parity.py to pre-validate every
``queries()``/``oracle_sql()`` pair before the driver does.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from etl_sales_pandas_sqlserver_spark.schemas import TESTDATA_TABLES


_CONNS: dict[str, duckdb.DuckDBPyConnection] = {}


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Shared per-SF DuckDB connection with the testdata views mounted."""
    con = _CONNS.get(sf_dir)
    if con is None:
        con = duckdb.connect()
        for name in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        _CONNS[sf_dir] = con
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    return oracle_connection(sf_dir).execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    # canonicalize cell values to hashable, float-tolerant forms
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: _canon_value(v))
        else:
            df[c] = df[c].map(_canon_value)
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(str)).reset_index(
        drop=True
    )


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # driver hashes exact values; we keep full precision and rely on
        # the engine determinism rules in plans/testdata_queries.py
        return v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return v


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    sdf = spark_df.toPandas()
    if len(sdf) != len(oracle_df):
        problems.append(f"row count: spark={len(sdf)} oracle={len(oracle_df)}")
    scols = sorted(c.lower() for c in sdf.columns)
    ocols = sorted(c.lower() for c in oracle_df.columns)
    if scols != ocols:
        problems.append(f"columns: spark={scols} oracle={ocols}")
        return problems
    a, b = _canon(sdf), _canon(oracle_df)
    if len(a) == len(b):
        neq = []
        for c in a.columns:
            av, bv = a[c], b[c]
            col_eq = av.combine(
                bv, lambda x, y: (x is None and y is None) or _val_eq(x, y)
            )
            if not col_eq.all():
                idx = col_eq[~col_eq].index[0]
                neq.append(f"{c}[row {idx}]: spark={av[idx]!r} oracle={bv[idx]!r}")
        if neq:
            problems.append("value mismatches: " + "; ".join(neq[:5]))
    return problems


def _val_eq(x, y) -> bool:
    if isinstance(x, float) and isinstance(y, float):
        return x == y or (math.isnan(x) and math.isnan(y)) or math.isclose(
            x, y, rel_tol=0, abs_tol=0
        )
    return x == y
