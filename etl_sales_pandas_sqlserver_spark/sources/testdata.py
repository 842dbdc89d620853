"""Parquet loaders for the driver testdata star schema.

Declared schemas only -- parquet carries its own schema; we assert the
expected column set so downstream plans fail loudly on drift instead of
silently resolving to a wrong column (reference behavior on errors is
``return pd.DataFrame()``, main.py:149-151 -- an explicit non-goal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table: {name!r}")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    expected = {f.name for f in TESTDATA_TABLES[name].fields}
    got = set(df.columns)
    if not expected.issubset(got):
        raise ValueError(f"{name}: missing columns {sorted(expected - got)}")
    return df


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
