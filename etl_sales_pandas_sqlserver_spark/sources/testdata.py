"""Parquet loaders for the driver testdata star schema.

Declared schemas only -- parquet carries its own schema; we assert the
expected column set so downstream plans fail loudly on drift instead of
silently resolving to a wrong column (reference behavior on errors is
``return pd.DataFrame()``, main.py:149-151 -- an explicit non-goal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table: {name!r}")
    if name == "events":
        # legacy testdata vintages stored ts as TIMESTAMP(NANOS), which
        # Spark can only read as long (nanosAsLong); current vintages
        # store timestamp[us] and read natively (as LTZ -- NTZ inference
        # is disabled in session.get_spark to match the DuckDB oracle's
        # naive-as-UTC reading). The LongType branch below converts the
        # legacy case; truncation to micros matches DuckDB's ns->us read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    expected = {f.name for f in TESTDATA_TABLES[name].fields}
    got = set(df.columns)
    if not expected.issubset(got):
        raise ValueError(f"{name}: missing columns {sorted(expected - got)}")
    return df


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
