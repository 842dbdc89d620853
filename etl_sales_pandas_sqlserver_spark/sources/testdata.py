"""Parquet loaders for the driver testdata star schema.

``events`` is read with its declared ``StructType``: the testdata
stores ``ts`` as parquet ``timestamp[us]`` with no timezone, which a
**vanilla** Spark 4 session (``spark.sql.parquet.inferTimestampNTZ.
enabled=true`` by default) infers as TIMESTAMP_NTZ -- and
``unix_micros`` / watermarks / interval arithmetic then fail with
DATATYPE_MISMATCH. Declaring TimestampType (LTZ) pins the type
regardless of which session runs the plan; the raw stored micros are
then read as UTC-epoch instants, so every epoch-microsecond output is
timezone-independent and matches DuckDB's ``epoch_us`` on the same
naive values. (Same pattern as ``streaming/queries.py``'s stream
schema, which went green under the driver in round 3.)

The other tables keep schema inference: their timestamp columns
(``o_orderdate``, ``l_shipdate``) are only compared/formatted as
*dates*, for which the driver's NTZ read is timezone-proof and has
been driver-verified green; forcing LTZ there would make date
extraction depend on the session timezone for no benefit.

We still fail loudly on column drift -- a declared-schema read
silently null-fills missing columns, so events asserts against the
footer's inferred column set first (footer-only metadata read,
negligible at any scale). The reference instead swallows errors into
an empty frame (``main.py:149-151``, ``return pd.DataFrame()``) -- an
explicit non-goal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table: {name!r}")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    df = spark.read.parquet(path)
    expected = {f.name for f in TESTDATA_TABLES[name].fields}
    got = set(df.columns)
    if not expected.issubset(got):
        raise ValueError(f"{name}: missing columns {sorted(expected - got)}")
    if name == "events":
        return spark.read.schema(TESTDATA_TABLES[name]).parquet(path)
    return df


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
