"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's monthly
summary over the cleaned valid-sales pipeline, reference main.py:156-179,
mapped onto the driver testdata) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md
section 2 with its DuckDB oracle twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_sales_pandas_sqlserver_spark.plans.testdata_queries import QUERIES  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["monthly_summary"]
    return fn(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; non-SQL-expressible ops are
    omitted (driver records a rows-only check for those)."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
