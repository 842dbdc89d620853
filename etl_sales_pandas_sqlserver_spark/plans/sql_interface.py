"""The engine's SQL entry point: register the testdata tables as temp
views and run ANSI SQL through ``spark.sql``. Catalyst plans SQL and
DataFrame code identically (same logical plan, same optimizations), so
this surface costs nothing extra -- the point is that a SQL-first user
can drive the engine without touching the DataFrame API.

The registered query's text is deliberately engine-portable ANSI: the
SAME string is the DuckDB oracle, so the correctness check also proves
the SQL dialect subset used here is portable.

Scale shape: dim-to-fact star join (region, nation are broadcast-size;
customer joins orders on the shuffle). AQE picks broadcast for the
small sides at runtime -- no hints needed in SQL text, which keeps the
query engine-portable.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.testdata import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every testdata table as a temp view for spark.sql use."""
    for t in _TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


#: one portable SQL text -- runs verbatim on Spark AND DuckDB
REGION_YEAR_REVENUE_SQL = """
  SELECT r.r_name AS region,
         CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, year(o.o_orderdate)
  ORDER BY region, order_year
"""


def q_sql_region_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(REGION_YEAR_REVENUE_SQL)


SQL_INTERFACE_QUERIES: dict[str, tuple[SparkQuery, str | None]] = {
    "sql_region_year_revenue": (
        q_sql_region_year_revenue,
        REGION_YEAR_REVENUE_SQL,
    ),
}
