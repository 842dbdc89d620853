"""Layer B relational/analytic coverage (SURVEY.md section 7 phase 5):
joins across the star schema, window functions, rollup, conditional
pivot, TPC-H-style aggregates, sessionization, JSON extraction.

The reference has NO joins/windows/rollups (SURVEY.md section 2.5 note)
-- this layer generalizes the engine to the full relational surface a
user of any batch ETL tool expects, exercised on the driver testdata
with DuckDB oracles.

Scale notes are attached per query: which side broadcasts, where the
shuffles are, why the plan survives 100x data.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dates import epoch_us
from ..sources.testdata import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary: the canonical partial+final hash agg.
# Filter reaches the parquet scan (PushedFilters); sums accumulate in
# DECIMAL for cross-engine determinism, cast back to double.
# ---------------------------------------------------------------------------

_TPCH_Q1_SQL = """
  SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         COUNT(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  GROUP BY 1, 2
  ORDER BY 1, 2
"""


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Broadcast join chain: customer |x| nation |x| region. nation (25 rows)
# and region (5 rows) are classic broadcast dims -- no shuffle of the
# customer side at any scale; only the final groupBy shuffles.
# ---------------------------------------------------------------------------

_REGION_ACCTBAL_SQL = """
  SELECT r.r_name AS region_name,
         COUNT(*) AS n_customers,
         CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1
  ORDER BY 1
"""


def q_region_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Fact-to-dimension shuffle join + agg: orders |x| customer revenue by
# nation & market segment. customer is broadcast-size here but grows
# with SF -- written WITHOUT a hint so Catalyst/AQE picks broadcast vs
# sort-merge by actual size (the right call at 100 TB).
# ---------------------------------------------------------------------------

_NATION_SEGMENT_REVENUE_SQL = """
  SELECT n.n_name AS nation_name, c.c_mktsegment AS mktsegment,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
  ORDER BY 1, 2
"""


def q_nation_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey).join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation_name"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Semi/anti joins: EXISTS / NOT EXISTS without materializing the right
# side's columns -- Spark ships only the join keys of the right side.
# ---------------------------------------------------------------------------

_CUSTOMERS_WITH_ORDERS_SQL = """
  SELECT c_custkey AS custkey, c_name AS name
  FROM customer c
  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  ORDER BY 1
"""


def q_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
    )


_CUSTOMERS_WITHOUT_ORDERS_SQL = """
  SELECT c_custkey AS custkey, c_name AS name
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'F')
  ORDER BY 1
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no FINISHED order. The status filter keeps the
    anti-join result non-empty at every test SF (every customer has
    *some* order in the synthetic data, so an unfiltered anti-join
    would be vacuously green on 0 rows)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
    )


# ---------------------------------------------------------------------------
# Top-K per group: the window top-k pattern with a deterministic
# tiebreak. Spark turns row_number<=K into WindowGroupLimit (map-side
# top-K before the shuffle) -- the scalable top-k-per-key shape.
# ---------------------------------------------------------------------------

_TOP_ORDERS_PER_CUSTOMER_SQL = """
  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
         o_totalprice AS totalprice, rn
  FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders)
  WHERE rn <= 3
"""


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("rn"),
        )
    )


# ---------------------------------------------------------------------------
# Rollup: subtotal hierarchy region -> nation with grouping() flags to
# distinguish subtotal NULLs from data NULLs (both engines agree).
# ---------------------------------------------------------------------------

_ROLLUP_SQL = """
  SELECT r.r_name AS region_name, n.n_name AS nation_name,
         grouping(r.r_name) AS g_region, grouping(n.n_name) AS g_nation,
         COUNT(*) AS n_customers,
         CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY ROLLUP(r.r_name, n.n_name)
  ORDER BY 3, 4, 1, 2
"""


def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    joined = joined.withColumnRenamed("r_name", "region_name").withColumnRenamed(
        "n_name", "nation_name"
    )
    out = (
        joined.rollup("region_name", "nation_name")
        .agg(
            F.grouping("region_name").cast("long").alias("g_region"),
            F.grouping("nation_name").cast("long").alias("g_nation"),
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Pivot as conditional aggregation (engine-portable spelling of
# df.groupBy().pivot(); identical plan: one hash agg, no extra pass).
# ---------------------------------------------------------------------------

_PIVOT_STATUS_SQL = """
  SELECT o_orderpriority AS priority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS total_f,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS total_o,
         CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS total_p
  FROM orders
  GROUP BY 1
  ORDER BY 1
"""


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def status_sum(s: str):
        return (
            F.sum(
                F.when(
                    F.col("o_orderstatus") == s,
                    F.col("o_totalprice").cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            )
            .cast("double")
            .alias(f"total_{s.lower()}")
        )

    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(status_sum("F"), status_sum("O"), status_sum("P"))
    )


# ---------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session (lag + conditional
# cumsum). Two windows over the same (user_id, ts) partitioning -> ONE
# shuffle; Spark reuses the sort. Clock-less events (NULL ts) are NOT
# sessionizable and are excluded EXPLICITLY on both engines -- without
# the filter they sort to opposite ends of the window (Spark orders
# NULLS FIRST, DuckDB NULLS LAST) and session boundaries diverge
# (r13 hostile-events audit, tests/test_hostile_events.py).
# ---------------------------------------------------------------------------

_SESSIONIZE_SQL = """
  WITH gaps AS (
    SELECT user_id, ts,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > 1800000000 OR
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WHERE ts IS NOT NULL
  ),
  sessions AS (
    SELECT user_id,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM gaps
  )
  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         COUNT(*) AS n_events
  FROM sessions
  GROUP BY 1, 2
  ORDER BY 1, 2
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap math (cast-to-long would truncate to
    # seconds and disagree with the oracle on 30:00.xx gaps);
    # type-aware epoch so an NTZ read can't shift by session TZ
    tsu = epoch_us(events, "ts")
    gap = tsu - F.lag(tsu).over(w)
    new_session = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(cum))
        .groupBy("user_id", F.col("session_id").cast("long").alias("session_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# JSON extraction: events.props is a JSON string column; pull a typed
# field JVM-side (get_json_object, no UDF) and aggregate.
# ---------------------------------------------------------------------------

_EVENTS_JSON_SQL = """
  SELECT event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
         CAST(MIN(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
         CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
  FROM events
  GROUP BY 1
  ORDER BY 1
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# Data-quality expectation suite as a registered, hash-checked query:
# the dbt-test/Great-Expectations surface of operators/quality.py, but
# with the verdict booleans computed IN-PLAN so the driver's value-hash
# certifies the whole suite (row count, null fraction, key uniqueness,
# accepted values, range violations) -- one aggregation job, one scan,
# then a 5-row unpivot. Measures are integer counts or exact 0/1-sum
# fractions, so the doubles are bitwise-portable.
# ---------------------------------------------------------------------------

QUALITY_EXPECTATIONS_SQL = """
  WITH m AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS row_count,
           COALESCE(AVG(CASE WHEN o_custkey IS NULL THEN 1.0 ELSE 0.0 END),
                    0.0) AS null_frac_custkey,
           CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS DOUBLE)
             AS dup_orderkeys,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P')
                                    AND o_orderstatus IS NOT NULL
                                   THEN 1 ELSE 0 END), 0) AS DOUBLE)
             AS bad_status,
           CAST(COALESCE(SUM(CASE WHEN o_totalprice <= 0
                                    OR o_totalprice > 10000000
                                   THEN 1 ELSE 0 END), 0) AS DOUBLE)
             AS price_viol
    FROM orders
  )
  SELECT 'row_count_gt_0' AS check_name, row_count AS measured,
         row_count > 0 AS ok FROM m
  UNION ALL SELECT 'not_null_o_custkey', null_frac_custkey,
         null_frac_custkey = 0.0 FROM m
  UNION ALL SELECT 'unique_o_orderkey', dup_orderkeys,
         dup_orderkeys = 0.0 FROM m
  UNION ALL SELECT 'accepted_values_o_orderstatus', bad_status,
         bad_status = 0.0 FROM m
  UNION ALL SELECT 'range_o_totalprice', price_viol,
         price_viol = 0.0 FROM m
  ORDER BY check_name
"""


def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.agg(
        F.count(F.lit(1)).cast("double").alias("row_count"),
        # coalesce: empty input -> 0 nulls seen -> vacuous pass (dbt
        # semantics); the row-count check is what fails on empty
        F.coalesce(
            F.avg(F.col("o_custkey").isNull().cast("double")), F.lit(0.0)
        ).alias("null_frac_custkey"),
        (
            F.count("o_orderkey") - F.count_distinct("o_orderkey")
        )
        .cast("double")
        .alias("dup_orderkeys"),
        F.coalesce(
            F.sum(
                (
                    ~F.col("o_orderstatus").isin("F", "O", "P")
                    & F.col("o_orderstatus").isNotNull()
                ).cast("long")
            ),
            F.lit(0),
        )
        .cast("double")
        .alias("bad_status"),
        F.coalesce(
            F.sum(
                (
                    (F.col("o_totalprice") <= 0)
                    | (F.col("o_totalprice") > 10_000_000)
                ).cast("long")
            ),
            F.lit(0),
        )
        .cast("double")
        .alias("price_viol"),
    )
    checks = [
        ("row_count_gt_0", F.col("row_count"), F.col("row_count") > 0),
        (
            "not_null_o_custkey",
            F.col("null_frac_custkey"),
            F.col("null_frac_custkey") == 0.0,
        ),
        (
            "unique_o_orderkey",
            F.col("dup_orderkeys"),
            F.col("dup_orderkeys") == 0.0,
        ),
        (
            "accepted_values_o_orderstatus",
            F.col("bad_status"),
            F.col("bad_status") == 0.0,
        ),
        (
            "range_o_totalprice",
            F.col("price_viol"),
            F.col("price_viol") == 0.0,
        ),
    ]
    # explode one array of structs from the single agg row -- a UNION
    # of five selects over `m` would re-execute the aggregate (or at
    # best lean on exchange reuse); this is one scan by construction
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                measured.alias("measured"),
                ok.alias("ok"),
            )
            for name, measured, ok in checks
        ]
    )
    return (
        m.select(F.explode(structs).alias("c"))
        .select("c.*")
    )


ANALYTICS_QUERIES: dict[str, tuple[SparkQuery, str | None]] = {
    "quality_expectations_orders": (
        q_quality_expectations,
        QUALITY_EXPECTATIONS_SQL,
    ),
    "tpch_q1_pricing_summary": (q_tpch_q1, _TPCH_Q1_SQL),
    "join_broadcast_region_acctbal": (q_region_acctbal, _REGION_ACCTBAL_SQL),
    "join_nation_segment_revenue": (q_nation_segment_revenue, _NATION_SEGMENT_REVENUE_SQL),
    "join_semi_customers_with_orders": (q_customers_with_orders, _CUSTOMERS_WITH_ORDERS_SQL),
    "join_anti_customers_without_orders": (q_customers_without_orders, _CUSTOMERS_WITHOUT_ORDERS_SQL),
    "window_top_orders_per_customer": (q_top_orders_per_customer, _TOP_ORDERS_PER_CUSTOMER_SQL),
    "rollup_region_nation": (q_rollup_region_nation, _ROLLUP_SQL),
    "pivot_order_status": (q_pivot_status, _PIVOT_STATUS_SQL),
    "sessionize_events": (q_sessionize_events, _SESSIONIZE_SQL),
    "events_json_extract": (q_events_json, _EVENTS_JSON_SQL),
}
