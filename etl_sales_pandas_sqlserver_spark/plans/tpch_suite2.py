"""Second batch of TPC-H-pattern analytics: Q7/Q8/Q10/Q13/Q15/Q17/Q18/
Q19/Q21/Q22 analogs adapted to the testdata star schema (no partsupp,
no commitdate/receiptdate/shipmode/phone -- substitutions documented per
query). Together with plans/tpch_more.py and plans/analytics_queries.py
this covers every TPC-H query expressible on the available columns
(Q2/Q9/Q11/Q16/Q20 need partsupp and are intentionally out of scope).

Shared cross-engine determinism rules (see plans/testdata_queries.py):
money sums accumulate in DECIMAL(18,2)/(18,4) and cast back to DOUBLE;
averages are one double division on identical operands; every computed
column is aliased identically (lowercase) on the Spark and DuckDB side.

Scale rationale is noted per query -- the common themes: dimensions
broadcast, fact-to-fact joins stay hint-free for AQE, EXISTS/NOT EXISTS
become left-semi/left-anti joins that never widen the probe side, and
correlated scalar subqueries become a pre-aggregated join (one extra
shuffle on the correlation key instead of a per-row subquery).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dates import epoch_us
from ..sources.testdata import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]


def _dec2(c):
    return (c if not isinstance(c, str) else F.col(c)).cast("decimal(18,2)")


def _volume():
    """l_extendedprice * (1 - l_discount) accumulated exactly."""
    return _dec2("l_extendedprice") * (1 - _dec2("l_discount"))


def _ntz(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# Q7 analog: volume shipped between two nations (supplier nation <->
# customer nation, both directions) by ship year. Plan: nation (25
# rows) broadcasts twice; supplier (100s) broadcasts; the lineitem ->
# orders -> customer chain is the only shuffle path and AQE picks the
# strategy. The nation-pair predicate applies as a residual AFTER the
# supplier/customer broadcasts so lineitem is filtered before the
# orders join (ship-year window pushes into the parquet scan).
# ---------------------------------------------------------------------------

TPCH_Q7_SQL = """
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l.l_shipdate) AS l_year,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2, 3
  ORDER BY 1, 2, 3
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1998-01-01 00:00:00"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(_volume()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 analog: market share of NATION_3 suppliers within ASIA
# customers, for ECONOMY parts, by order year. share = national
# volume / total volume, both DECIMAL-accumulated then ONE double
# division. Plan: part filter broadcasts (small after `ECONOMY`
# pruning at this SF; at 100 TB the p_type filter still pushes into
# the part scan and AQE re-plans the join side), region->nation->
# customer collapses to a broadcast chain.
# ---------------------------------------------------------------------------

TPCH_Q8_SQL = """
  SELECT o_year,
         CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
  FROM (
    SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
           n2.n_name AS supp_nation
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
  ) allv
  GROUP BY o_year
  ORDER BY o_year
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_reg") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = _volume()
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(nat_vol).cast("double") / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q10 analog: top 20 customers by returned-line revenue in a quarter.
# Ties broken by c_custkey so the LIMIT set is deterministic on both
# engines. Plan: date filter pushes into the orders scan, returnflag
# filter into lineitem; nation broadcasts; the revenue-ranked top-20
# compiles to TakeOrderedAndProject (no global sort materialization).
# ---------------------------------------------------------------------------

TPCH_Q10_SQL = """
  SELECT c.c_custkey AS custkey, c.c_name AS cust_name,
         n.n_name AS nation_name,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue,
         CAST(c.c_acctbal AS DOUBLE) AS acctbal
  FROM customer c
  JOIN orders o   ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n   ON n.n_nationkey = c.c_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    AND l.l_returnflag = 'R'
  GROUP BY 1, 2, 3, 5
  ORDER BY revenue DESC, custkey
  LIMIT 20
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ntz("1996-04-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    j = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        j.groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation_name"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
        )
        .agg(F.sum(_volume()).cast("double").alias("revenue"))
        .select("custkey", "cust_name", "nation_name", "revenue", "acctbal")
        .orderBy(F.col("revenue").desc(), "custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q13 analog: distribution of per-customer order counts, excluding
# URGENT orders (stands in for TPC-H's o_comment NOT LIKE filter).
# Plan: LEFT OUTER join with the filter applied to the orders side
# BEFORE the join (never as a post-join WHERE, which would turn the
# outer join inner); two cascaded aggs, the second one tiny.
# ---------------------------------------------------------------------------

TPCH_Q13_SQL = """
  SELECT c_count, COUNT(*) AS custdist
  FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
  ) counts
  GROUP BY c_count
  ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    counts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q15 analog: the supplier(s) achieving the maximum 3-month revenue.
# The scalar MAX is DECIMAL (exact), so `revenue = max_revenue` is an
# exact equality on both engines -- no float-compare hazard. Plan: one
# agg shuffle on l_suppkey (100s of suppliers -> tiny), the max joins
# back as a broadcast scalar; supplier broadcasts.
# ---------------------------------------------------------------------------

TPCH_Q15_SQL = """
  WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
  )
  SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name,
         CAST(r.total_revenue AS DOUBLE) AS total_revenue
  FROM supplier s
  JOIN revenue r ON s.s_suppkey = r.supplier_no
  WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
  ORDER BY suppkey
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1996-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_volume()).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(
            F.broadcast(top),
            revenue.total_revenue == F.col("max_revenue"),
        )
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q17 analog: revenue impact of small-quantity orders -- lines of
# Brand#23 parts with quantity below 0.2x that part's average
# quantity. The correlated scalar subquery becomes a pre-aggregated
# per-part average joined back (one shuffle on l_partkey, the
# correlation key); the avg follows the SUM(decimal)/COUNT rule so the
# 0.2x threshold is bit-identical on both engines. Plan: the brand
# filter broadcasts part; the per-part avg aggregates the UNFILTERED
# lineitem (semantics) but only Brand#23 partkeys survive the join.
# ---------------------------------------------------------------------------

TPCH_Q17_SQL = """
  SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / 7.0 AS avg_yearly
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN (
    SELECT l_partkey,
           CAST(0.2 AS DOUBLE)
             * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*)) AS qty_threshold
    FROM lineitem
    GROUP BY l_partkey
  ) t ON t.l_partkey = l.l_partkey
  WHERE p.p_brand = 'Brand#23' AND l.l_quantity < t.qty_threshold
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            0.2
            * (
                F.sum(_dec2("l_quantity")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_threshold")
    )
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return j.agg(
        (F.sum(_dec2("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        )
    )


# ---------------------------------------------------------------------------
# Q18 analog: large-volume customers -- orders whose total quantity
# exceeds 250 (p99 of the per-order quantity distribution). Plan: the
# HAVING subquery is ONE agg shuffle on l_orderkey producing a tiny
# key set that left-semi-joins (broadcast) back into orders; quantity
# sums are DECIMAL. Top-100 by totalprice with orderkey tiebreak ->
# TakeOrderedAndProject.
# ---------------------------------------------------------------------------

TPCH_Q18_SQL = """
  SELECT c.c_custkey AS custkey, c.c_name AS cust_name,
         o.o_orderkey AS orderkey,
         epoch_us(o.o_orderdate) AS orderdate_us,
         CAST(o.o_totalprice AS DOUBLE) AS totalprice,
         CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM customer c
  JOIN orders o   ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
  )
  GROUP BY 1, 2, 3, 4, 5
  ORDER BY totalprice DESC, orderkey
  LIMIT 100
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec2("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(250).cast("decimal(18,2)"))
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = (
        # big scales linearly with orders -- no forced broadcast; the
        # semi-join shuffles on orderkey at scale.
        orders.join(
            big,
            orders.o_orderkey == F.col("big_orderkey"),
            "left_semi",
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
    )
    return (
        j.groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("o_orderkey").alias("orderkey"),
            # type-aware epoch (operators.dates.epoch_us): a plain
            # cast("timestamp") shifts NTZ inputs by the session-tz
            # offset on non-UTC hosts
            epoch_us(orders, "o_orderdate").alias("orderdate_us"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
        .agg(F.sum(_dec2("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.col("totalprice").desc(), "orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 analog: discounted revenue under an OR-of-ANDs predicate over
# brand x size x quantity windows. Plan: one broadcast join on
# l_partkey with the disjunction as the join residual; the shared
# bounds (p_size >= 1, l_quantity >= 1) push into the scans, the OR
# evaluates inside whole-stage codegen -- no UNION of three scans.
# ---------------------------------------------------------------------------

TPCH_Q19_SQL = """
  SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
         AND l.l_quantity BETWEEN 1 AND 11)
     OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
         AND l.l_quantity BETWEEN 10 AND 20)
     OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
         AND l.l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    qty = F.col("l_quantity")
    size = F.col("p_size")
    brand = F.col("p_brand")
    pred = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#34") & size.between(1, 15) & qty.between(20, 30))
    )
    return j.filter(pred).agg(F.sum(_volume()).cast("double").alias("revenue"))


# ---------------------------------------------------------------------------
# Q21 analog: suppliers that were the ONLY late supplier on a
# finished multi-supplier order ("late" = l_shipdate > o_orderdate +
# 30 days, the repo-wide stand-in for commit/receipt lateness, cf.
# tpch_more.py Q4/Q12). EXISTS -> left-semi on (orderkey, other
# suppkey residual); NOT EXISTS -> left-anti on the late subset. Both
# probe sides are the already-filtered l1 (F-status, late), so the
# heavy lineitem table is shuffled once per semi/anti on l_orderkey --
# no row widening, no cartesian risk.
# ---------------------------------------------------------------------------

TPCH_Q21_SQL = """
  WITH l_late AS (
    SELECT l.l_orderkey, l.l_suppkey
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  ),
  l1 AS (
    SELECT ll.l_orderkey, ll.l_suppkey
    FROM l_late ll JOIN orders o ON o.o_orderkey = ll.l_orderkey
    WHERE o.o_orderstatus = 'F'
  )
  SELECT s.s_name AS supp_name, COUNT(*) AS numwait
  FROM l1
  JOIN supplier s ON s.s_suppkey = l1.l_suppkey
  WHERE EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM l_late l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
    )
  GROUP BY 1
  ORDER BY numwait DESC, supp_name
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .select("l_orderkey", "l_suppkey", "o_orderstatus")
    )
    l1 = late.filter(F.col("o_orderstatus") == "F").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = late.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    )
    with_other = l1.join(
        l2,
        (l1.l_orderkey == l2.l2_orderkey)
        & (l1.l_suppkey != l2.l2_suppkey),
        "left_semi",
    )
    only_late = with_other.join(
        l3,
        (with_other.l_orderkey == l3.l3_orderkey)
        & (with_other.l_suppkey != l3.l3_suppkey),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        only_late.join(supp, only_late.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22 analog: "global sales opportunity" -- customers with
# above-average positive account balance and no URGENT orders (the
# no-orders-at-all form of TPC-H is vacuous on this testdata where
# every customer has orders), grouped by a synthetic country code
# (c_nationkey % 10 stands in for the phone prefix). The scalar AVG
# broadcast-compares; the NOT EXISTS is a left-anti join on the
# filtered orders side. avg follows SUM(decimal)/COUNT.
# ---------------------------------------------------------------------------

TPCH_Q22_SQL = """
  WITH avg_bal AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS a
    FROM customer WHERE c_acctbal > 0.0
  )
  SELECT CAST(c.c_nationkey % 10 AS INTEGER) AS cntrycode,
         COUNT(*) AS numcust,
         CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           AS totacctbal
  FROM customer c, avg_bal
  WHERE c.c_acctbal > avg_bal.a
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
  GROUP BY 1
  ORDER BY 1
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(_dec2("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("a")
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("a")
    )
    no_urgent = rich.join(
        urgent, rich.c_custkey == urgent.o_custkey, "left_anti"
    )
    return (
        no_urgent.groupBy(
            (F.col("c_nationkey") % 10).cast("int").alias("cntrycode")
        )
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec2("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


TPCH_SUITE2_QUERIES: dict[str, tuple[SparkQuery, str | None]] = {
    "tpch_q7_nation_volume": (q_tpch_q7, TPCH_Q7_SQL),
    "tpch_q8_market_share": (q_tpch_q8, TPCH_Q8_SQL),
    "tpch_q10_returned_items": (q_tpch_q10, TPCH_Q10_SQL),
    "tpch_q13_order_count_dist": (q_tpch_q13, TPCH_Q13_SQL),
    "tpch_q15_top_supplier": (q_tpch_q15, TPCH_Q15_SQL),
    "tpch_q17_small_qty_revenue": (q_tpch_q17, TPCH_Q17_SQL),
    "tpch_q18_large_volume_customers": (q_tpch_q18, TPCH_Q18_SQL),
    "tpch_q19_disjunctive_revenue": (q_tpch_q19, TPCH_Q19_SQL),
    "tpch_q21_waiting_supplier": (q_tpch_q21, TPCH_Q21_SQL),
    "tpch_q22_sales_opportunity": (q_tpch_q22, TPCH_Q22_SQL),
}
