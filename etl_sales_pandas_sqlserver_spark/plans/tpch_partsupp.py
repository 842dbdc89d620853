"""TPC-H queries that need ``partsupp``: Q2 (min-cost supplier), Q9
(product-type profit), Q11 (important stock), Q16 (supplier count by
part attributes), Q20 (excess-stock suppliers) -- previously the only
reference-shaped TPC-H gap (SURVEY.md section 2.8), closed by the
deterministic derived frame ``sources/testdata.synth_partsupp`` whose
DuckDB twin is ``PARTSUPP_CTE`` below (same integer arithmetic over the
same base views, so every query here is fully hash-verifiable).

Predicates are adapted to the testdata's actual domains (part names
like 'old anvil' / 'hot bolt', nations 'NATION_0'..'NATION_24',
suppliers carry no comment column -- Q16's complaints exclusion becomes
a negative-acctbal exclusion, documented per query).

Shared numeric rules follow the other TPC-H modules: money accumulates
in DECIMAL(18,2) products and casts to DOUBLE once at the end;
``ps_supplycost``/``ps_availqty`` are BIGINT so Q11's value threshold
can be an EXACT integer cross-multiplication instead of a float
division. Scale notes per query; no broadcast hints on fact-sized
sides -- nation/region (25/5 rows) are hinted, everything else is left
to AQE so the same plan holds when partsupp is 4x a 100 TB part table.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table, synth_partsupp

SparkQuery = Callable[[SparkSession, str], DataFrame]


def _dec(c: str):
    return F.col(c).cast("decimal(18,2)")


#: DuckDB replay of sources/testdata.synth_partsupp -- keep the two in
#: lockstep (tests/test_oracle_parity.py pins frame equality).
PARTSUPP_CTE = """partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           (ps_partkey * 7 + ps_suppkey * 3) % 9999 + 1 AS ps_availqty,
           (ps_partkey * 419 + ps_suppkey * 263) % 999 + 1 AS ps_supplycost
    FROM (
      SELECT p.p_partkey AS ps_partkey,
             (p.p_partkey + p.p_partkey // s.cnt + i.i * (s.cnt // 4))
               % s.cnt AS ps_suppkey
      FROM part p
      CROSS JOIN (VALUES (0), (1), (2), (3)) i(i)
      CROSS JOIN (SELECT COUNT(*) AS cnt FROM supplier) s
    )
  )"""


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and order year. Profit per line =
# discounted revenue minus supply cost; parts filtered by name token.
# Plan: the part-name filter and the partsupp equi-join on
# (partkey, suppkey) reduce lineitem BEFORE the orders join (the only
# unavoidable fact-fact shuffle); supplier->nation resolves the
# grouping key with a broadcast at any scale.
# ---------------------------------------------------------------------------

TPCH_Q9_SQL = f"""
  WITH {PARTSUPP_CTE}
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                  - CAST(ps.ps_supplycost AS DECIMAL(18,2))
                    * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_profit
  FROM lineitem l
  JOIN part p      ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%bolt%'
  JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                  AND ps.ps_suppkey = l.l_suppkey
  JOIN orders o    ON o.o_orderkey = l.l_orderkey
  JOIN supplier s  ON s.s_suppkey = l.l_suppkey
  JOIN nation n    ON n.n_nationkey = s.s_nationkey
  GROUP BY 1, 2
  ORDER BY 1, 2 DESC
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    ps = synth_partsupp(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    profit = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) - _dec(
        "ps_supplycost"
    ) * _dec("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier per part, within one region, for a
# part-attribute slice. Plan: the per-part minimum over the
# region-local partsupp is a groupBy + equi-join back (NOT a window --
# the min is per part across suppliers, so the re-join is against an
# aggregate a fraction of partsupp's size, and at scale both sides
# shuffle once on ps_partkey). The oracle spells the same thing as a
# correlated subquery, DuckDB's idiomatic form.
# ---------------------------------------------------------------------------

TPCH_Q2_SQL = f"""
  WITH {PARTSUPP_CTE},
  regional AS (
    SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
           s.s_name, s.s_acctbal, n.n_name
    FROM partsupp ps
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
  )
  SELECT CAST(r.s_acctbal AS DOUBLE) AS s_acctbal,
         r.s_name AS s_name, r.n_name AS n_name,
         p.p_partkey AS p_partkey,
         CAST(r.ps_supplycost AS BIGINT) AS ps_supplycost
  FROM part p
  JOIN regional r ON r.ps_partkey = p.p_partkey
  WHERE p.p_type = 'STANDARD' AND p.p_size <= 15
    AND r.ps_supplycost = (
      SELECT MIN(r2.ps_supplycost) FROM regional r2
      WHERE r2.ps_partkey = p.p_partkey
    )
  ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = synth_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15))
        .select("p_partkey")
    )
    regional = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("ps_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    min_cost = regional.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        regional.join(part, regional.ps_partkey == part.p_partkey)
        .join(
            min_cost,
            ["ps_partkey"],
        )
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("p_partkey").alias("p_partkey"),
            F.col("ps_supplycost").cast("bigint").alias("ps_supplycost"),
        )
    )


# ---------------------------------------------------------------------------
# Q11: important stock -- parts whose inventory value (supplycost *
# availqty, EXACT BIGINT) from suppliers in a nation group exceeds
# 1/1000 of that group's total. The threshold compare is an integer
# cross-multiplication (1000 * value > total), so the oracle matches
# bit-for-bit with no float division anywhere. Plan: one groupBy on
# ps_partkey + a broadcast single-row total; the supplier filter is a
# broadcast semi-join.
# ---------------------------------------------------------------------------

TPCH_Q11_SQL = f"""
  WITH {PARTSUPP_CTE},
  grp AS (
    SELECT ps.ps_partkey,
           SUM(ps.ps_supplycost * ps.ps_availqty) AS value
    FROM partsupp ps
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
                   AND n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    GROUP BY 1
  )
  SELECT ps_partkey, CAST(value AS BIGINT) AS value
  FROM grp
  WHERE 1000 * value > (SELECT SUM(value) FROM grp)
  ORDER BY value DESC, ps_partkey
"""

_Q11_NATIONS = ("NATION_1", "NATION_2", "NATION_3")


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = synth_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*_Q11_NATIONS)
    )
    grp = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost") * F.col("ps_availqty")).alias("value")
        )
    )
    total = grp.agg(F.sum("value").alias("total"))
    return (
        grp.crossJoin(F.broadcast(total))
        .filter(F.lit(1000) * F.col("value") > F.col("total"))
        .select("ps_partkey", F.col("value").cast("bigint").alias("value"))
    )


# ---------------------------------------------------------------------------
# Q16: how many distinct suppliers can serve each (brand, type, size)
# slice, excluding a brand/type and excluding flagged suppliers. The
# testdata's supplier has no comment column, so TPC-H's
# 'customer complaints' exclusion becomes s_acctbal < 0 (the 6 indebted
# suppliers) -- same anti-join shape. Plan: partsupp joins the filtered
# part on partkey (one shuffle), the exclusion is a broadcast anti-join,
# count_distinct(ps_suppkey) is a two-level partial agg.
# ---------------------------------------------------------------------------

TPCH_Q16_SQL = f"""
  WITH {PARTSUPP_CTE}
  SELECT p.p_brand AS brand, p.p_type AS type,
         CAST(p.p_size AS BIGINT) AS size,
         COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
  FROM partsupp ps
  JOIN part p ON p.p_partkey = ps.ps_partkey
  WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
    AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
    AND ps.ps_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
  GROUP BY 1, 2, 3
  ORDER BY supplier_cnt DESC, brand, type, size
"""

_Q16_SIZES = (1, 4, 7, 10, 13, 16, 19, 22)


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = synth_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*_Q16_SIZES)
    )
    flagged = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("ps_suppkey"))
    return (
        ps.join(part, ps.ps_partkey == part.p_partkey)
        # flagged scales with the supplier count -- size-based planning,
        # no forced broadcast hint
        .join(flagged, ["ps_suppkey"], "left_anti")
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").cast("bigint").alias("size"),
        )
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20: suppliers in one nation holding excess stock of a part family --
# availqty greater than half the quantity they actually shipped of that
# part over one year. Plan: the shipped-quantity aggregate reduces
# lineitem per (partkey, suppkey) BEFORE joining partsupp (both sides
# shuffle once on the pair key; the aggregate side is a fraction of
# lineitem); the part-family and nation filters are broadcast
# semi-joins; the final supplier resolution is a semi-join so each
# supplier prints once.
# ---------------------------------------------------------------------------

TPCH_Q20_SQL = f"""
  WITH {PARTSUPP_CTE},
  shipped AS (
    SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2
  )
  SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
  WHERE s.s_suppkey IN (
    SELECT ps.ps_suppkey
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'old%'
    LEFT JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                        AND sh.l_suppkey = ps.ps_suppkey
    WHERE ps.ps_availqty > 0.5 * COALESCE(sh.qty, 0)
  )
  ORDER BY s_name
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ship_lo = F.lit("1996-01-01 00:00:00").cast(li.schema["l_shipdate"].dataType)
    ship_hi = F.lit("1997-01-01 00:00:00").cast(li.schema["l_shipdate"].dataType)
    shipped = (
        li.filter((F.col("l_shipdate") >= ship_lo) & (F.col("l_shipdate") < ship_hi))
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.sum("l_quantity").alias("qty"))
    )
    ps = synth_partsupp(spark, sf_dir)
    family = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("old%"))
        .select("p_partkey")
    )
    excess = (
        ps.join(family, ps.ps_partkey == family.p_partkey)
        .join(shipped, ["ps_partkey", "ps_suppkey"], "left")
        .filter(
            F.col("ps_availqty")
            > F.lit(0.5) * F.coalesce(F.col("qty"), F.lit(0.0))
        )
        .select("ps_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(
            excess.withColumnRenamed("ps_suppkey", "s_suppkey"),
            ["s_suppkey"],
            "left_semi",
        )
        .select(F.col("s_suppkey").alias("s_suppkey"), F.col("s_name").alias("s_name"))
    )


TPCH_PARTSUPP_QUERIES: dict[str, tuple[SparkQuery, str | None]] = {
    "tpch_q2_min_cost_supplier": (q_tpch_q2, TPCH_Q2_SQL),
    "tpch_q9_product_profit": (q_tpch_q9, TPCH_Q9_SQL),
    "tpch_q11_important_stock": (q_tpch_q11, TPCH_Q11_SQL),
    "tpch_q16_supplier_cnt": (q_tpch_q16, TPCH_Q16_SQL),
    "tpch_q20_excess_stock": (q_tpch_q20, TPCH_Q20_SQL),
}
