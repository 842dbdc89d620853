"""Incremental-pipeline operators: MERGE/upsert, gaps-and-islands run
detection, and funnel (ordered event-sequence) analysis. The reference
pipeline is a full-refresh batch (SURVEY.md section 3.1); these are the
operators a user grows into the moment the pipeline turns incremental
or product-analytic.

Scale shapes:

- **merge/upsert** (`merge_upsert_orders`): Delta-style MERGE INTO
  expressed as ONE full-outer equi-join on the key plus a row-action
  CASE -- matched rows take the source value, unmatched-source rows
  insert, unmatched-target rows carry over. A single key shuffle,
  no row-at-a-time driver logic; with a bucketed target (see
  ``sources/bucketed.py``) the target side needs no shuffle at all,
  which is exactly how warehouse MERGE scales to 100 TB snapshots.
- **gaps-and-islands** (`status_run_histogram`): consecutive same-value
  run detection via the two-row_number difference trick (rn_global -
  rn_per_value is constant within a run). Two window passes over the
  SAME partition key ordering -- Spark plans them in one sort+shuffle
  -- then a small histogram agg. No self-join, no range explosion.
- **funnel** (`funnel_view_click_purchase`): staged min-timestamp
  reduction -- first view, first click AFTER that view, first purchase
  AFTER that click. Every stage is a groupBy(user) agg plus an
  equi-join on user_id; all three stages share one shuffle key, so
  AQE co-partitions the chain. No window over the full event stream,
  no cross-stage pair blow-up; per-user state is one timestamp.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]


# ---------------------------------------------------------------------------
# MERGE / upsert. The testdata has no change feed, so the change-set is
# DERIVED deterministically from the snapshot itself: every 5th order
# key arrives as an update (price doubled), every 7th as a brand-new
# order (key shifted past the key space). Doubling a float is exact in
# IEEE 754, so no decimal plumbing is needed for parity.
# ---------------------------------------------------------------------------

_INSERT_KEY_SHIFT = 100_000_000

MERGE_UPSERT_SQL = f"""
  WITH source AS (
    SELECT o_orderkey AS k, o_totalprice * 2 AS price
    FROM orders WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT o_orderkey + {_INSERT_KEY_SHIFT} AS k, o_totalprice AS price
    FROM orders WHERE o_orderkey % 7 = 0
  ),
  target AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders)
  SELECT COALESCE(t.k, s.k) AS o_orderkey,
         COALESCE(s.price, t.price) AS o_totalprice,
         CASE WHEN t.k IS NULL THEN 'insert'
              WHEN s.k IS NULL THEN 'keep'
              ELSE 'update' END AS action
  FROM target t FULL OUTER JOIN source s ON t.k = s.k
  ORDER BY o_orderkey
"""


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    target = orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("price")
    )
    source = (
        target.filter(F.col("k") % 5 == 0)
        .select("k", (F.col("price") * 2).alias("price"))
        .unionByName(
            target.filter(F.col("k") % 7 == 0).select(
                (F.col("k") + _INSERT_KEY_SHIFT).alias("k"), "price"
            )
        )
    )
    t = target.alias("t")
    s = source.alias("s")
    return (
        t.join(s, F.col("t.k") == F.col("s.k"), "full_outer")
        .select(
            F.coalesce("t.k", "s.k").alias("o_orderkey"),
            F.coalesce("s.price", "t.price").alias("o_totalprice"),
            F.when(F.col("t.k").isNull(), "insert")
            .when(F.col("s.k").isNull(), "keep")
            .otherwise("update")
            .alias("action"),
        )
    )


# ---------------------------------------------------------------------------
# Gaps and islands: per customer, runs of consecutive orders with the
# same status (ordered by date then key). Output is the run-length
# histogram per status -- small, stable, and it pins every island
# boundary (any off-by-one shifts some run length).
# ---------------------------------------------------------------------------

STATUS_RUNS_SQL = """
  WITH seq AS (
    SELECT o_custkey, o_orderstatus,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate NULLS FIRST,
                                       o_orderkey NULLS FIRST)
           - row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                                ORDER BY o_orderdate NULLS FIRST,
                                         o_orderkey NULLS FIRST) AS grp
    FROM orders
  ),
  islands AS (
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS run_len
    FROM seq GROUP BY o_custkey, o_orderstatus, grp
  )
  SELECT o_orderstatus, run_len, CAST(COUNT(*) AS BIGINT) AS n_runs
  FROM islands GROUP BY o_orderstatus, run_len
  ORDER BY o_orderstatus, run_len
"""


def q_status_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w_all = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_val = Window.partitionBy("o_custkey", "o_orderstatus").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        "o_custkey",
        "o_orderstatus",
        (F.row_number().over(w_all) - F.row_number().over(w_val)).alias("grp"),
    )
    islands = seq.groupBy("o_custkey", "o_orderstatus", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        islands.groupBy("o_orderstatus", "run_len")
        .agg(F.count(F.lit(1)).alias("n_runs"))
    )


# ---------------------------------------------------------------------------
# Funnel: users who viewed, then clicked strictly after their first
# view, then purchased strictly after that first qualifying click.
# ---------------------------------------------------------------------------

FUNNEL_SQL = """
  WITH v AS (
    SELECT user_id, MIN(ts) AS vts FROM events
    WHERE event_type = 'view' GROUP BY user_id
  ),
  c AS (
    SELECT e.user_id, MIN(e.ts) AS cts
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.vts
    GROUP BY e.user_id
  ),
  p AS (
    SELECT e.user_id, MIN(e.ts) AS pts
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.cts
    GROUP BY e.user_id
  )
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view_users,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click_users,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase_users
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("cts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view_users"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_users")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_users")))
    )


INCREMENTAL_QUERIES: dict[str, tuple[SparkQuery, str | None]] = {
    "merge_upsert_orders": (q_merge_upsert, MERGE_UPSERT_SQL),
    "status_run_histogram": (q_status_runs, STATUS_RUNS_SQL),
    "funnel_view_click_purchase": (q_funnel, FUNNEL_SQL),
}
