"""Temporal operators Spark has no built-in for: as-of join, banded
range self-join, and a hypertable-style multi-granularity time-bucket
rollup — each expressed as a composition of DataFrame ops (SURVEY.md
section 7 phase 6; the reference itself has no temporal operators, see
SURVEY.md section 2.5 note).

Scale shapes:

- **as-of join** (`asof_join_clicks_purchases`): the union-then-window
  form, NOT a range join: tag both sides, union, and carry the right
  side's latest value forward with ``last(ignorenulls) OVER (ROWS
  UNBOUNDED PRECEDING)``. One shuffle on the partition key, zero pair
  blow-up, state bounded by the window frame — this is the shape that
  survives 100 TB, where an inequality join would explode.
- **range join** (`range_join_event_pairs`): banded bucket join — each
  row joins only its own and adjacent time buckets (bucket width =
  the band), so the shuffle key is (user, bucket) and the candidate
  mass is bounded by per-bucket population, never |rows|^2. Every
  qualifying pair is matched exactly once (the probe side explodes to
  3 buckets; the build side keeps its single home bucket).
- **time-bucket rollup** (`time_bucket_rollup`): GROUPING SETS over
  integer epoch-division buckets (hour + day in one pass, one shuffle;
  partial aggregation applies per set). Buckets are epoch integer
  divisions, not date_trunc, so results are timezone-independent on
  both engines.

All event-time outputs are epoch-microsecond longs (timezone-proof);
float sums accumulate in DECIMAL (exact, associative) and cast back.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.finiteness import finite_value_col
from ..operators.dates import epoch_us
from ..sources.testdata import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

_RANGE_BAND_US = 3_600_000_000  # 1 hour
_HOUR_US = 3_600_000_000
_DAY_US = 86_400_000_000


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        # type-aware epoch: TZ-free for both the loader's LTZ read and
        # a bypassing caller's NTZ-inferred read
        epoch_us(ev, "ts").alias("tsu"),
    )


# ---------------------------------------------------------------------------
# 1. As-of join: each click joined to the latest view at-or-before it.
# ---------------------------------------------------------------------------

ASOF_SQL = """
  WITH v AS (
    SELECT user_id, ts, max(value) AS click_value
    FROM events WHERE event_type = 'click' AND ts IS NOT NULL
    GROUP BY 1, 2
  ),
  c AS (
    SELECT event_id, user_id, ts, value AS purchase_value
    FROM events WHERE event_type = 'purchase'
  )
  SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, c.purchase_value,
         v.click_value AS last_click_value, epoch_us(v.ts) AS click_ts_us
  FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
  ORDER BY c.event_id
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each 'purchase' event joined to the latest at-or-before 'click'
    by the same user (DuckDB oracle uses its native ASOF JOIN).

    The right side is first made unique per (user, ts) — max(value) —
    so the as-of pick is deterministic on both engines."""
    ev = _events_us(spark, sf_dir)
    # clock-less clicks are excluded EXPLICITLY on both engines (r14
    # hostile-events fix): DuckDB's ASOF inequality never matches a
    # NULL build-side ts, while Spark's union-then-window form sorted
    # the NULL-ts click NULLS FIRST where its value leaked into every
    # purchase's running last() — an event without a clock cannot
    # participate in an as-of join
    clicks = (
        ev.filter(
            (F.col("event_type") == "click") & F.col("tsu").isNotNull()
        )
        .groupBy("user_id", "tsu")
        .agg(F.max("value").alias("click_value"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "tsu", F.col("value").alias("purchase_value")
    )
    # tag right=0 / left=1: at equal ts the right row sorts first, so the
    # running last() sees it — i.e. `left.ts >= right.ts` semantics
    tagged = clicks.select(
        "user_id",
        "tsu",
        F.lit(0).alias("tag"),
        "click_value",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("purchase_value"),
    ).unionByName(
        purchases.select(
            "user_id",
            "tsu",
            F.lit(1).alias("tag"),
            F.lit(None).cast("double").alias("click_value"),
            "event_id",
            "purchase_value",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tsu", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "last_click_value", F.last("click_value", ignorenulls=True).over(w)
    ).withColumn(
        "click_ts_us",
        F.last(
            F.when(F.col("tag") == 0, F.col("tsu")), ignorenulls=True
        ).over(w),
    )
    return (
        carried.filter(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("tsu").alias("ts_us"),
            "purchase_value",
            "last_click_value",
            "click_ts_us",
        )
    )


# ---------------------------------------------------------------------------
# 1b. As-of join with tolerance (pandas merge_asof(tolerance=...)
# semantics): a match older than the staleness bound is dropped back to
# NULL. Same union-then-window shape -- the tolerance is a post-filter
# on the carried timestamp, so the scale story is unchanged (one
# shuffle, no pair blow-up, no extra pass).
# ---------------------------------------------------------------------------

_ASOF_TOLERANCE_US = 1_800_000_000  # 30 minutes

ASOF_TOLERANCE_SQL = f"""
  WITH v AS (
    SELECT user_id, ts, max(value) AS click_value
    FROM events WHERE event_type = 'click'
    GROUP BY 1, 2
  ),
  c AS (
    SELECT event_id, user_id, ts, value AS purchase_value
    FROM events WHERE event_type = 'purchase'
  ),
  m AS (
    SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, c.purchase_value,
           v.click_value, epoch_us(v.ts) AS click_ts_us
    FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
  )
  SELECT event_id, user_id, ts_us, purchase_value,
         CASE WHEN ts_us - click_ts_us <= {_ASOF_TOLERANCE_US}
              THEN click_value END AS last_click_value,
         CASE WHEN ts_us - click_ts_us <= {_ASOF_TOLERANCE_US}
              THEN click_ts_us END AS click_ts_us
  FROM m
  ORDER BY event_id
"""


def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join bounded by a 30-minute staleness tolerance: a carried
    click older than the bound reverts to NULL (no-match), matching
    pandas ``merge_asof(tolerance=...)``."""
    base = q_asof_join(spark, sf_dir)
    fresh = (F.col("ts_us") - F.col("click_ts_us")) <= _ASOF_TOLERANCE_US
    return base.select(
        "event_id",
        "user_id",
        "ts_us",
        "purchase_value",
        F.when(fresh, F.col("last_click_value")).alias("last_click_value"),
        F.when(fresh, F.col("click_ts_us")).alias("click_ts_us"),
    )


# ---------------------------------------------------------------------------
# 2. Banded range self-join: same-user event pairs within +/- 1 hour.
# ---------------------------------------------------------------------------

RANGE_JOIN_SQL = f"""
  SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
         epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
  FROM events a JOIN events b
    ON a.user_id = b.user_id
   AND a.event_id < b.event_id
   AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {_RANGE_BAND_US}
  ORDER BY a_id, b_id
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All same-user event pairs within the band. The oracle spells the
    naive inequality join; the engine spells the banded bucket join
    that scales (shuffle on (user, bucket), 3x probe replication)."""
    ev = _events_us(spark, sf_dir).select("event_id", "user_id", "tsu")
    b = ev.withColumn("bucket", F.expr(f"tsu div {_RANGE_BAND_US}"))
    probe = b.select(
        F.col("event_id").alias("a_id"),
        "user_id",
        F.col("tsu").alias("a_tsu"),
        F.explode(
            F.array(
                F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1
            )
        ).alias("probe"),
    )
    build = b.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("tsu").alias("b_tsu"),
        "bucket",
    )
    return (
        probe.join(
            build,
            (probe.user_id == build.b_user)
            & (probe.probe == build.bucket)
            & (probe.a_id < build.b_id),
        )
        .filter(F.abs(F.col("a_tsu") - F.col("b_tsu")) <= _RANGE_BAND_US)
        .select(
            "a_id",
            "b_id",
            "user_id",
            (F.col("b_tsu") - F.col("a_tsu")).alias("dt_us"),
        )
    )


# ---------------------------------------------------------------------------
# 3. Hypertable-style rollup: hour + day buckets in one GROUPING SETS pass.
# ---------------------------------------------------------------------------

TIME_BUCKET_SQL = f"""
  WITH e AS (
    SELECT event_type,
           epoch_us(ts) // {_HOUR_US} AS hour_bucket,
           epoch_us(ts) // {_DAY_US} AS day_bucket,
           value
    FROM events
  )
  SELECT CASE WHEN GROUPING(hour_bucket) = 1 THEN 'day' ELSE 'hour' END AS granularity,
         COALESCE(hour_bucket, day_bucket) AS bucket,
         event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
  FROM e
  GROUP BY GROUPING SETS ((hour_bucket, event_type), (day_bucket, event_type))
  ORDER BY granularity, bucket, event_type
"""


def q_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "events")
    ev = raw.withColumn("_epoch_us", epoch_us(raw, "ts"))
    e = ev.select(
        "event_type",
        F.expr(f"_epoch_us div {_HOUR_US}").alias("hour_bucket"),
        F.expr(f"_epoch_us div {_DAY_US}").alias("day_bucket"),
        "value",
    )
    grouped = e.groupingSets(
        [["hour_bucket", "event_type"], ["day_bucket", "event_type"]],
        "hour_bucket",
        "day_bucket",
        "event_type",
    )
    # grouping() is only resolvable inside the grouped aggregate list
    return (
        grouped.agg(
            F.grouping("hour_bucket").alias("g_hour"),
            F.count(F.lit(1)).alias("n_events"),
            # finiteness-guarded (r16): NaN/inf raises on BOTH engines
            # instead of Spark's ANSI cast silently nulling it out of
            # the sum while the oracle raises (functions/finiteness.py)
            F.sum(finite_value_col().cast("decimal(28,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.when(F.col("g_hour") == 1, F.lit("day"))
            .otherwise(F.lit("hour"))
            .alias("granularity"),
            F.coalesce("hour_bucket", "day_bucket").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension versioning. The testdata has no change feed, so
# the updates are DERIVED deterministically: each customer's first 3
# orders act as segment-change events (the new segment value keyed off
# the order priority). Version intervals come from lead() over the
# per-key change sequence -- one window shuffle on the dimension key,
# the canonical SCD2 build. valid_from/valid_to are epoch micros with
# +/- infinity spelled as LONG sentinels (portable; no timestamp
# arithmetic).
# ---------------------------------------------------------------------------

_TS_MAX = 9_223_372_036_854_775_807  # open-ended validity sentinel

_PRIORITY_SEGMENT = """
  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'PRIORITY'
       WHEN o_orderpriority = '5-LOW' THEN 'LOW_TOUCH'
       ELSE 'STANDARD' END
"""

SCD2_SQL = f"""
  WITH changes AS (
    SELECT * FROM (
      SELECT o_custkey AS custkey,
             epoch_us(o_orderdate) AS change_us,
             {_PRIORITY_SEGMENT} AS segment,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate NULLS FIRST,
                                         o_orderkey NULLS FIRST) AS rn
      FROM orders
    ) WHERE rn <= 3
  ),
  base AS (
    SELECT c_custkey AS custkey, 0 AS rn, c_mktsegment AS segment,
           CAST(0 AS BIGINT) AS change_us
    FROM customer
  ),
  versions AS (
    SELECT custkey, rn, segment, change_us AS valid_from_us,
           coalesce(lead(change_us) OVER (PARTITION BY custkey ORDER BY rn),
                    {_TS_MAX}) AS valid_to_us
    FROM (SELECT custkey, rn, segment, change_us FROM base
          UNION ALL
          SELECT custkey, rn, segment, change_us FROM changes)
  )
  SELECT custkey, rn AS version, segment, valid_from_us, valid_to_us
  FROM versions
  ORDER BY custkey, version
"""


def _scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            # NOT cast("timestamp"): o_orderdate is NTZ under a vanilla
            # session and the cast would shift epoch outputs by the
            # session-timezone offset (TZ=America/New_York oracle run
            # caught exactly this)
            epoch_us(orders, "o_orderdate").alias("change_us"),
            F.expr(_PRIORITY_SEGMENT).alias("segment"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )
    base = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.lit(0).alias("rn"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(0).cast("long").alias("change_us"),
    )
    stacked = base.unionByName(changes)
    wv = Window.partitionBy("custkey").orderBy("rn")
    return stacked.select(
        "custkey",
        F.col("rn").alias("version"),
        "segment",
        F.col("change_us").alias("valid_from_us"),
        F.coalesce(
            F.lead("change_us").over(wv), F.lit(_TS_MAX).cast("long")
        ).alias("valid_to_us"),
    )


def q_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scd2_versions(spark, sf_dir)


# ---------------------------------------------------------------------------
# Temporal dimension join: each order joins the dim version valid AT
# ITS ORDER TIME ([valid_from, valid_to) interval). Equi-join on
# custkey carries the shuffle; the interval predicate is a residual
# over the handful of versions per key -- bounded fan-in, no range
# explosion. A boundary-time order (change_us == o_orderdate of the
# change's own order) matches the NEW version (from-inclusive). Output
# is the per-segment order rollup (small), proving every order matched
# exactly one version.
# ---------------------------------------------------------------------------

TEMPORAL_DIM_JOIN_SQL = f"""
  WITH versions AS ({SCD2_SQL.replace("ORDER BY custkey, version", "")})
  SELECT v.segment AS segment_at_order, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue
  FROM orders o
  JOIN versions v
    ON v.custkey = o.o_custkey
   AND epoch_us(o.o_orderdate) >= v.valid_from_us
   AND epoch_us(o.o_orderdate) <  v.valid_to_us
  GROUP BY 1
  ORDER BY 1
"""


def q_temporal_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    versions = _scd2_versions(spark, sf_dir)
    ots = epoch_us(orders, "o_orderdate")
    j = orders.join(
        versions,
        (orders.o_custkey == versions.custkey)
        & (ots >= versions.valid_from_us)
        & (ots < versions.valid_to_us),
    )
    return (
        j.groupBy(F.col("segment").alias("segment_at_order"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# 7. Time-series gap filling (resample-to-grid): hourly sums per event
# type with EVERY hour of the type's own [min, max] span present --
# missing hours emitted as explicit zero rows flagged gap_filled. The
# dense grid is a per-type sequence()/explode bounded by the span (one
# row per hour, never data-sized fan-out), left-joined to the sparse
# aggregate on (type, hour). Money stays DECIMAL until one final cast;
# the fill literal is integer zero, so both engines agree bitwise.
# ---------------------------------------------------------------------------

GAPFILL_SQL = f"""
  WITH agg AS (
    SELECT event_type,
           epoch_us(ts) // {_HOUR_US} AS hour_bucket,
           COUNT(*) AS n_events,
           SUM(CAST(value AS DECIMAL(28,6))) AS sum_value
    FROM events GROUP BY 1, 2
  ),
  spans AS (
    SELECT event_type, MIN(hour_bucket) AS lo, MAX(hour_bucket) AS hi
    FROM agg GROUP BY 1
  ),
  grid AS (
    SELECT event_type, UNNEST(range(lo, hi + 1)) AS hour_bucket FROM spans
  )
  SELECT g.event_type,
         CAST(g.hour_bucket AS BIGINT) AS hour_bucket,
         CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
         CAST(COALESCE(a.sum_value, 0) AS DOUBLE) AS total_value,
         a.n_events IS NULL AS gap_filled
  FROM grid g
  LEFT JOIN agg a ON a.event_type = g.event_type
                 AND a.hour_bucket = g.hour_bucket
  ORDER BY 1, 2
"""


def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "events")
    ev = raw.withColumn("_eu", epoch_us(raw, "ts")).select(
        "event_type",
        F.expr(f"_eu div {_HOUR_US}").alias("hour_bucket"),
        "value",
    )
    agg = ev.groupBy("event_type", "hour_bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        # finiteness-guarded (r16): see functions/finiteness.py
        F.sum(finite_value_col().cast("decimal(28,6)")).alias("sum_value"),
    )
    grid = (
        agg.groupBy("event_type")
        .agg(F.min("hour_bucket").alias("lo"), F.max("hour_bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("hour_bucket"),
        )
    )
    return (
        grid.join(agg, ["event_type", "hour_bucket"], "left")
        .select(
            "event_type",
            F.col("hour_bucket").cast("bigint").alias("hour_bucket"),
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(F.col("sum_value"), F.lit(0))
            .cast("double")
            .alias("total_value"),
            F.col("n_events").isNull().alias("gap_filled"),
        )
    )


# ---------------------------------------------------------------------------
# 8. Weekly cohort retention: users grouped by first-activity week,
# counted in each later week they return -- the standard product-
# analytics retention matrix. Pure integer arithmetic end to end
# (epoch-week keys, offsets, distinct-user counts). Scale: two
# aggregates plus one join keyed on user_id; the first-week frame is
# |users|-sized, so at production scale it hash-joins on the same key
# the activity aggregate already shuffled on.
# ---------------------------------------------------------------------------

_WEEK_US = 7 * _DAY_US

COHORT_RETENTION_SQL = f"""
  WITH e AS (
    SELECT user_id, epoch_us(ts) // {_WEEK_US} AS week FROM events
  ),
  firstw AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY 1),
  activity AS (SELECT DISTINCT user_id, week FROM e)
  SELECT CAST(f.cohort_week AS BIGINT) AS cohort_week,
         CAST(a.week - f.cohort_week AS BIGINT) AS week_offset,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM activity a JOIN firstw f ON f.user_id = a.user_id
  GROUP BY 1, 2
  ORDER BY 1, 2
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "events")
    e = raw.withColumn("_eu", epoch_us(raw, "ts")).select(
        "user_id", F.expr(f"_eu div {_WEEK_US}").alias("week")
    )
    firstw = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = e.distinct()
    return (
        activity.join(firstw, "user_id")
        .groupBy(
            F.col("cohort_week").cast("bigint").alias("cohort_week"),
            (F.col("week") - F.col("cohort_week"))
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection: flag events whose value deviates
# more than 2 sigma from the user's trailing 20-event window. The whole
# test is INTEGER arithmetic -- values are scaled to cents once
# (floor(value*100): the double multiply and floor are identical ops on
# both engines), the window keeps exact integer count/sum/sum-of-
# squares, and |v - mean| > 2*std is cross-multiplied into
# (c*v - s)^2 > 4*(c*q - s^2), so no float sum order, no sqrt, no
# division ever touches the hash-compared output. Plan: one shuffle on
# user_id, a single window pass (ROWS frame => O(1) incremental state
# per row), anomalies-only output. Max magnitudes (v<=49k cents, 20-row
# frame) keep every intermediate < 2^41 -- no BIGINT overflow at any
# window width that fits memory.
# ---------------------------------------------------------------------------

ZSCORE_ANOMALY_SQL = """
  WITH x AS (
    SELECT user_id, event_id, ts,
           CAST(floor(value * 100) AS BIGINT) AS v_cents
    FROM events
  ),
  w AS (
    SELECT user_id, event_id, v_cents,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           count(v_cents) OVER win AS c,
           sum(v_cents) OVER win AS s,
           sum(v_cents * v_cents) OVER win AS q
    FROM x
    WINDOW win AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
  )
  SELECT user_id, event_id, ts_us, v_cents, c AS n_window,
         CAST(s AS BIGINT) AS sum_window
  FROM w
  WHERE c >= 10
    AND (c * v_cents - s) * (c * v_cents - s) > 4 * (c * q - s * s)
  ORDER BY user_id, event_id
"""


def q_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "user_id",
        "event_id",
        "ts",
        epoch_us(ev, "ts").alias("ts_us"),
        F.floor(F.col("value") * F.lit(100)).cast("bigint").alias("v_cents"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    w = x.select(
        "user_id",
        "event_id",
        "v_cents",
        "ts_us",
        F.count("v_cents").over(win).alias("c"),
        F.sum("v_cents").over(win).alias("s"),
        F.sum(F.col("v_cents") * F.col("v_cents")).over(win).alias("q"),
    )
    dev = F.col("c") * F.col("v_cents") - F.col("s")
    var4 = F.lit(4) * (
        F.col("c") * F.col("q") - F.col("s") * F.col("s")
    )
    return (
        w.filter((F.col("c") >= 10) & (dev * dev > var4))
        .select(
            "user_id",
            "event_id",
            "ts_us",
            "v_cents",
            F.col("c").alias("n_window"),
            F.col("s").alias("sum_window"),
        )
    )


TEMPORAL_QUERIES: dict[str, tuple[SparkQuery, str | None]] = {
    "window_zscore_anomaly": (q_zscore_anomaly, ZSCORE_ANOMALY_SQL),
    "timeseries_gapfill_hourly": (q_timeseries_gapfill, GAPFILL_SQL),
    "cohort_retention_weekly": (q_cohort_retention, COHORT_RETENTION_SQL),
    "asof_join_clicks_purchases": (q_asof_join, ASOF_SQL),
    "asof_join_tolerance": (q_asof_join_tolerance, ASOF_TOLERANCE_SQL),
    "range_join_event_pairs": (q_range_join, RANGE_JOIN_SQL),
    "time_bucket_rollup": (q_time_bucket_rollup, TIME_BUCKET_SQL),
    "scd2_customer_versions": (q_scd2_versions, SCD2_SQL),
    "temporal_dim_join_segments": (q_temporal_dim_join, TEMPORAL_DIM_JOIN_SQL),
}
