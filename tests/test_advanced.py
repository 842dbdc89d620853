"""Semantics tests for the advanced/temporal operators that the oracle
can't (approx distinct) or only end-to-end (as-of tie rules) checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sales_pandas_sqlserver_spark.plans.advanced_queries import (
    q_approx_distinct,
    q_except,
    q_intersect,
    q_percentiles,
    q_percentiles_approx,
)
from etl_sales_pandas_sqlserver_spark.plans.temporal_queries import (
    _RANGE_BAND_US,
    q_asof_join,
    q_range_join,
)


def test_approx_distinct_error_bound(spark, sf_small):
    """The query emits its error contract as a boolean (so the driver
    can hash-verify it); here we assert the contract actually held."""
    rows = q_approx_distinct(spark, sf_small).collect()
    assert rows, "no event types"
    for r in rows:
        assert r.exact_users > 0
        assert r.est_ok, f"{r.event_type}: estimate outside 2% of exact"


def test_approx_percentiles_track_exact(spark, sf_small):
    """The one-pass sketch percentiles stay within a small relative
    drift of the exact two-pass selection per segment/percentile."""
    exact = {r.mktsegment: r for r in q_percentiles(spark, sf_small).collect()}
    approx = {
        r.mktsegment: r for r in q_percentiles_approx(spark, sf_small).collect()
    }
    assert set(exact) == set(approx) and exact
    for seg in exact:
        for tag in ("p25", "p50", "p90"):
            e, a = exact[seg][tag], approx[seg][tag]
            assert abs(a - e) / max(abs(e), 1.0) < 0.05, (seg, tag, e, a)


def test_asof_matches_naive_window(spark, sf_small):
    """The union-then-window as-of must agree with the quadratic spec:
    per purchase, the click row with max ts <= purchase ts."""
    got = {
        r.event_id: (r.last_click_value, r.click_ts_us)
        for r in q_asof_join(spark, sf_small).collect()
    }
    from etl_sales_pandas_sqlserver_spark.sources.testdata import load_table

    events = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", "event_type", "value", F.unix_micros("ts").alias("tsu")
    )
    clicks = [
        (r.user_id, r.tsu, r.value)
        for r in events.filter(F.col("event_type") == "click").collect()
    ]
    by_user: dict[int, list[tuple[int, float]]] = {}
    for uid, tsu, val in clicks:
        by_user.setdefault(uid, []).append((tsu, val))
    purchases = events.filter(F.col("event_type") == "purchase").collect()
    assert len(got) == len(purchases)
    for p in purchases:
        cands = [(t, v) for t, v in by_user.get(p.user_id, []) if t <= p.tsu]
        if not cands:
            assert got[p.event_id] == (None, None)
            continue
        best_ts = max(t for t, _ in cands)
        best_val = max(v for t, v in cands if t == best_ts)  # max(value) tie rule
        assert got[p.event_id] == (best_val, best_ts), p.event_id


def test_range_join_band_is_exact(spark, sf_small):
    """The banded bucket join must equal the naive quadratic pair scan."""
    from etl_sales_pandas_sqlserver_spark.sources.testdata import load_table

    events = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("tsu")
    )
    rows = events.collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    expected = set()
    for rs in by_user.values():
        for i, a in enumerate(rs):
            for b in rs[i + 1 :]:
                if abs(a.tsu - b.tsu) <= _RANGE_BAND_US:
                    lo, hi = sorted((a.event_id, b.event_id))
                    expected.add((lo, hi))
    got = {(r.a_id, r.b_id) for r in q_range_join(spark, sf_small).collect()}
    assert got == expected


def test_intersect_except_partition_property(spark, sf_small):
    """intersect(O,F) and except(O,F) partition the distinct 'O' keys."""
    both = {r.custkey for r in q_intersect(spark, sf_small).collect()}
    only_o = {r.custkey for r in q_except(spark, sf_small).collect()}
    assert both.isdisjoint(only_o)
    from etl_sales_pandas_sqlserver_spark.sources.testdata import load_table

    orders = load_table(spark, sf_small, "orders")
    o_keys = {
        r.o_custkey
        for r in orders.filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert both | only_o == o_keys


def test_percentile_contract_holds(spark, sf_small):
    """The rank-interval contract the query emits as booleans must
    actually hold at the smallest scale (where interpolation-based
    bounds once failed: a +/-0.002 quantile window is sub-one-rank at
    300 rows/segment)."""
    from etl_sales_pandas_sqlserver_spark.plans.advanced_queries import (
        q_percentiles_contract,
    )

    rows = q_percentiles_contract(spark, sf_small).collect()
    assert rows, "no segments"
    for r in rows:
        assert r.n_rows > 0
        for tag in ("p25_ok", "p50_ok", "p90_ok"):
            assert r[tag], f"{r.mktsegment}: {tag} contract violated"


def test_gapfill_grid_is_dense_and_zero_filled(spark, sf_small):
    """Per event type the hourly grid must be contiguous (hi-lo+1 rows)
    and every gap row must be exactly zero."""
    from pyspark.sql import functions as F

    from etl_sales_pandas_sqlserver_spark.plans.temporal_queries import (
        q_timeseries_gapfill,
    )

    df = q_timeseries_gapfill(spark, sf_small)
    spans = (
        df.groupBy("event_type")
        .agg(
            F.min("hour_bucket").alias("lo"),
            F.max("hour_bucket").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert spans
    for r in spans:
        assert r["n"] == r["hi"] - r["lo"] + 1, r["event_type"]
    bad = df.filter(
        F.col("gap_filled")
        & ((F.col("n_events") != 0) | (F.col("total_value") != 0.0))
    ).count()
    assert bad == 0


def test_cohort_offset_zero_counts_whole_cohort(spark, sf_small):
    """Every user is active in their own first week, so the offset-0
    row of each cohort must count the cohort's full population."""
    from pyspark.sql import functions as F

    from etl_sales_pandas_sqlserver_spark.plans.temporal_queries import (
        _WEEK_US,
        q_cohort_retention,
    )
    from etl_sales_pandas_sqlserver_spark.operators.dates import epoch_us
    from etl_sales_pandas_sqlserver_spark.sources.testdata import load_table

    ret = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in q_cohort_retention(spark, sf_small).collect()
    }
    raw = load_table(spark, sf_small, "events")
    first = (
        raw.withColumn("_eu", epoch_us(raw, "ts"))
        .select("user_id", F.expr(f"_eu div {_WEEK_US}").alias("week"))
        .groupBy("user_id")
        .agg(F.min("week").alias("cw"))
        .groupBy("cw")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert first
    for r in first:
        assert ret.get((r["cw"], 0)) == r["n"], r["cw"]
