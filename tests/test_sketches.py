"""Mergeable HLL sketch semantics: the error contract the queries emit
as booleans must actually hold, and unioning daily sketches must be
exactly lossless versus sketching the whole column."""

from __future__ import annotations

from etl_sales_pandas_sqlserver_spark.functions.sketches import (
    q_sketch_daily,
    q_sketch_rollup,
)


def test_daily_sketch_contract(spark, sf_small):
    rows = q_sketch_daily(spark, sf_small).collect()
    assert rows, "no (event_type, day) groups"
    for r in rows:
        assert r.n_events >= r.exact_users > 0
        assert r.est_ok, f"{r.event_type}/{r.day_bucket}: estimate out of bound"


def test_rollup_is_lossless_and_in_bound(spark, sf_small):
    rows = q_sketch_rollup(spark, sf_small).collect()
    assert rows, "no event types"
    for r in rows:
        assert r.exact_users > 0
        assert r.est_ok, f"{r.event_type}: rollup estimate out of bound"
        assert r.merge_lossless, (
            f"{r.event_type}: union of daily sketches diverged from the "
            "direct whole-column sketch"
        )
