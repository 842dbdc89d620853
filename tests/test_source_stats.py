"""Invariants for the cross-source corpus statistics family
(functions/source_stats.py). Driver-style oracle parity runs with the
rest of the registry in tests/test_oracle_parity.py; here the
structural properties a parity hash can't localize."""

from __future__ import annotations

from etl_sales_pandas_sqlserver_spark.functions.intmath import PPM as _PPM
from etl_sales_pandas_sqlserver_spark.functions.source_stats import (
    q_contamination_matrix,
    q_lang_sampling_weights,
    q_source_dedup_rate,
)


def test_contamination_pairs_are_ordered_and_positive(spark, sf_small):
    rows = q_contamination_matrix(spark, sf_small).collect()
    assert rows, "sf fixtures share vocabulary; matrix must be non-empty"
    for r in rows:
        assert r.src_a < r.src_b, "pairs must be emitted once, ordered"
        assert r.n_shared_shingles > 0


def test_dedup_rate_bounds_and_consistency(spark, sf_small):
    rows = q_source_dedup_rate(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_docs <= r.n_docs
        assert 0 <= r.dup_ppm <= _PPM
        assert r.dup_ppm == r.n_dup_docs * _PPM // r.n_docs


def test_lang_weights_shares_sum_below_ppm(spark, sf_small):
    rows = q_lang_sampling_weights(spark, sf_small).collect()
    assert rows
    total = sum(r.share_ppm for r in rows)
    # floor division loses < 1 ppm per language
    assert _PPM - len(rows) <= total <= _PPM
    for r in rows:
        assert r.sqrt_weight**2 <= r.total_tokens < (r.sqrt_weight + 1) ** 2
