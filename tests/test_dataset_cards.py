"""Driver-style parity + semantics for the dataset-cards family in
functions/dataset_cards.py (registered since round 11); these tests
run the SAME compare the driver uses."""

from __future__ import annotations

import pytest

from etl_sales_pandas_sqlserver_spark.functions.dataset_cards import (
    _PPM,
    QUERIES_EXPORT,
    q_dataset_card_by_source,
    q_dataset_card_global,
)

from .oracle_compare import compare, run_oracle


@pytest.mark.parametrize("name", sorted(QUERIES_EXPORT))
def test_dataset_cards_oracle_parity(spark, sf_small, name):
    fn, sql = QUERIES_EXPORT[name]
    problems = compare(fn(spark, sf_small), run_oracle(sql, sf_small))
    assert not problems, f"{name}: {problems}"


def test_card_semantics(spark, sf_small):
    rows = q_dataset_card_by_source(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0 and r.total_tokens >= r.n_docs
        assert 0 <= r.dup_ppm <= _PPM
        # Gini impurity: 0 (single lang) .. < 1e6, and for k langs the
        # uniform bound 1e6*(1-1/k) caps it; the fixture has 5 langs
        assert 0 <= r.lang_gini_ppm < _PPM
        assert r.p95_len_cap >= 1
        assert r.p95_len_cap & (r.p95_len_cap - 1) == 0


def test_global_card_consistent_with_per_source(spark, sf_small):
    per = q_dataset_card_by_source(spark, sf_small).collect()
    g = q_dataset_card_global(spark, sf_small).collect()[0]
    assert g.n_sources == len(per)
    assert g.n_docs == sum(r.n_docs for r in per)
    assert g.total_tokens == sum(r.total_tokens for r in per)
    # the global p95 cap lives within the per-source cap range
    caps = [r.p95_len_cap for r in per]
    assert min(caps) <= g.p95_len_cap <= max(caps)
    assert g.p50_len_cap <= g.p95_len_cap
