"""Driver-style parity + semantics for the (round-10-wiring) corpus
snapshot diff family in functions/corpus_diff.py. The module is not
yet registered (round 9's verification window is exactly full); these
tests run the SAME compare the driver will, so registration is a
two-line change with pre-verified behavior.
"""

from __future__ import annotations

import pytest

from etl_sales_pandas_sqlserver_spark.functions.corpus_diff import (
    _EDIT_HIT,
    _EDIT_MOD,
    _NEW_DROP,
    _NEW_MOD,
    _OLD_DROP,
    _OLD_MOD,
    QUERIES_EXPORT,
)

from .oracle_compare import compare, run_oracle


@pytest.mark.parametrize("name", sorted(QUERIES_EXPORT))
def test_corpus_diff_oracle_parity(spark, sf_small, name):
    fn, sql = QUERIES_EXPORT[name]
    problems = compare(fn(spark, sf_small), run_oracle(sql, sf_small))
    assert not problems, f"{name}: {problems}"


def test_corpus_diff_classification_semantics(spark, sf_small):
    fn, _ = QUERIES_EXPORT["corpus_snapshot_diff"]
    rows = {r.doc_id: r.status for r in fn(spark, sf_small).collect()}
    assert rows, "diff must be non-empty"
    seen = set(rows.values())
    assert seen == {"added", "removed", "edited", "unchanged"}, seen
    for doc_id, status in rows.items():
        in_old = doc_id % _OLD_MOD != _OLD_DROP
        in_new = doc_id % _NEW_MOD != _NEW_DROP
        edited = doc_id % _EDIT_MOD == _EDIT_HIT
        if not in_old:
            want = "added"
        elif not in_new:
            want = "removed"
        elif edited:
            want = "edited"
        else:
            want = "unchanged"
        assert status == want, (doc_id, status, want)
    # docs in neither snapshot do not appear
    assert all(
        doc_id % _OLD_MOD != _OLD_DROP or doc_id % _NEW_MOD != _NEW_DROP
        for doc_id in rows
    )


def test_churn_rollup_consistent_with_diff(spark, sf_small):
    diff_fn, _ = QUERIES_EXPORT["corpus_snapshot_diff"]
    churn_fn, _ = QUERIES_EXPORT["corpus_churn_by_source"]
    diff = diff_fn(spark, sf_small).collect()
    churn = {r.source: r for r in churn_fn(spark, sf_small).collect()}
    from collections import Counter

    want = Counter((r.source, r.status) for r in diff)
    for src, r in churn.items():
        assert r.n_added == want[(src, "added")]
        assert r.n_removed == want[(src, "removed")]
        assert r.n_edited == want[(src, "edited")]
        assert r.n_unchanged == want[(src, "unchanged")]
        assert r.n_docs == sum(
            want[(src, s)] for s in ("added", "removed", "edited", "unchanged")
        )
