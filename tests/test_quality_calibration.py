"""Driver-style parity + semantics for the (round-10-wiring)
per-source quality calibration in functions/quality_calibration.py."""

from __future__ import annotations

from etl_sales_pandas_sqlserver_spark.functions.quality_calibration import (
    _KEEP_PPM,
    QUERIES_EXPORT,
)

from .oracle_compare import compare, run_oracle


def test_quality_percentile_oracle_parity(spark, sf_small):
    fn, sql = QUERIES_EXPORT["quality_percentile_by_source"]
    problems = compare(fn(spark, sf_small), run_oracle(sql, sf_small))
    assert not problems, problems


def test_quality_percentile_semantics(spark, sf_small):
    fn, _ = QUERIES_EXPORT["quality_percentile_by_source"]
    rows = fn(spark, sf_small).collect()
    assert rows
    from collections import defaultdict

    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
    assert len(by_src) >= 2, "fixture must span several sources"
    for src, rs in by_src.items():
        pcts = sorted(r.pct_ppm for r in rs)
        assert pcts[0] == 0 and pcts[-1] == (1_000_000 if len(rs) > 1 else 0)
        # percentile order must agree with (score, doc_id) order
        ordered = sorted(rs, key=lambda r: (r.score_ppm, r.doc_id))
        assert [r.pct_ppm for r in ordered] == sorted(r.pct_ppm for r in rs)
        # keep = top half OF THIS SOURCE (within one of the rank grid)
        n_keep = sum(1 for r in rs if r.keep)
        expect = sum(
            1
            for i in range(len(rs))
            if len(rs) > 1 and (i * 1_000_000) // (len(rs) - 1) >= _KEEP_PPM
        )
        assert n_keep == expect
    # every keep flag matches its own percentile
    assert all(r.keep == (r.pct_ppm >= _KEEP_PPM) for r in rows)
