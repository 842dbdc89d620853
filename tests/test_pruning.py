"""Driver-style parity + semantics for perplexity-band pruning
(functions/pruning.py)."""

from __future__ import annotations

from etl_sales_pandas_sqlserver_spark.functions.pruning import (
    QUERIES_EXPORT,
    q_lm_band_prune,
)
from etl_sales_pandas_sqlserver_spark.functions.search import lm_doc_scores

from .oracle_compare import compare, run_oracle


def test_band_prune_oracle_parity(spark, sf_small):
    fn, sql = QUERIES_EXPORT["lm_band_prune_by_source"]
    problems = compare(fn(spark, sf_small), run_oracle(sql, sf_small))
    assert not problems, problems


def test_band_prune_invariants(spark, sf_small):
    rows = q_lm_band_prune(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.n_pruned_low + r.n_kept + r.n_pruned_high == r.n_scored
        # the (25%, 75%] rank band: at most a quarter below, at most
        # a quarter strictly above, so the kept middle is ~half
        assert r.n_pruned_low * 4 <= r.n_scored
        assert r.n_pruned_high * 4 <= r.n_scored + 3  # ceil slack
        if r.n_kept:
            assert r.kept_min_ppm is not None
            assert r.kept_min_ppm <= r.kept_max_ppm


def test_band_bounds_match_scores(spark, sf_small):
    """The kept band's min/max scores must be the actual scores at the
    band's rank boundaries, recomputed independently here from the
    shared scorer."""
    from pyspark.sql import functions as F

    from etl_sales_pandas_sqlserver_spark.sources.testdata import load_table

    docs = load_table(spark, sf_small, "documents")
    sc = (
        lm_doc_scores(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in sc:
        by_src.setdefault(r.source, []).append((r.lm_score_ppm, r.doc_id))
    out = {r.source: r for r in q_lm_band_prune(spark, sf_small).collect()}
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        band = [s for i, (s, _) in enumerate(vals, 1)
                if i * 4 > n and i * 4 <= 3 * n]
        r = out[src]
        assert r.n_scored == n
        assert r.n_kept == len(band)
        if band:
            assert r.kept_min_ppm == min(band)
            assert r.kept_max_ppm == max(band)
