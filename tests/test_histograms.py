"""Invariants for the mergeable log-histogram family
(functions/histograms.py). Driver-style oracle parity runs with the
rest of the registry; here the structural properties a parity hash
can't localize."""

from __future__ import annotations

from etl_sales_pandas_sqlserver_spark.functions.histograms import (
    q_hist_doclen_by_source,
    q_hist_quantiles_by_source,
)


def test_histogram_bins_are_pow2_and_counts_positive(spark, sf_small):
    rows = q_hist_doclen_by_source(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.bin_cap >= 1
        assert r.bin_cap & (r.bin_cap - 1) == 0, "cap must be 2^k"
        assert r.n_docs > 0, "merged histogram never emits empty bins"


def test_histogram_merge_preserves_mass(spark, sf_small):
    """The merged histogram's total mass must equal the raw doc count
    per source — merging leaf histograms loses nothing (the
    associativity contract that makes the summary shard-safe)."""
    from pyspark.sql import functions as F

    from etl_sales_pandas_sqlserver_spark.sources.testdata import load_table

    hist = (
        q_hist_doclen_by_source(spark, sf_small)
        .groupBy("source")
        .agg(F.sum("n_docs").alias("n"))
    )
    raw = (
        load_table(spark, sf_small, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    h = {r.source: r.n for r in hist.collect()}
    w = {r.source: r.n for r in raw.collect()}
    assert h == w


def test_quantiles_bracket_exact_values(spark, sf_small):
    """The histogram p50/p95 caps must bracket the EXACT quantiles:
    for the ceil-rank definition, the true k-th smallest length lies
    in (cap/2, cap] — the bounded-relative-error contract the family
    docstring claims."""
    from etl_sales_pandas_sqlserver_spark.sources.testdata import load_table

    got = {
        r.source: r for r in q_hist_quantiles_by_source(spark, sf_small).collect()
    }
    docs = load_table(spark, sf_small, "documents").select(
        "source", "n_chars"
    )
    by_src: dict = {}
    for r in docs.collect():
        by_src.setdefault(r.source, []).append(int(r.n_chars))
    assert set(got) == set(by_src)
    for src, lens in by_src.items():
        lens.sort()
        total = len(lens)
        assert got[src].n_docs_total == total
        for q, cap in ((50, got[src].p50_cap), (95, got[src].p95_cap)):
            k = (q * total + 99) // 100  # ceil in exact integer math
            exact = lens[k - 1]
            assert exact <= cap, (src, q, exact, cap)
            assert cap == 1 or exact > cap // 2, (src, q, exact, cap)
